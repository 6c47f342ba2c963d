"""Weight-transplant and fuzzed parity against the EXECUTING reference.

torch 2.13 (CPU) is present in this image, so the reference's own
modules run in-process via tests/reference_shim.py (third-party MIDI
libs stubbed with in-memory containers). These tests transplant
parameters between our flax modules and the reference torch modules and
assert numerical parity of logits/losses, plus fuzzed round-trip
equality of the tokenizer decode paths — machine-verified, replacing
hand-derived fixtures as the parity anchor.

Reference files exercised (under /root/reference/mg/model/):
  MusicTransformer/{network,layers,criterion}.py, utils/sequence.py,
  utils/REMI.py, utils/MuMIDI.py, Event_MelodyRNN/network.py,
  PerformanceRNN/network.py, PoPMAG_RNN/network.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from . import reference_shim as rs  # noqa: E402

torch.manual_seed(0)


def t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def _linear(tmod):
    """torch Linear -> flax Dense param dict."""
    return {"kernel": t2j(tmod.weight).T, "bias": t2j(tmod.bias)}


# ==========================================================================
# (i) MusicTransformer vs the reference Encoder/network
# ==========================================================================

def _ref_mt(vocab=309, d_model=128, layers=2, max_seq=64):
    mt_mod = rs.load_music_transformer()
    torch.manual_seed(42)
    ref = mt_mod.network.MusicTransformer(
        embedding_dim=d_model, vocab_size=vocab, num_layer=layers,
        max_seq=max_seq, dropout=0.0)
    ref.eval()
    return mt_mod, ref


def _transplant_mt(ref, vocab, d_model, layers, max_seq):
    """torch MusicTransformer state -> our flax param tree."""
    enc = ref.Decoder
    params = {
        "embedding": {"embedding": t2j(enc.embedding.weight)},
        "fc": _linear(ref.fc),
    }
    for i, layer in enumerate(enc.enc_layers):
        params[f"layer_{i}"] = {
            "rga": {
                "Wq": _linear(layer.rga.Wq),
                "Wk": _linear(layer.rga.Wk),
                "Wv": _linear(layer.rga.Wv),
                "fc": _linear(layer.rga.fc),
                "E": t2j(layer.rga.E),
            },
            "ffn_pre": _linear(layer.FFN_pre),
            "ffn_suf": _linear(layer.FFN_suf),
            "ln1": {"scale": t2j(layer.layernorm1.weight),
                    "bias": t2j(layer.layernorm1.bias)},
            "ln2": {"scale": t2j(layer.layernorm2.weight),
                    "bias": t2j(layer.layernorm2.bias)},
        }
    return params


def _our_mt(vocab=309, d_model=128, layers=2, max_seq=64):
    from musicgeneration_tpu.models import MusicTransformer

    return MusicTransformer(
        vocab_size=vocab, num_layers=layers, d_model=d_model,
        max_seq=max_seq, dropout_rate=0.0, attention_impl="xla")


def test_music_transformer_logit_parity_full_seq():
    """network.MusicTransformer.forward (layers.py:207-233 Encoder +
    network.py:35-40 fc/mask) vs our model, same transplanted weights,
    input with trailing pad tokens."""
    vocab, d_model, layers, max_seq = 309, 128, 2, 64
    mt_mod, ref = _ref_mt(vocab, d_model, layers, max_seq)
    ours = _our_mt(vocab, d_model, layers, max_seq)
    params = _transplant_mt(ref, vocab, d_model, layers, max_seq)

    rng = np.random.default_rng(0)
    x = rng.integers(0, 308, size=(2, max_seq))
    x[0, -5:] = 308  # pad tail (pad_token = vocab - 1 = 308)
    xt = torch.from_numpy(x).to(torch.long)

    with torch.no_grad():
        ref_out = ref(xt)
    ref_logits = ref_out[0].numpy() if isinstance(ref_out, tuple) else \
        ref_out.numpy()

    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("l,max_seq", [(16, 64), (48, 64), (64, 64),
                                       (1, 64), (63, 64)])
def test_music_transformer_skew_edge_cases(l, max_seq):
    """Encoder at L < max_seq exercises _get_left_embedding's slice
    (layers.py:110-114) and the skew pad-reshape (layers.py:116-125) off
    the square case; compare Decoder+fc directly (the network-level
    forward only supports L == max_seq because of its mask broadcast)."""
    vocab, d_model, layers = 309, 128, 2
    mt_mod, ref = _ref_mt(vocab, d_model, layers, max_seq)
    ours = _our_mt(vocab, d_model, layers, max_seq)
    params = _transplant_mt(ref, vocab, d_model, layers, max_seq)

    rng = np.random.default_rng(l)
    x = rng.integers(0, 308, size=(2, l))
    xt = torch.from_numpy(x).to(torch.long)
    _, _, mask = mt_mod.utils.get_masked_with_pad_tensor(
        l, xt, xt, 308)
    with torch.no_grad():
        h, _ = ref.Decoder(xt, mask)
        ref_logits = ref.fc(h).numpy()

    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)


def test_music_transformer_loss_grad_parity():
    """End-to-end train-step equivalence: same batch, same weights ->
    same smoothed loss and same dL/dE gradient (criterion.py:28-67
    against train/objective.py)."""
    vocab, d_model, layers, max_seq = 309, 128, 2, 32
    mt_mod, ref = _ref_mt(vocab, d_model, layers, max_seq)
    ours = _our_mt(vocab, d_model, layers, max_seq)
    params = _transplant_mt(ref, vocab, d_model, layers, max_seq)
    from musicgeneration_tpu.train.objective import smooth_cross_entropy

    rng = np.random.default_rng(7)
    x = rng.integers(0, 308, size=(2, max_seq))
    y = rng.integers(0, 308, size=(2, max_seq))
    y[1, -7:] = 308
    xt = torch.from_numpy(x).to(torch.long)
    yt = torch.from_numpy(y).to(torch.long)

    crit = mt_mod.criterion.SmoothCrossEntropyLoss(0.1, vocab,
                                                   ignore_index=308)
    ref.train()  # dropout=0.0 so train mode only changes forward's return
    ref.zero_grad()
    logits = ref(xt)
    loss_t = crit(logits.reshape(-1, vocab), yt.reshape(-1))
    loss_t.backward()
    ref_ge = ref.Decoder.enc_layers[0].rga.E.grad.numpy()

    def loss_fn(p):
        lg = ours.apply({"params": p}, jnp.asarray(x))
        return smooth_cross_entropy(lg, jnp.asarray(y), vocab,
                                    label_smoothing=0.1, ignore_index=308)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["layer_0"]["rga"]["E"]),
                               ref_ge, rtol=2e-4, atol=2e-4)


def test_smooth_ce_and_schedule_parity():
    """SmoothCrossEntropyLoss + CustomSchedule (criterion.py:28-96) vs
    train/objective.py + train/schedule.py on random data."""
    mt_mod = rs.load_music_transformer()
    from musicgeneration_tpu.train.objective import smooth_cross_entropy
    from musicgeneration_tpu.train.schedule import noam_schedule

    rng = np.random.default_rng(3)
    for vocab, eps, n_pad in [(309, 0.1, 0), (309, 0.1, 13),
                              (37, 0.0, 5), (37, 0.3, 0)]:
        logits = rng.normal(size=(64, vocab)).astype(np.float32)
        targets = rng.integers(0, vocab - 1, size=(64,))
        if n_pad:
            targets[-n_pad:] = vocab - 1
        crit = mt_mod.criterion.SmoothCrossEntropyLoss(
            eps, vocab, ignore_index=vocab - 1)
        ref = float(crit(torch.from_numpy(logits),
                         torch.from_numpy(targets)))
        got = float(smooth_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), vocab,
            label_smoothing=eps, ignore_index=vocab - 1))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    sched_ref = mt_mod.criterion.CustomSchedule(256, warmup_steps=4000)
    sched = noam_schedule(256, warmup_steps=4000)
    for step in [1, 10, 100, 3999, 4000, 4001, 100000]:
        np.testing.assert_allclose(float(sched(step)),
                                   sched_ref.rate(step), rtol=1e-6)


# ==========================================================================
# (iii) GRU families: Event_MelodyRNN / PerformanceRNN
# ==========================================================================

def _gru_params(tgru, layers):
    """torch nn.GRU -> our GRUStack param dict (same r,z,n gate order;
    torch weights are [3H, in] -> transpose)."""
    p = {}
    for k in range(layers):
        p[f"l{k}_w_ih"] = t2j(getattr(tgru, f"weight_ih_l{k}")).T
        p[f"l{k}_w_hh"] = t2j(getattr(tgru, f"weight_hh_l{k}")).T
        p[f"l{k}_b_ih"] = t2j(getattr(tgru, f"bias_ih_l{k}"))
        p[f"l{k}_b_hh"] = t2j(getattr(tgru, f"bias_hh_l{k}"))
    return p


def test_event_melody_rnn_train_forward_parity():
    """Event_Melody_RNN.Train -> SeqForward (Event_MelodyRNN/
    network.py:63-116) vs our EventMelodyRNN.__call__, transplanted."""
    er = rs.load_event_rnn()
    from musicgeneration_tpu.models.event_rnn import EventMelodyRNN

    dims = dict(init_dim=8, event_dim=40, hidden_dim=32, rnn_layers=3)
    torch.manual_seed(1)
    ref = er.Event_Melody_RNN(dropout=0.0, **dims)
    ref.eval()

    params = {
        "event_embedding": {"embedding": t2j(ref.event_embedding.weight)},
        "inithid_fc": _linear(ref.inithid_fc),
        "gru": _gru_params(ref.rnn, dims["rnn_layers"]),
        "output_fc": _linear(ref.output_fc),
    }
    ours = EventMelodyRNN(event_dim=40, init_dim=8, hidden_dim=32,
                          num_layers=3, dropout_rate=0.0)

    # B=1: the reference's init_to_hidden does out.view(L, B, H) on a
    # [B, L*H] tensor — a flat reinterpret that SCRAMBLES batch elements
    # for B>1 (see test_init_to_hidden_view_quirk); at B=1 it coincides
    # with the correct per-element mapping our models use.
    rng = np.random.default_rng(11)
    init = rng.normal(size=(1, 8)).astype(np.float32)
    events = rng.integers(0, 40, size=(17, 1))
    with torch.no_grad():
        ref_out = ref.Train(torch.from_numpy(init),
                            torch.from_numpy(events).to(torch.long))
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(init),
                                jnp.asarray(events)))
    np.testing.assert_allclose(got, ref_out.numpy(), rtol=2e-5, atol=2e-5)


def test_event_melody_rnn_packed_lengths_parity():
    """SeqForward's pack_padded_sequence path (network.py:71-77) vs our
    masked-carry lengths= semantics; compare only valid rows."""
    er = rs.load_event_rnn()
    from musicgeneration_tpu.models.event_rnn import EventMelodyRNN

    torch.manual_seed(2)
    ref = er.Event_Melody_RNN(init_dim=8, event_dim=40, hidden_dim=32,
                              rnn_layers=2, dropout=0.0)
    ref.eval()
    params = {
        "event_embedding": {"embedding": t2j(ref.event_embedding.weight)},
        "inithid_fc": _linear(ref.inithid_fc),
        "gru": _gru_params(ref.rnn, 2),
        "output_fc": _linear(ref.output_fc),
    }
    ours = EventMelodyRNN(event_dim=40, init_dim=8, hidden_dim=32,
                          num_layers=2, dropout_rate=0.0)

    rng = np.random.default_rng(12)
    t_len, b = 12, 4
    lengths = np.array([12, 9, 7, 3])
    init = rng.normal(size=(b, 8)).astype(np.float32)
    events = rng.integers(0, 40, size=(t_len, b))
    with torch.no_grad():
        # reference packs batch-first lengths over a time-major tensor
        # (SeqForward passes batch_first=True on [T, B, E] input, so its
        # "batch" axis is our time axis): feed it transposed, get
        # [B, T, V] out, transpose back
        emb = ref.event_embedding(torch.from_numpy(events).to(torch.long))
        hidden = ref.init_to_hidden(torch.from_numpy(init))
        one, hidden = ref.gen_forward(
            ref.get_primary_event(b), hidden)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            emb.permute(1, 0, 2), lengths, batch_first=True,
            enforce_sorted=False)
        out, _ = ref.rnn(packed, hidden)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True)
        ref_rows = ref.output_fc(out).permute(1, 0, 2).numpy()

    # drive our GRU stack directly (the packed path is a GRUStack
    # feature); h0 uses the reference's FLAT view(L, B, H) reinterpret
    # so both sides start identical at B>1 (init_to_hidden view quirk)
    from musicgeneration_tpu.ops.gru import GRUStack
    gru = GRUStack(32, 2, 0.0)
    emb_j = np.asarray(t2j(emb))
    flat = np.tanh(init @ np.asarray(params["inithid_fc"]["kernel"])
                   + np.asarray(params["inithid_fc"]["bias"]))
    h0 = flat.reshape(-1).reshape(2, b, 32)
    np.testing.assert_allclose(
        h0, ref.init_to_hidden(torch.from_numpy(init)).detach().numpy(),
        rtol=1e-5, atol=1e-6)
    # primary step first (hidden after gen_forward)
    prim = np.full((1, b), 39)
    prim_emb = np.asarray(
        t2j(ref.event_embedding(torch.from_numpy(prim).to(torch.long))))
    _, h1 = gru.apply({"params": params["gru"]},
                      jnp.asarray(prim_emb), jnp.asarray(h0))
    outs, _ = gru.apply({"params": params["gru"]}, jnp.asarray(emb_j),
                        h1, lengths=jnp.asarray(lengths))
    got_rows = np.asarray(
        ours.apply({"params": params}, outs, method=lambda m, o:
                   m.output_fc(o)))
    for bi in range(b):
        L = lengths[bi]
        np.testing.assert_allclose(got_rows[:L, bi], ref_rows[:L, bi],
                                   rtol=2e-5, atol=2e-5)


def test_performance_rnn_teacher_forced_parity():
    """PerformanceRNN.generate with teacher_forcing_ratio=1, greedy=1,
    output_type='logit' (network.py:106-154) vs our training forward —
    with and without controls."""
    pr = rs.load_performance_rnn()
    from musicgeneration_tpu.models.performance_rnn import PerformanceRNN

    dims = dict(event_dim=40, control_dim=6, init_dim=8, hidden_dim=32,
                gru_layers=3)
    torch.manual_seed(3)
    ref = pr.PerformanceRNN(gru_dropout=0.0, **dims)
    ref.eval()
    params = {
        "event_embedding": {"embedding": t2j(ref.event_embedding.weight)},
        "inithid_fc": _linear(ref.inithid_fc),
        "concat_input_fc": _linear(ref.concat_input_fc),
        "gru": _gru_params(ref.gru, 3),
        "output_fc": _linear(ref.output_fc),
    }
    ours = PerformanceRNN(event_dim=40, control_dim=6, init_dim=8,
                          hidden_dim=32, num_layers=3, dropout_rate=0.0)

    rng = np.random.default_rng(13)
    steps, b = 15, 1  # B=1: init_to_hidden view quirk (see above)
    init = rng.normal(size=(b, 8)).astype(np.float32)
    events = rng.integers(0, 40, size=(steps, b))
    controls = rng.random(size=(steps, b, 6)).astype(np.float32)

    for ctrl in (None, controls):
        np.random.seed(0)  # reference uses np.random for its tf coin
        with torch.no_grad():
            ref_out = ref.generate(
                torch.from_numpy(init), steps,
                events=torch.from_numpy(events).to(torch.long),
                controls=(None if ctrl is None
                          else torch.from_numpy(ctrl)),
                greedy=1.0, temperature=1.0, teacher_forcing_ratio=1.0,
                output_type="logit")
        got = np.asarray(ours.apply(
            {"params": params}, jnp.asarray(init), jnp.asarray(events),
            None if ctrl is None else jnp.asarray(ctrl)))
        np.testing.assert_allclose(got, ref_out.numpy(),
                                   rtol=2e-5, atol=2e-5)


def test_init_to_hidden_view_quirk_documented():
    """The reference's init_to_hidden does out.view(rnn_layers, B, H) on
    a [B, layers*H] tensor (Event_MelodyRNN/network.py:98-104,
    PerformanceRNN/network.py:89-95): a flat C-order reinterpret that
    MIXES batch elements for B > 1 (element (l, b) reads from batch row
    (l*B*H + b*H)//(L*H) of the fc output). Our models deliberately use
    the per-element reshape(B, L, H).transpose instead — a documented
    intentional fix, not an accidental deviation. This test machine-pins
    both facts so the divergence can't drift silently."""
    er = rs.load_event_rnn()
    from musicgeneration_tpu.models.event_rnn import EventMelodyRNN

    torch.manual_seed(5)
    L, H, B = 3, 32, 4
    ref = er.Event_Melody_RNN(init_dim=8, event_dim=40, hidden_dim=H,
                              rnn_layers=L, dropout=0.0)
    ref.eval()
    params = {
        "event_embedding": {"embedding": t2j(ref.event_embedding.weight)},
        "inithid_fc": _linear(ref.inithid_fc),
        "gru": _gru_params(ref.rnn, L),
        "output_fc": _linear(ref.output_fc),
    }
    ours = EventMelodyRNN(event_dim=40, init_dim=8, hidden_dim=H,
                          num_layers=L, dropout_rate=0.0)
    init = np.random.default_rng(6).normal(size=(B, 8)).astype(np.float32)
    flat = np.tanh(init @ np.asarray(params["inithid_fc"]["kernel"])
                   + np.asarray(params["inithid_fc"]["bias"]))
    ref_h = ref.init_to_hidden(torch.from_numpy(init)).detach().numpy()
    our_h = np.asarray(ours.apply({"params": params}, jnp.asarray(init),
                                  method=ours.init_to_hidden))
    # reference = flat reinterpret (batch-scrambling)
    np.testing.assert_allclose(ref_h, flat.reshape(-1).reshape(L, B, H),
                               rtol=1e-5, atol=1e-6)
    # ours = per-element mapping; each batch row depends only on itself
    np.testing.assert_allclose(
        our_h, flat.reshape(B, L, H).transpose(1, 0, 2),
        rtol=1e-5, atol=1e-6)
    assert not np.allclose(ref_h, our_h), \
        "quirk disappeared — reference init_to_hidden changed?"


# ==========================================================================
# (iv) PoPMAG compound embedding + Train forward
# ==========================================================================

def _popmag_transplant(ref, layers):
    """torch PoPMAG_RNN state -> our PoPMAGRNN param tree."""
    return {
        "event_embedding": {"embedding": t2j(ref.event_embedding.weight)},
        "inithid_fc": _linear(ref.inithid_fc),
        "encoder": _gru_params(ref.encoder, layers),
        "decoder": _gru_params(ref.decoder, layers),
        "head_type": _linear(ref.output_fc[0]),
        "head_pitch": _linear(ref.output_fc[1]),
        "head_duration": _linear(ref.output_fc[2]),
    }


def test_popmag_compound_embed_and_train_parity():
    """PoPMAG_RNN.compression (network.py:141-149) and Train
    (network.py:323-363: per-bar enc/dec GRUs, carried
    hidden = enc_hidden + dec_hidden) vs our PoPMAGRNN.__call__.

    The reference softmaxes each head inside final_predict
    (network.py:303-319) while we emit raw logits (its double-softmax
    training bug, fixed on our side) — so parity is asserted on our
    softmax(head logits) vs the reference's head probabilities, over
    valid (t < bar length) slots and each head's true width."""
    pg = rs.load_popmag()
    from musicgeneration_tpu.data import mumidi_packing as mp
    from musicgeneration_tpu.models.popmag import PoPMAGRNN

    L, H, E, BARD = 2, 16, 16, 188
    torch.manual_seed(9)
    ref = pg.PoPMAG_RNN(init_dim=8, event_dim=485, hidden_dim=H,
                        bar_dim=BARD, embed_dim=E, rnn_layers=L,
                        dropout=0.0)
    ref.eval()
    assert list(ref.out_len) == list(mp.OUT_LEN)
    assert ref.mx_dim == mp.MX_DIM

    params = _popmag_transplant(ref, L)
    ours = PoPMAGRNN(event_dim=485, bar_dim=BARD, init_dim=8,
                     embed_dim=E, hidden_dim=H, num_layers=L,
                     dropout_rate=0.0)

    rng = np.random.default_rng(21)
    b, bars, s_len, t_len = 1, 3, 6, 5  # B=1: init_to_hidden view quirk
    src = rng.integers(0, 485 + BARD, size=(b, bars, s_len, 7))
    tar = rng.integers(0, 485 + BARD, size=(b, bars, t_len, 7))
    src_len = rng.integers(1, s_len + 1, size=(b, bars))
    tar_len = rng.integers(1, t_len + 1, size=(b, bars))
    init = rng.normal(size=(b, 8)).astype(np.float32)

    # compression parity first
    with torch.no_grad():
        comp_ref = ref.compression(torch.from_numpy(src).to(torch.long))
    comp_ours = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(src), method=ours.compression))
    np.testing.assert_allclose(comp_ours, comp_ref.numpy(),
                               rtol=2e-5, atol=2e-5)

    with torch.no_grad():
        comp_tar = ref.compression(torch.from_numpy(tar).to(torch.long))
        ref_out = ref.Train(
            torch.from_numpy(init), comp_ref,
            torch.from_numpy(src_len), comp_tar,
            torch.from_numpy(tar_len)).numpy()

    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(init), jnp.asarray(src),
        jnp.asarray(src_len), jnp.asarray(tar), jnp.asarray(tar_len)))

    for bi in range(b):
        for k in range(bars):
            n = tar_len[bi, k]
            for head, width in enumerate(mp.OUT_LEN):
                ref_p = ref_out[bi, k, :n, head, :width]
                our_p = np.asarray(jax.nn.softmax(
                    jnp.asarray(got[bi, k, :n, head, :width]), axis=-1))
                np.testing.assert_allclose(our_p, ref_p,
                                           rtol=2e-5, atol=2e-5)


def _popmag_generate_setup(bar_bias=0.45, seed=2):
    """Tiny transplanted (network module, ref, ours, params) +
    deterministic inputs for arrangement-generation parity.

    (seed, bar_bias) were searched so that under greedy decoding every
    bar terminates via a bar token well before max_steps and at least
    one bar emits several events first — per-bar emitted lengths
    [2, 9, 0] — which exercises the bar-end hidden-freeze carry into
    later bars. bar_bias is added to the bar token's head-0 bias on the
    torch side BEFORE transplant, so both sides decode the same model."""
    rs.load_utils_data()  # installs the mg.* aliases bar_id() needs
    pg = rs.load_popmag()
    from musicgeneration_tpu.data import mumidi_packing as mp
    from musicgeneration_tpu.models.popmag import PoPMAGRNN

    L, H, E, BARD = 2, 16, 16, 188
    torch.manual_seed(seed)
    ref = pg.PoPMAG_RNN(init_dim=8, event_dim=485, hidden_dim=H,
                        bar_dim=BARD, embed_dim=E, rnn_layers=L,
                        dropout=0.0)
    ref.eval()
    assert list(ref.embed_shift) == list(mp.SHIFT)
    with torch.no_grad():
        ref.output_fc[0].bias[mp.BAR_TOKEN - mp.SHIFT[0]] += bar_bias
    params = _popmag_transplant(ref, L)
    ours = PoPMAGRNN(event_dim=485, bar_dim=BARD, init_dim=8,
                     embed_dim=E, hidden_dim=H, num_layers=L,
                     dropout_rate=0.0)

    rng = np.random.default_rng(21)
    b, bars, s_len = 1, 3, 6  # B=1: the reference's own generate shape
    src = rng.integers(0, 485 + BARD, size=(b, bars, s_len, 7))
    src_len = rng.integers(1, s_len + 1, size=(b, bars))
    init = rng.normal(size=(b, 8)).astype(np.float32)
    return pg, ref, ours, params, init, src, src_len


def test_popmag_generate_bar_crash_pinned():
    """Reference quirk machine-pinned: PoPMAG_RNN.decoder_one_step
    (network.py:246-301) `break`s out of the per-row loop when every
    row has emitted its bar token, but then still calls
    Melody_Arrangement_Dataset.get_next_mask(batch, seq)
    (utils/data.py:435-441) whose `seq` list only holds rows that did
    NOT terminate this step — `torch.LongTensor(seq[i])` IndexErrors.
    Net effect: the reference's generate path crashes on EVERY bar that
    ends via a bar token (i.e. on any trained model); it only survives
    bars that run the full hard-coded 200 steps. Our
    decode/popmag_generate.py implements the evident intent instead
    (per-row hidden freeze at the bar-emitting step)."""
    pg, ref, ours, params, init, src, src_len = _popmag_generate_setup()
    with torch.no_grad():
        comp_src = ref.compression(torch.from_numpy(src).long())
        with pytest.raises(IndexError):
            ref.generate_arrangement(torch.from_numpy(init), comp_src,
                                     torch.from_numpy(src_len).long(),
                                     src.shape[1])


def test_popmag_generate_arrangement_executable_parity():
    """Greedy B=1 arrangement-generation token parity vs the EXECUTING
    reference (PoPMAG_RNN/network.py:216-301 decoder_one_step +
    :366-417 generate_arrangement), weight-transplanted.

    The only reference modification is a pad-tolerant get_next_mask
    standing in for utils/data.py:435-441 — at B=1 the short-seq call
    happens exclusively AFTER the loop's terminating break (the crash
    pinned in test_popmag_generate_bar_crash_pinned), where its result
    feeds the next decoder input that is never consumed, so the patch
    cannot alter any token. This locks, against the reference's own
    execution: the typed per-token state machine (position/tempo/
    chord/track/velocity slot updates, drum pitch offset, head shifts),
    the per-step compound feedback row, greedy head argmax through
    final_predict's softmax+pad, the 200-step cap semantics, and the
    bar-end hidden carry hidden = enc_h + dec_h with dec_h frozen at
    the bar-emitting step (freeze_done_hidden=True, our default)."""
    from musicgeneration_tpu.decode.popmag_generate import (
        flatten_arrangement, generate_arrangement)

    pg, ref, ours, params, init, src, src_len = _popmag_generate_setup()
    bars = src.shape[1]
    max_steps = 48  # > the longest bar (9 emitted steps) on both sides

    ds = pg.Melody_Arrangement_Dataset
    orig = ds.get_next_mask

    def tolerant(batch, seq):
        pad = torch.zeros((batch, 7))
        for i in range(min(batch, len(seq))):
            pad[i, :] = torch.LongTensor([int(x) for x in seq[i]])
        return pad.reshape(batch, 1, 7).long()

    ds.get_next_mask = staticmethod(tolerant)
    try:
        with torch.no_grad():
            comp_src = ref.compression(torch.from_numpy(src).long())
            outs = ref.generate_arrangement(
                torch.from_numpy(init), comp_src,
                torch.from_numpy(src_len).long(), bars)
    finally:
        ds.get_next_mask = orig
    ref_seq = np.asarray([int(t) for t in outs[0]])

    pj = jax.tree.map(jnp.asarray, params)
    args = (jnp.asarray(init), jnp.asarray(src), jnp.asarray(src_len),
            jax.random.PRNGKey(0))
    tokens, valid = generate_arrangement(
        ours, pj, *args, n_target_bar=bars, max_steps=max_steps,
        greedy=True)
    # the searched dynamics: every bar ends early, one is multi-step
    lens = np.asarray(valid)[0, :, :, 0].sum(axis=-1)
    assert lens.max() >= 2 and lens.max() < max_steps - 2, (
        f"generation dynamics drifted (per-bar lengths {lens}); "
        "re-search (seed, bar_bias) in _popmag_generate_setup")
    our_seq = flatten_arrangement(np.asarray(tokens), np.asarray(valid))
    np.testing.assert_array_equal(our_seq[0], ref_seq)

    # freeze semantics: results independent of max_steps once bars end
    t2, v2 = generate_arrangement(
        ours, pj, *args, n_target_bar=bars, max_steps=max_steps + 16,
        greedy=True)
    np.testing.assert_array_equal(
        flatten_arrangement(np.asarray(t2), np.asarray(v2))[0], ref_seq)

    # and the lock has teeth: the pre-fix behaviour (h keeps evolving
    # after a bar ends) diverges from the reference on later bars
    t3, v3 = generate_arrangement(
        ours, pj, *args, n_target_bar=bars, max_steps=max_steps,
        greedy=True, freeze_done_hidden=False)
    assert not np.array_equal(
        flatten_arrangement(np.asarray(t3), np.asarray(v3))[0], ref_seq)


# ==========================================================================
# (v) Fuzzed tokenizer decode parity (from_array -> to_note_seq /
#     write_midi) against the executing reference
# ==========================================================================

def _note_tuples_ref(note_seq):
    return [(n.velocity, n.pitch, n.start, n.end)
            for n in note_seq.notes]


def _note_tuples_ours(note_seq):
    return [(n.velocity, n.pitch, n.start, n.end)
            for n in note_seq.notes]


def test_eventseq_from_array_to_note_seq_fuzz():
    """EventSeq.from_array -> to_note_seq (utils/sequence.py:185-198,
    243-281) on random token arrays: note-for-note equality."""
    ref = rs.load_utils().sequence
    from musicgeneration_tpu.tokenizers import midilike

    rng = np.random.default_rng(31)
    for trial in range(20):
        ids = rng.integers(0, 308, size=rng.integers(10, 400))
        ref_notes = _note_tuples_ref(
            ref.EventSeq.from_array(ids).to_note_seq())
        our_notes = _note_tuples_ours(
            midilike.EventSeq.from_array(ids).to_note_seq())
        assert len(ref_notes) == len(our_notes), f"trial {trial}"
        for (rv, rp, rs_, re_), (ov, op, os_, oe_) in zip(ref_notes,
                                                          our_notes):
            assert (rv, rp) == (ov, op), f"trial {trial}"
            np.testing.assert_allclose([os_, oe_], [rs_, re_],
                                       rtol=0, atol=1e-9)


def test_eventseq_from_note_seq_fuzz():
    """EventSeq.from_note_seq emission (utils/sequence.py:145-183) on
    random note lists: byte-equal token arrays."""
    ref = rs.load_utils()
    from musicgeneration_tpu.midi.containers import Note as OurNote
    from musicgeneration_tpu.tokenizers import midilike

    rng = np.random.default_rng(32)
    for trial in range(20):
        n = int(rng.integers(5, 120))
        pitches = rng.integers(10, 120, size=n)     # incl. out-of-range
        vels = rng.integers(0, 128, size=n)
        starts = np.round(rng.random(size=n) * 20, 4)
        durs = np.round(rng.random(size=n) * 3 + 0.01, 4)
        ref_notes = [ref.pretty_midi.Note(int(v), int(p), float(s),
                                          float(s + d))
                     for v, p, s, d in zip(vels, pitches, starts, durs)]
        our_notes = [OurNote(velocity=int(v), pitch=int(p),
                             start=float(s), end=float(s + d))
                     for v, p, s, d in zip(vels, pitches, starts, durs)]
        ref_arr = ref.sequence.EventSeq.from_note_seq(
            ref.sequence.NoteSeq(ref_notes)).to_array()
        our_arr = midilike.EventSeq.from_note_seq(
            midilike.NoteSeq(our_notes)).to_array()
        np.testing.assert_array_equal(our_arr, ref_arr, err_msg=f"t{trial}")


def test_controlseq_compressed_fuzz():
    """ControlSeq.from_event_seq + to_compressed_array
    (utils/sequence.py:294-407) vs our vectorized compressed_from_ids:
    byte-equal compressed control arrays."""
    ref = rs.load_utils().sequence
    from musicgeneration_tpu.tokenizers import midilike

    rng = np.random.default_rng(33)
    for trial in range(10):
        ids = rng.integers(0, 308, size=rng.integers(20, 500))
        ref_arr = ref.ControlSeq.from_event_seq(
            ref.EventSeq.from_array(ids)).to_compressed_array()
        our_arr = midilike.ControlSeq.compressed_from_ids(ids)
        np.testing.assert_array_equal(our_arr, ref_arr,
                                      err_msg=f"trial {trial}")


def _mtk_midi_tuples(midi):
    """(notes-by-instrument, tempos, markers, tpb) from either a stubbed
    miditoolkit MidiFile or our MidiFile."""
    insts = [((i.program, bool(i.is_drum), getattr(i, "name", "") or ""),
              sorted((int(n.start), int(n.end), int(n.pitch),
                      int(n.velocity)) for n in i.notes))
             for i in midi.instruments]
    tempos = [(int(t.time), float(t.tempo)) for t in midi.tempo_changes]
    markers = [(int(m.time), str(m.text)) for m in midi.markers]
    return insts, tempos, markers, midi.ticks_per_beat


def test_remi_write_midi_fuzz(tmp_path):
    """REMI from_array -> write_midi (utils/REMI.py:523-674) vs ours on
    random and structured token arrays: identical reconstructed notes,
    tempo changes and chord markers."""
    ref = rs.load_utils().REMI
    from musicgeneration_tpu.tokenizers import remi

    dim = remi.REMI_EventSeq.dim()
    assert ref.REMI_EventSeq.dim() == dim
    fr = remi.REMI_EventSeq.feat_ranges()
    rng = np.random.default_rng(34)

    def structured(n_bars):
        toks = []
        for _ in range(n_bars):
            toks.append(fr["bar"].start)
            # tempo at position 0
            toks += [fr["position"].start,
                     int(rng.integers(fr["tempo_class"].start,
                                      fr["tempo_class"].stop)),
                     int(rng.integers(fr["tempo_value"].start,
                                      fr["tempo_value"].stop))]
            if rng.random() < 0.7:  # chord
                toks += [int(rng.integers(fr["position"].start,
                                          fr["position"].stop)),
                         int(rng.integers(fr["chord"].start,
                                          fr["chord"].stop))]
            for _ in range(int(rng.integers(1, 6))):  # notes
                toks += [int(rng.integers(fr["position"].start,
                                          fr["position"].stop)),
                         int(rng.integers(fr["note_velocity"].start,
                                          fr["note_velocity"].stop)),
                         int(rng.integers(fr["note_on"].start,
                                          fr["note_on"].stop)),
                         int(rng.integers(fr["note_duration"].start,
                                          fr["note_duration"].stop))]
        return np.array(toks)

    cases = [rng.integers(0, dim, size=rng.integers(8, 200))
             for _ in range(8)]
    cases += [structured(int(rng.integers(1, 5))) for _ in range(8)]

    for trial, ids in enumerate(cases):
        ref_midi = ref.REMI_EventSeq.write_midi(
            ref.REMI_EventSeq.from_array(ids), str(tmp_path / "r.mid"))
        our_midi = remi.REMI_EventSeq.write_midi(
            remi.REMI_EventSeq.from_array(ids), str(tmp_path / "o.mid"))
        ri, rt, rm, rtpb = _mtk_midi_tuples(ref_midi)
        oi, ot, om, otpb = _mtk_midi_tuples(our_midi)
        assert otpb == rtpb
        assert [x[1] for x in oi] == [x[1] for x in ri], f"trial {trial}"
        assert ot == rt, f"trial {trial}"
        assert om == rm, f"trial {trial}"


def test_mumidi_write_midi_fuzz(tmp_path):
    """MuMIDI from_array -> write_midi (utils/MuMIDI.py:559-704) vs ours:
    identical per-track reconstructed notes/programs, tempos, markers."""
    ref = rs.load_utils().MuMIDI
    from musicgeneration_tpu.tokenizers import mumidi

    dim = mumidi.MuMIDI_EventSeq.dim()
    assert ref.MuMIDI_EventSeq.dim() == dim
    fr = mumidi.MuMIDI_EventSeq.feat_ranges()
    rng = np.random.default_rng(35)
    track_range = fr["track"]  # one range, one id per track role

    def structured(n_bars):
        toks = []
        for _ in range(n_bars):
            toks.append(fr["bar"].start)
            toks += [fr["position"].start,
                     int(rng.integers(fr["tempo_class"].start,
                                      fr["tempo_class"].stop)),
                     int(rng.integers(fr["tempo_value"].start,
                                      fr["tempo_value"].stop))]
            if rng.random() < 0.6:
                toks += [int(rng.integers(fr["position"].start,
                                          fr["position"].stop)),
                         int(rng.integers(fr["chord"].start,
                                          fr["chord"].stop))]
            for _ in range(int(rng.integers(1, 5))):
                toks.append(int(rng.integers(fr["position"].start,
                                             fr["position"].stop)))
                toks.append(int(rng.integers(track_range.start,
                                             track_range.stop)))
                for _ in range(int(rng.integers(1, 4))):
                    toks += [int(rng.integers(fr["note_velocity"].start,
                                              fr["note_velocity"].stop)),
                             int(rng.integers(fr["note_on"].start,
                                              fr["note_on"].stop)),
                             int(rng.integers(
                                 fr["note_duration"].start,
                                 fr["note_duration"].stop))]
        return np.array(toks)

    cases = [rng.integers(0, dim, size=rng.integers(8, 200))
             for _ in range(8)]
    cases += [structured(int(rng.integers(1, 4))) for _ in range(8)]

    for trial, ids in enumerate(cases):
        ref_events = ref.MuMIDI_EventSeq.from_array(ids)
        ref_midi = ref.MuMIDI_EventSeq.write_midi(
            ref_events, str(tmp_path / "r.mid"))
        our_midi = mumidi.MuMIDI_EventSeq.write_midi(
            mumidi.MuMIDI_EventSeq.from_array(ids), str(tmp_path / "o.mid"))
        ri, rt, rm, rtpb = _mtk_midi_tuples(ref_midi)
        oi, ot, om, otpb = _mtk_midi_tuples(our_midi)
        assert otpb == rtpb
        assert ot == rt, f"trial {trial}"
        assert om == rm, f"trial {trial}"
        # KNOWN REFERENCE BUG, machine-pinned: its to_event names track
        # tokens 'melody'/'piano'/... (MuMIDI.py:395-399) while its
        # write_midi matches startswith('track') (MuMIDI.py:593), so the
        # from_array path drops EVERY note. Our to_event emits the
        # 'track_*' names the writer expects (the extraction path's
        # naming) — an intentional fix, not a divergence.
        assert ri == [], f"trial {trial}: reference quirk disappeared?"
        # note-assembly parity: rename the reference events to the
        # extraction-path names and re-run its writer -> full equality
        for ev in ref_events:
            if ev.name in ref.DEFAULT_TRACKS:
                ev.name = "track_" + ev.name
        ref_midi2 = ref.MuMIDI_EventSeq.write_midi(
            ref_events, str(tmp_path / "r2.mid"))
        ri2, rt2, rm2, _ = _mtk_midi_tuples(ref_midi2)
        assert sorted(ri2) == sorted(oi), f"trial {trial}"
        assert rt2 == ot and rm2 == om, f"trial {trial}"


def test_performance_rnn_beam_search_parity():
    """Deterministic beam search vs the reference PerformanceRNN
    .beam_search (network.py:156-257). The reference's hidden gather
    hard-codes repeat(4, 1, 1, 1024) (network.py:241), so it only
    executes at gru_layers=4, hidden_dim=1024 — the parity config here
    (our decode/beam.py is shape-generic). B=1 sidesteps the
    init_to_hidden view quirk."""
    pr = rs.load_performance_rnn()
    from musicgeneration_tpu.decode.beam import beam_search
    from musicgeneration_tpu.models.performance_rnn import PerformanceRNN

    L_, H_, V_ = 4, 1024, 24
    torch.manual_seed(17)
    ref = pr.PerformanceRNN(event_dim=V_, control_dim=4, init_dim=8,
                            hidden_dim=H_, gru_layers=L_,
                            gru_dropout=0.0)
    ref.eval()
    params = {
        "event_embedding": {"embedding": t2j(ref.event_embedding.weight)},
        "inithid_fc": _linear(ref.inithid_fc),
        "concat_input_fc": _linear(ref.concat_input_fc),
        "gru": _gru_params(ref.gru, L_),
        "output_fc": _linear(ref.output_fc),
    }
    ours = PerformanceRNN(event_dim=V_, control_dim=4, init_dim=8,
                          hidden_dim=H_, num_layers=L_, dropout_rate=0.0)

    rng = np.random.default_rng(18)
    steps, beam = 6, 3
    init = rng.normal(size=(1, 8)).astype(np.float32)

    with torch.no_grad():
        ref_best = ref.beam_search(torch.from_numpy(init), steps, beam,
                                   temperature=1.0,
                                   stochastic=False).numpy()
    # [steps(+primary), batch]: row 0 is the primary event
    assert ref_best.shape[1] == 1
    ref_seq = ref_best[1:, 0]

    cache = ours.apply({"params": params}, 1, 0,
                       jnp.asarray(init), method=ours.init_cache)
    state = jax.tree.map(lambda h: jnp.repeat(h, beam, axis=1), cache)

    def step_fn(tokens, state):
        return ours.apply({"params": params}, tokens, state, None,
                          method=ours.decode_step)

    got = beam_search(
        step_fn, state,
        jnp.full((1,), ours.primary_event, jnp.int32),
        steps, beam, V_, temperature=1.0, state_batch_axis=1)
    np.testing.assert_array_equal(np.asarray(got)[0], ref_seq)


class _QueuedGumbel:
    """Stands in for torch.distributions.Gumbel inside the reference's
    beam_search: replays a queue of pre-drawn noise arrays so the same
    Gumbel perturbations can be fed to both implementations."""

    queue = []

    def __init__(self, *a):
        pass

    def sample(self, shape):
        arr = _QueuedGumbel.queue.pop(0)
        assert tuple(shape) == arr.shape, (shape, arr.shape)
        return torch.from_numpy(arr)


def _event_rnn_4x1024():
    """The ONLY shape the reference Event_MelodyRNN beam executes at:
    its hidden re-gather hard-codes repeat(4, 1, 1, 1024)
    (network.py:252) = gru_layers=4, hidden_dim=1024."""
    er = rs.load_event_rnn()
    from musicgeneration_tpu.models.event_rnn import EventMelodyRNN

    L_, H_, V_ = 4, 1024, 24
    torch.manual_seed(23)
    ref = er.Event_Melody_RNN(init_dim=8, event_dim=V_, hidden_dim=H_,
                              rnn_layers=L_, dropout=0.0)
    ref.eval()
    params = {
        "event_embedding": {"embedding": t2j(ref.event_embedding.weight)},
        "inithid_fc": _linear(ref.inithid_fc),
        "gru": _gru_params(ref.rnn, L_),
        "output_fc": _linear(ref.output_fc),
    }
    ours = EventMelodyRNN(event_dim=V_, init_dim=8, hidden_dim=H_,
                          num_layers=L_, dropout_rate=0.0)
    return er, ref, ours, params, V_


@pytest.mark.parametrize("stochastic", [False, True])
def test_event_melody_rnn_beam_search_parity(stochastic):
    """Event_Melody_RNN.beam_search (network.py:166-268) vs ours at the
    reference's hard-coded 4x1024 shape — deterministic AND stochastic
    (Gumbel) variants. The stochastic run injects the SAME pre-drawn
    noise on both sides (reference via a patched Gumbel class, ours via
    beam_search(gumbel_noise=)); all_beams_live=True reproduces the
    reference's all-live start (current_beam_size = beam_size at
    network.py:172), under which Gumbel selection can route one token
    through several identical parent beams at step 0."""
    er, ref, ours, params, V_ = _event_rnn_4x1024()
    from musicgeneration_tpu.decode.beam import beam_search

    rng = np.random.default_rng(24)
    steps, beam = 6, 3
    init = rng.normal(size=(1, 8)).astype(np.float32)

    noise = None
    if stochastic:
        noise = rng.gumbel(size=(steps, 1, beam, V_)).astype(np.float32)
        _QueuedGumbel.queue = [noise[i][None] for i in range(steps)]
        # noise[i] arrives as [1, batch, cbeam, out] in the reference
        saved = er.Gumbel
        er.Gumbel = _QueuedGumbel
    try:
        with torch.no_grad():
            ref_best = ref.beam_search(
                torch.from_numpy(init), steps, beam, temperature=1.0,
                stochastic=stochastic).numpy()
    finally:
        if stochastic:
            er.Gumbel = saved
            assert not _QueuedGumbel.queue  # every step consumed noise
    assert ref_best.shape[1] == 1
    # the reference seeds beam_events with `current_beam_size` copies of
    # the primary event (event[0,:,None,:].repeat(1, cbeam, 1) at
    # network.py:184 makes [batch, cbeam, cbeam]) — with the all-live
    # start that is `beam` leading primary rows, not 1
    assert (ref_best[:beam, 0] == ref.primary_event).all()
    ref_seq = ref_best[beam:, 0]

    cache = ours.apply({"params": params}, 1, 0, jnp.asarray(init),
                       method=ours.init_cache)
    state = jax.tree.map(lambda h: jnp.repeat(h, beam, axis=1), cache)

    def step_fn(tokens, state):
        return ours.apply({"params": params}, tokens, state,
                          method=ours.decode_step)

    got = beam_search(
        step_fn, state, jnp.full((1,), ours.primary_event, jnp.int32),
        steps, beam, V_, temperature=1.0, state_batch_axis=1,
        stochastic=stochastic, all_beams_live=True,
        gumbel_noise=(None if noise is None
                      else noise.reshape(steps, 1, beam * V_)))
    np.testing.assert_array_equal(np.asarray(got)[0], ref_seq)


# ==========================================================================
# (vi) Executable EXTRACTION parity: the reference's full
#      extract_events pipelines run on fixture MIDIs via the parsing
#      stub (reference_shim._MTKMidiFile delegates to our SMF parser)
# ==========================================================================

def _fixture_midis(tmp_path):
    from .fixtures import polyphonic_midi, simple_piano_midi

    paths = []
    for i in range(4):
        p = tmp_path / f"s{i}.mid"
        simple_piano_midi(str(p), seed=i)
        paths.append(str(p))
    for i in range(3):
        p = tmp_path / f"p{i}.mid"
        polyphonic_midi(str(p), seed=10 + i)
        paths.append(str(p))
    return paths


def test_remi_extract_events_executable_parity(tmp_path):
    """REMI_EventSeq.extract_events (REMI.py:492-508: read_items ->
    quantize -> chord inference -> group -> item2event) executed by the
    reference itself vs our tokenizers/remi.py: EVENT-STREAM equality
    (name, value) on fixture MIDIs. Both sides parse through OUR SMF
    parser, so this locks the whole tokenization algorithm including
    chord inference and the downbeat/grouping quirks.

    Arrays are compared at the EVENT level because the reference's own
    to_array crashes on any note_velocity index >= 4 (its vocab
    reserves 4 slots against 31 velocity bin edges, REMI.py:452 vs
    :19-22) — that crash is machine-pinned below; our to_array clamps
    by default and replicates the crash under strict=True."""
    ref = rs.load_utils().REMI
    import pytest as _pytest

    from musicgeneration_tpu.tokenizers import remi

    saw_hot_velocity = False
    for path in _fixture_midis(tmp_path):
        ref_events = ref.REMI_EventSeq.extract_events(path)
        our_events = remi.REMI_EventSeq.extract_events(path)
        ref_sig = [(e.name, str(e.value)) for e in ref_events]
        our_sig = [(e.name, str(int(e.value))
                    if not isinstance(e.value, str) else e.value)
                   for e in our_events]
        assert ref_sig == our_sig, path
        hot = any(e.name == "note_velocity" and int(e.value) >= 4
                  for e in ref_events)
        if hot:
            saw_hot_velocity = True
            # reference quirk machine-pinned: its to_array IndexErrors
            with _pytest.raises(IndexError):
                ref.REMI_EventSeq.to_array(ref_events)
            with _pytest.raises(IndexError):
                remi.REMI_EventSeq.to_array(our_events, strict=True)
        else:
            np.testing.assert_array_equal(
                remi.REMI_EventSeq.to_array(our_events),
                ref.REMI_EventSeq.to_array(ref_events), err_msg=path)
    assert saw_hot_velocity, "fixtures never hit the velocity quirk"


def test_mumidi_extract_split_executable_parity(tmp_path):
    """MuMIDI extract_split_events (MuMIDI.py:448-475) executed by the
    reference vs ours: melody AND arrangement token arrays equal on
    multitrack fixtures."""
    ref = rs.load_utils().MuMIDI
    from .fixtures import multitrack_midi
    from musicgeneration_tpu.tokenizers import mumidi

    for i in range(4):
        path = str(tmp_path / f"m{i}.mid")
        multitrack_midi(path, seed=i)
        # the reference returns EVENT lists; its corpus pipeline applies
        # to_array afterwards (process_MuMIDI.py:21-26) — same here
        ref_mel, ref_arr = ref.MuMIDI_EventSeq.extract_split_events(path)
        ref_mel = ref.MuMIDI_EventSeq.to_array(ref_mel)
        ref_arr = ref.MuMIDI_EventSeq.to_array(ref_arr)
        our_mel, our_arr = mumidi.MuMIDI_EventSeq.extract_split_events(
            path)
        our_mel = mumidi.MuMIDI_EventSeq.to_array(our_mel)
        our_arr = mumidi.MuMIDI_EventSeq.to_array(our_arr)
        np.testing.assert_array_equal(np.asarray(our_mel),
                                      np.asarray(ref_mel), err_msg=path)
        np.testing.assert_array_equal(np.asarray(our_arr),
                                      np.asarray(ref_arr), err_msg=path)


def test_pedal_codec_executable_parity(tmp_path):
    """The sustain-pedal codec (MusicTransformer/processor.py
    encode_midi, vocab 388) executed by the reference vs our
    tokenizers/pedal_midilike.encode_midi(faithful=True) — token
    equality on fixtures incl. CC64 sustain windows, plus fuzzed
    multi-instrument files (the adversarial generator from
    test_native_pedal). Both parse through our SMF parser's seconds
    view. faithful=True replicates processor.py:181-199's
    note-dropping quirk, which the reference path exercises here."""
    proc = rs.load_processor()
    from musicgeneration_tpu.tokenizers import pedal_midilike as pm_codec

    from .fixtures import simple_piano_midi, tempo_change_midi
    from .test_native_pedal import _rand_midi

    paths = []
    for i, builder in enumerate((simple_piano_midi, tempo_change_midi)):
        p = str(tmp_path / f"b{i}.mid")
        builder(p)
        paths.append(p)
    rng = np.random.RandomState(5)
    for i in range(6):
        p = str(tmp_path / f"r{i}.mid")
        _rand_midi(p, rng)
        paths.append(p)

    for path in paths:
        ref_ids = proc.encode_midi(path)
        our_ids = pm_codec.encode_midi(path, faithful=True)
        np.testing.assert_array_equal(np.asarray(our_ids),
                                      np.asarray(ref_ids), err_msg=path)


def test_pedal_codec_decode_executable_parity():
    """processor.py decode_midi on random token arrays vs our
    pedal_midilike.decode_midi(faithful=True): identical reconstructed
    note lists. The reference keeps float seconds; ours writes integer
    ticks at 120 bpm / 480 tpb (ticks = seconds * 960), so times agree
    to the one-tick quantization (~1 ms) and pitch/velocity exactly."""
    proc = rs.load_processor()
    from musicgeneration_tpu.tokenizers import pedal_midilike as pm_codec

    rng = np.random.default_rng(41)
    for trial in range(12):
        ids = rng.integers(0, 388, size=rng.integers(20, 300)).tolist()
        ref_mid = proc.decode_midi(ids)
        ref_notes = sorted(
            (round(n.start, 9), round(n.end, 9), n.pitch, n.velocity)
            for n in ref_mid.instruments[0].notes)
        our_mid = pm_codec.decode_midi(ids, faithful=True)
        tick_per_sec = 480 * 120 / 60.0
        our_notes = sorted(
            (round(n.start / tick_per_sec, 9),
             round(n.end / tick_per_sec, 9), n.pitch, n.velocity)
            for inst in our_mid.instruments for n in inst.notes)
        assert len(ref_notes) == len(our_notes), f"trial {trial}"
        for (rs_, re_, rp, rv), (os_, oe_, op, ov) in zip(ref_notes,
                                                          our_notes):
            assert (rp, rv) == (op, ov), f"trial {trial}"
            np.testing.assert_allclose([os_, oe_], [rs_, re_],
                                       rtol=0, atol=1.5 / 960,
                                       err_msg=f"trial {trial}")


# ==========================================================================
# (vii) Melody note-array codec (mg/utils/midi2note.py via a music21
#       stub; numpy 1.x aliases restored around calls)
# ==========================================================================

def test_melody_note_array_executable_parity():
    """streamToNoteArray (midi2note.py:13-42: grid-snap, highest-pitch
    dedup per semiquaver, note-off placement) executed by the reference
    on a stubbed music21 stream vs our midi_to_note_array on the SAME
    note content as an in-memory MidiFile (quarter -> 480-tick grid)."""
    mod = rs.load_midi2note()
    m21 = __import__("music21")
    from musicgeneration_tpu.midi.containers import (Instrument, Note,
                                                     TempoChange)
    from musicgeneration_tpu.midi.smf import MidiFile
    from musicgeneration_tpu.tokenizers import melody

    rng = np.random.default_rng(51)
    for trial in range(15):
        n = int(rng.integers(3, 40))
        # quarter-unit content on the semiquaver grid (both sides snap
        # by round(x/0.25); on-grid content keeps the comparison exact)
        offs = np.sort(rng.integers(0, 64, size=n)) * 0.25
        durs = rng.integers(1, 9, size=n) * 0.25
        pitches = rng.integers(40, 100, size=n)

        elements = [m21.note.Note(int(p), float(o), float(d))
                    for o, d, p in zip(offs, durs, pitches)]
        if trial % 3 == 0 and n > 4:  # sprinkle chords: highest wins
            elements[2] = m21.chord.Chord(
                [int(pitches[2]), int(pitches[2]) - 5],
                float(offs[2]), float(durs[2]))
        stream = m21.stream.Stream(elements)
        with rs.with_legacy_numpy():
            ref_arr = mod.streamToNoteArray(stream)

        midi = MidiFile(ticks_per_beat=480)
        midi.tempo_changes = [TempoChange(tempo=120.0, time=0)]
        inst = Instrument(0, False, "melody")
        for el in elements:
            if isinstance(el, m21.chord.Chord):
                for pc in el.pitches:
                    inst.notes.append(Note(
                        velocity=100, pitch=pc.midi,
                        start=int(el.offset * 480),
                        end=int((el.offset + el.quarterLength) * 480)))
            else:
                inst.notes.append(Note(
                    velocity=100, pitch=el.pitch.midi,
                    start=int(el.offset * 480),
                    end=int((el.offset + el.quarterLength) * 480)))
        midi.instruments.append(inst)
        our_arr = melody.midi_to_note_array(midi)

        # the reference emits total_length+2 slots; ours sizes off the
        # last note end — compare the common prefix and require the
        # reference's tail to be silent
        m_len = min(len(ref_arr), len(our_arr))
        np.testing.assert_array_equal(our_arr[:m_len], ref_arr[:m_len],
                                      err_msg=f"trial {trial}")
        assert all(v in (128, 129) for v in ref_arr[m_len:])
        assert all(v == 129 for v in our_arr[m_len:])


def test_melody_note_array_to_stream_executable_parity():
    """noteArrayToStream (midi2note.py:57-73) vs our
    note_array_to_midi on random note arrays: same reconstructed
    (pitch, start, duration) content (the reference's Rest elements are
    our gaps)."""
    mod = rs.load_midi2note()
    from musicgeneration_tpu.tokenizers import melody

    m21 = __import__("music21")
    rng = np.random.default_rng(52)
    for trial in range(10):
        arr = rng.choice(
            np.concatenate([rng.integers(40, 100, size=6),
                            [128, 129, 129]]),
            size=rng.integers(8, 60)).astype(np.int16)
        with rs.with_legacy_numpy():
            ref_stream = mod.noteArrayToStream(arr)
        ref_notes = [(e.pitch.midi, e.offset, e.quarterLength)
                     for e in ref_stream.elements
                     if isinstance(e, m21.note.Note)]
        our_mid = melody.note_array_to_midi(arr)
        our_notes = [(n.pitch, n.start / 480.0, (n.end - n.start) / 480.0)
                     for n in our_mid.instruments[0].notes]
        assert len(ref_notes) == len(our_notes), f"trial {trial}"
        for (rp, ro, rd), (op, oo, od) in zip(ref_notes, our_notes):
            assert rp == op, f"trial {trial}"
            np.testing.assert_allclose([oo, od], [ro, rd], atol=1e-9,
                                       err_msg=f"trial {trial}")


# ==========================================================================
# (viii) Dataset/batching layer: PoPMAG compound packing + labels
#        (mg/model/utils/data.py Melody_Arrangement_Dataset)
# ==========================================================================

def _segmented_fixture_seqs(tmp_path, n=3):
    from .fixtures import multitrack_midi
    from musicgeneration_tpu.tokenizers import mumidi

    seqs = []
    for i in range(n):
        path = str(tmp_path / f"pk{i}.mid")
        multitrack_midi(path, seed=20 + i)
        mel, arr = mumidi.MuMIDI_EventSeq.extract_split_events(path)
        mel = mumidi.MuMIDI_EventSeq.to_array(mel)
        arr = mumidi.MuMIDI_EventSeq.to_array(arr)
        seqs.append([np.asarray(b, np.int64) for b in
                     mumidi.MuMIDI_EventSeq.segmentation(arr)][:6])
        seqs.append([np.asarray(b, np.int64) for b in
                     mumidi.MuMIDI_EventSeq.segmentation(mel)][:6])
    return [s for s in seqs if s]


def test_popmag_get_mask_executable_parity(tmp_path):
    """Melody_Arrangement_Dataset.get_mask (utils/data.py:218-312: the
    7-tuple compound-embedding id packing, incl. the bar-token row's
    NEXT-bar id and the tempo two-row split) executed by the reference
    vs our data/mumidi_packing.pack_compound, on segmented fixture
    sequences — padded tensors AND per-bar lengths equal."""
    data_mod = rs.load_utils_data()
    from musicgeneration_tpu.data import mumidi_packing as mp

    seqs = _segmented_fixture_seqs(tmp_path)
    batch_in = [[b.tolist() for b in s] for s in seqs]
    for delta in (0, 1):
        pad, lens = data_mod.Melody_Arrangement_Dataset.get_mask(
            batch_in, delta=delta)
        pad, lens = pad.numpy(), lens.numpy()

        ours = [mp.pack_compound(s, delta=-1 if delta else 0)
                for s in seqs]
        mx_bars = max(len(a) for a, _ in ours)
        mx_len = max(max(l) for _, l in ours)
        got = np.zeros((len(seqs), mx_bars, mx_len, 7), np.int64)
        got_lens = np.ones((len(seqs), mx_bars))
        for bi, (arrs, ls) in enumerate(ours):
            for gi, a in enumerate(arrs):
                got[bi, gi, :len(a)] = a
                got_lens[bi, gi] = len(a)
        assert pad.shape == got.shape, f"delta={delta}"
        np.testing.assert_array_equal(got, pad.astype(np.int64),
                                      err_msg=f"delta={delta}")
        np.testing.assert_array_equal(got_lens, lens,
                                      err_msg=f"delta={delta}")


def test_popmag_label_mask_executable_parity(tmp_path):
    """Melody_Arrangement_Dataset.label_mask (utils/data.py:314-418:
    3-head labels with per-head index shifts + loss mask) vs our
    pack_labels."""
    data_mod = rs.load_utils_data()
    from musicgeneration_tpu.data import mumidi_packing as mp

    seqs = _segmented_fixture_seqs(tmp_path)
    batch_in = [[b.tolist() for b in s] for s in seqs]
    pad, mask = data_mod.Melody_Arrangement_Dataset.label_mask(batch_in)
    pad, mask = pad.numpy(), mask.numpy()

    ours = [mp.pack_labels(s) for s in seqs]
    mx_bars = max(len(a) for a, _ in ours)
    mx_len = max(len(b) for a, _ in ours for b in a)
    got = np.zeros((len(seqs), mx_bars, mx_len, 3), np.int64)
    got_mask = np.zeros_like(got)
    for bi, (labels, masks) in enumerate(ours):
        for gi, (a, m) in enumerate(zip(labels, masks)):
            got[bi, gi, :len(a)] = a
            got_mask[bi, gi, :len(m)] = m
    assert pad.shape == got.shape
    np.testing.assert_array_equal(got, pad.astype(np.int64))
    np.testing.assert_array_equal(got_mask, mask.astype(np.int64))


def test_controlseq_recover_executable_parity():
    """ControlSeq.recover_compressed_array (utils/sequence.py:385-407)
    vs ours on fuzzed compressed arrays."""
    ref = rs.load_utils().sequence
    from musicgeneration_tpu.tokenizers import midilike

    rng = np.random.default_rng(61)
    for trial in range(10):
        ids = rng.integers(0, 308, size=rng.integers(30, 300))
        comp = midilike.ControlSeq.compressed_from_ids(ids)
        ref_rec = ref.ControlSeq.recover_compressed_array(comp)
        our_rec = midilike.ControlSeq.recover_compressed_array(comp)
        np.testing.assert_allclose(np.asarray(our_rec),
                                   np.asarray(ref_rec), atol=1e-12,
                                   err_msg=f"trial {trial}")


def test_event_dataset_windowing_executable_parity(tmp_path):
    """Event_Dataset (utils/data.py:49-128) executed on a real
    torch.save'd corpus dir vs our window_indices/gather_windows:
    identical window index lists (incl. the exclusive-stop tail-drop
    quirk), identical time-major SegBatchify blocks, and the same
    length-percentile stat."""
    data_mod = rs.load_utils_data()
    from musicgeneration_tpu.data.batching import (gather_windows,
                                                   window_indices)

    rng = np.random.default_rng(71)
    seqs = [rng.integers(0, 308, size=int(n)).astype(np.int64)
            for n in rng.integers(40, 400, size=9)]
    root = tmp_path / "corpus"
    root.mkdir()
    for i, s in enumerate(seqs):
        # torch>=2.6 weights_only default rejects pickled numpy arrays;
        # tensors round-trip and behave identically downstream
        torch.save(torch.from_numpy(s), str(root / f"s{i}.data"))

    ds = data_mod.Event_Dataset(str(root), limlen=64)
    kept = [s for s in seqs if len(s) >= 64]
    assert len(ds.samples) == len(kept)
    # find_files_by_extensions walks in os.walk order — align ours to
    # the reference's own loading order for index comparison
    ref_lens = list(ds.seqlens)

    window, stride, = 32, 7
    ref_idx = ds.batches(4, window, stride)
    our_idx = window_indices(ref_lens, window, stride)
    assert [(i, (s, s + window)) for i, s in our_idx] == ref_idx

    take = ref_idx[:6]
    ref_block = ds.SegBatchify(take)
    our_block = gather_windows(ds.samples, np.asarray(
        [(i, s) for i, (s, _) in take]), window, time_major=True)
    np.testing.assert_array_equal(our_block, ref_block)


def test_metrics_and_data_slicing_executable_parity(tmp_path):
    """CategoricalAccuracy / LogitsBucketting (MusicTransformer/
    metrics.py:38-60) and the Data class's 80/10/10 file split +
    slide_seq2seq x/y slicing (MusicTransformer/data.py:13-67) executed
    by the reference vs train/objective.py and data/batching.py.

    The random CROP draw itself differs by design: the reference's
    random.sample picks files WITHOUT replacement from the global
    python RNG; ours draws with replacement from a seeded RandomState —
    documented divergence, so parity here covers the deterministic
    parts (filtering, split ratios, shifted-view slicing, metrics)."""
    mt_mod = rs.load_music_transformer()
    from musicgeneration_tpu.train.objective import (logits_bucketting,
                                                     token_accuracy)

    rng = np.random.default_rng(81)
    logits = rng.normal(size=(3, 20, 41)).astype(np.float32)
    targets = rng.integers(0, 41, size=(3, 20))
    ref_acc = float(mt_mod.metrics.CategoricalAccuracy()(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    got_acc = float(token_accuracy(jnp.asarray(logits),
                                   jnp.asarray(targets)))
    np.testing.assert_allclose(got_acc, ref_acc, atol=1e-7)
    ref_buckets = mt_mod.metrics.LogitsBucketting(41)(
        torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    np.testing.assert_array_equal(
        np.asarray(logits_bucketting(jnp.asarray(logits))), ref_buckets)

    # Data: 80/10/10 listing-order split + min-length filter
    root = tmp_path / "mtdata"
    root.mkdir()
    lens = [50, 200, 120, 30, 300, 80, 500, 90, 260, 400]
    for i, n in enumerate(lens):
        torch.save(torch.arange(n) % 300, str(root / f"f{i:02d}.data"))
    ref_data = mt_mod.network.__dict__  # noqa: F841 (namespace warm)
    data_cls = rs._import_isolated(
        ["/root/reference/mg/model/MusicTransformer"], ["data"],
        "ref_mt_data")["data"]
    d = data_cls.Data(str(root), 100)
    # the reference splits by ITS OWN listing order (os.walk, not
    # sorted) — derive the expectation from the listing it saw
    import os as _os
    listed = [_os.path.basename(p) for p in d.files]
    def keep(names):
        return [f for f in names if lens[int(f[1:3])] >= 100]
    n = len(listed)
    expect = {
        "train": keep(listed[:int(n * 0.8)]),
        "valid": keep(listed[int(n * 0.8):int(n * 0.9)]),
        "test": keep(listed[int(n * 0.9):]),
    }
    got = {k: [_os.path.basename(p) for p in v]
           for k, v in d.file_dict.items()}
    assert got == expect
    # our cli.split ratio command implements the same listing-order
    # ratio split semantics (cli/split.py) — covered by tests/test_cli

    # slide_seq2seq slicing: crop of length+1 -> x=[:-1], y=[1:]
    import random as _random
    _random.seed(0)
    x, y = d.slide_seq2seq_batch(2, 64, mode="train")
    np.testing.assert_array_equal(x[:, 1:], y[:, :-1])
    assert x.shape == (2, 64) and y.shape == (2, 64)


def test_chord_inference_direct_fuzz_executable_parity():
    """MIDIChord.extract (utils/chord_inference.py:157-188) executed by
    the reference on RANDOM note lists vs our tokenizers/chords.py —
    beyond the fixture-driven extraction parity, this stresses root
    tie-breaks (bass-note fallback), the ':None' greedy merge, and the
    4-vs-2-beat window preference on adversarial content."""
    ref_mod = rs.load_utils()
    ref_chord = rs._import_isolated(
        ["/root/reference/mg/model"], ["utils.chord_inference"],
        "ref_chord_inference")["utils.chord_inference"]
    from musicgeneration_tpu.midi.containers import Note as OurNote
    from musicgeneration_tpu.tokenizers.chords import MIDIChord as Ours

    mtk_note = ref_mod.miditoolkit.midi.containers.Note
    rng = np.random.default_rng(101)
    for trial in range(15):
        n = int(rng.integers(2, 50))
        starts = rng.integers(0, 480 * 12, size=n)
        durs = rng.integers(60, 480 * 3, size=n)
        pitches = rng.integers(30, 100, size=n)
        if trial % 4 == 0:  # sparse single-pitch content -> :None merges
            pitches[:] = pitches[0]
        ref_notes = [mtk_note(velocity=80, pitch=int(p), start=int(s),
                              end=int(s + d))
                     for s, d, p in zip(starts, durs, pitches)]
        our_notes = [OurNote(velocity=80, pitch=int(p), start=int(s),
                             end=int(s + d))
                     for s, d, p in zip(starts, durs, pitches)]
        ref_out = ref_chord.MIDIChord().extract(ref_notes)
        our_out = Ours().extract(our_notes)
        assert [list(c) for c in our_out] == [list(c) for c in ref_out], \
            f"trial {trial}"


# ==========================================================================
# (ix) Event_MelodyRNN 'sequence' / 'window' train modes
# ==========================================================================

def _event_rnn_pair(dims=None, seed=7):
    """Transplanted (torch reference, our model, params) triple."""
    er = rs.load_event_rnn()
    from musicgeneration_tpu.models.event_rnn import EventMelodyRNN

    dims = dims or dict(init_dim=8, event_dim=40, hidden_dim=32,
                        rnn_layers=2)
    torch.manual_seed(seed)
    ref = er.Event_Melody_RNN(dropout=0.0, **dims)
    ref.eval()
    params = {
        "event_embedding": {"embedding": t2j(ref.event_embedding.weight)},
        "inithid_fc": _linear(ref.inithid_fc),
        "gru": _gru_params(ref.rnn, dims["rnn_layers"]),
        "output_fc": _linear(ref.output_fc),
    }
    ours = EventMelodyRNN(event_dim=dims["event_dim"],
                          init_dim=dims["init_dim"],
                          hidden_dim=dims["hidden_dim"],
                          num_layers=dims["rnn_layers"],
                          dropout_rate=0.0)
    return ref, ours, params


def test_seqbatchify_executable_parity():
    """pad_and_batch_sequences vs the executing reference SeqBatchify
    (utils/data.py:23-36): same sort order, padded tokens, lengths, and
    concatenated shifted-tail labels."""
    data_mod = rs.load_utils_data()
    from musicgeneration_tpu.data.batching import pad_and_batch_sequences

    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 40, size=int(n)).astype(np.int64)
            for n in rng.integers(3, 25, size=6)]
    X, Y, lengths = data_mod.SeqBatchify([list(s) for s in seqs])
    sb = pad_and_batch_sequences(seqs)
    np.testing.assert_array_equal(sb.tokens, X.astype(np.int32))
    np.testing.assert_array_equal(sb.lengths, lengths)
    np.testing.assert_array_equal(sb.labels, Y.astype(np.int32))


def test_sequence_mode_loss_executable_parity():
    """cli.train train_mode=sequence loss vs the reference sequence-mode
    objective (Event_MelodyRNN/train.py:263-295) executed through its
    WORKING pieces: SeqBatchify -> SeqForward's pack_padded path ->
    CE(flatten_padded_sequences(outs, lengths), Y).

    (As literally shipped the reference's sequence branch cannot run:
    Train feeds a batch-major [B, mx] tensor to the time-major
    SeqForward, whose get_primary_event(batch=mx) + cat((one, output))
    then disagrees with the label count in the CE call. The lock below
    drives the same modules in the composition the code intends —
    packed RNN over the padded batch, loss over each sequence's
    shifted unpadded tail — sharing h0 across frameworks to bypass the
    separately-pinned init_to_hidden B>1 view scramble.)"""
    data_mod = rs.load_utils_data()
    ref, ours, params = _event_rnn_pair()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    seqs = [rng.integers(0, 40, size=int(n)).astype(np.int64)
            for n in rng.integers(4, 20, size=4)]
    X, Y, lengths = data_mod.SeqBatchify([list(s) for s in seqs])
    b, mx = X.shape
    init = rng.normal(size=(b, 8)).astype(np.float32)

    with torch.no_grad():
        # shared h0: our per-element init mapping, computed in torch
        h0 = torch.tanh(ref.inithid_fc(torch.from_numpy(init)))
        h0 = h0.view(b, 2, 32).permute(1, 0, 2).contiguous()
        one_in = ref.get_primary_event(b)
        _, hidden = ref.rnn(ref.event_embedding(one_in), h0)
        emb = ref.event_embedding(torch.from_numpy(X.astype(np.int64)))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            emb, lengths, batch_first=True)
        out, _ = ref.rnn(packed, hidden)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True)
        outs = ref.output_fc(out)                      # [B, mx, V]
        flat = data_mod.flatten_padded_sequences(outs, lengths)
        ref_loss = torch.nn.CrossEntropyLoss()(
            flat, torch.from_numpy(Y.astype(np.int64))).item()

    # our sequence-mode loss (cli/train.py seq_loss_fn semantics),
    # with the same init instead of a drawn one
    tokens = jnp.asarray(X.astype(np.int32))
    lens_j = jnp.asarray(lengths.astype(np.int32))
    logits = ours.apply({"params": params}, jnp.asarray(init), tokens.T,
                        lengths=lens_j)
    logits = logits[:-1].transpose(1, 0, 2)
    t_pos = jnp.arange(tokens.shape[1])[None, :]
    mask = (t_pos >= 1) & (t_pos < lens_j[:, None])
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, tokens[..., None],
                                 axis=-1)[..., 0]
    our_loss = float(-(tok_lp * mask).sum() / mask.sum())
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-5, atol=2e-5)


def test_window_mode_scheduled_sampling_parity(monkeypatch):
    """scheduled_sampling_logits vs the reference window-mode training
    forward `generate(init, W, events=events[:-1],
    teacher_forcing_ratio=r, output_type='logit')`
    (Event_MelodyRNN/train.py:231-232, network.py:119-164), with the
    reference's global np.random.random() patched to a recorded draw
    sequence so both sides make identical teacher/self decisions.
    B=1 keeps init_to_hidden quirk-free."""
    ref, ours, params = _event_rnn_pair(seed=9)
    from musicgeneration_tpu.models.event_rnn import (
        scheduled_sampling_logits)
    import jax.numpy as jnp

    W, ratio = 12, 0.5
    rng = np.random.default_rng(13)
    events = rng.integers(0, 40, size=(W, 1))
    init = rng.normal(size=(1, 8)).astype(np.float32)
    draws = list(rng.uniform(size=2 * W))
    seq = iter(list(draws))
    monkeypatch.setattr(np.random, "random", lambda: next(seq))
    with torch.no_grad():
        ref_logits = ref.generate(
            torch.from_numpy(init), W,
            events=torch.from_numpy(events[:-1]).to(torch.long),
            teacher_forcing_ratio=ratio,
            output_type='logit').numpy()           # [W, 1, V]
    monkeypatch.undo()
    # reference draw order per step: use_greedy (always true at
    # greedy=1.0), then — for steps < W-1 — the teacher draw
    teach = np.asarray([draws[2 * t + 1] <= ratio for t in range(W - 1)])
    got = np.asarray(scheduled_sampling_logits(
        ours, params, jnp.asarray(init), jnp.asarray(events),
        jnp.asarray(teach)))
    assert teach.sum() not in (0, W - 1)  # the mix actually mixes
    np.testing.assert_allclose(got, ref_logits, rtol=2e-5, atol=2e-5)


def test_scheduled_sampling_full_teacher_equals_train_forward():
    """All-teacher draws reduce scheduled sampling to the plain
    teacher-forced forward (EventMelodyRNN.__call__ rows [:-1])."""
    _, ours, params = _event_rnn_pair(seed=4)
    from musicgeneration_tpu.models.event_rnn import (
        scheduled_sampling_logits)
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    events = jnp.asarray(rng.integers(0, 40, size=(9, 3)))
    init = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    sched = scheduled_sampling_logits(
        ours, params, init, events, jnp.ones((8,), bool))
    plain = ours.apply({"params": params}, init, events)[:-1]
    np.testing.assert_allclose(np.asarray(sched), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)
