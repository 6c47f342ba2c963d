"""Reference-checkpoint import: the three torch on-disk formats ->
our msgpack checkpoints, consumed by cli.generate.

VERDICT round-3 item 4: train the in-process reference a few steps,
save its NATIVE format (`torch.save`), import via
cli.import_checkpoint, and prove cli.generate produces token-identical
greedy output to the reference model's own forward.

Formats covered (SURVEY.md §5 checkpoint row):
  (a) {'net','optimizer','epoch'}   MusicTransformer/train.py:201-211
  (b) {'model_config','model_state','model_optimizer_state'}
                                     PerformanceRNN/train.py:195-201
  (c) bare state_dict                Event_MelodyRNN/train.py:188-195
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from musicgeneration_tpu.cli.import_checkpoint import (  # noqa: E402
    import_torch_checkpoint,
)
from musicgeneration_tpu.utils.checkpoint import (  # noqa: E402
    restore_checkpoint,
)

from . import reference_shim as rs  # noqa: E402


def _train_a_little(ref, vocab, steps=3, seq=32, seed=0):
    """A few Adam steps on random tokens, so the imported weights are a
    trained state, not an init."""
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    gen = torch.Generator().manual_seed(seed)
    ref.train()
    for _ in range(steps):
        x = torch.randint(0, vocab - 1, (2, seq), generator=gen)
        out = ref(x)
        logits = out[0] if isinstance(out, tuple) else out
        loss = torch.nn.functional.cross_entropy(
            logits.reshape(-1, logits.shape[-1]), x.reshape(-1))
        opt.zero_grad()
        loss.backward()
        opt.step()
    ref.eval()
    return opt


def _restore_like_generate(ckpt_dir):
    """The exact restore path cli.generate runs (generate.py:207-216)."""
    from musicgeneration_tpu.cli.train import TrainCLIConfig, build_session

    payload = restore_checkpoint(str(ckpt_dir))
    meta = payload["config"]
    cfg = TrainCLIConfig.from_dict(meta["cli"])
    model, *_ = build_session(cfg, meta["scheme"],
                              dict(meta["model_kwargs"]))
    return model, payload["state"]["params"], payload, cfg


def test_import_music_transformer_cli_generate_byte_parity(tmp_path):
    """Format (a): reference-trained MusicTransformer -> import ->
    cli.generate --temperature 0 writes a MIDI byte-identical to one
    decoded from the reference model's own greedy continuation."""
    mt_mod = rs.load_music_transformer()
    vocab, d_model, layers, max_seq = 309, 64, 2, 64
    torch.manual_seed(100)
    ref = mt_mod.network.MusicTransformer(
        embedding_dim=d_model, vocab_size=vocab, num_layer=layers,
        max_seq=max_seq, dropout=0.0)
    opt = _train_a_little(ref, vocab, seq=max_seq)

    pth = tmp_path / "train-7-0.5.pth"
    torch.save({"net": ref.state_dict(),
                "optimizer": opt.state_dict(), "epoch": 7}, pth)

    out_dir = tmp_path / "imported"
    config = import_torch_checkpoint(str(pth), str(out_dir))
    assert config["scheme"] == "midilike"
    kw = config["model_kwargs"]
    assert kw == {"vocab_size": vocab, "num_layers": layers,
                  "d_model": d_model, "max_seq": max_seq}
    payload = restore_checkpoint(str(out_dir))
    assert payload["step"] == 7  # the reference's saved epoch

    # reference greedy continuation from the default prime [24, 28, 31]
    # (generate.py:103-110), via the reference's CAUSAL forward (its
    # generate() instead passes mask=None — a non-causal quirk our
    # engine deliberately does not copy). The forward only accepts
    # max_seq-length input (utils.py:58-83 builds the mask at max_seq),
    # so pad with pad_token and read the logit at the live position.
    steps = 24
    seq = [24, 28, 31]
    with torch.no_grad():
        for _ in range(steps):
            x = np.full((1, max_seq), vocab - 1, np.int64)
            x[0, :len(seq)] = seq
            out = ref(torch.from_numpy(x))
            logits = out[0] if isinstance(out, tuple) else out
            seq.append(int(logits[0, len(seq) - 1].argmax()))
    ref_tokens = np.asarray(seq[3:], np.int32)

    from musicgeneration_tpu.cli import generate as gen_cli
    got_mid = tmp_path / "got.mid"
    rc = gen_cli.main([str(out_dir), str(got_mid), "--steps", str(steps),
                       "--temperature", "0"])
    assert rc == 0
    want_mid = tmp_path / "want.mid"
    gen_cli._write_midi("midilike", ref_tokens, str(want_mid))
    assert got_mid.read_bytes() == want_mid.read_bytes()


def test_import_event_rnn_bare_state_dict(tmp_path):
    """Format (c): bare state_dict -> import infers every dim from the
    tensor shapes; forward logits match the reference exactly."""
    er = rs.load_event_rnn()
    torch.manual_seed(101)
    ref = er.Event_Melody_RNN(init_dim=8, event_dim=40, hidden_dim=32,
                              rnn_layers=3, dropout=0.0)
    ref.eval()
    pth = tmp_path / "segment_32_3.pth"
    torch.save(ref.state_dict(), pth)

    out_dir = tmp_path / "imported"
    config = import_torch_checkpoint(str(pth), str(out_dir))
    assert config["scheme"] == "midilike"
    assert config["model_kwargs"] == {
        "event_dim": 40, "init_dim": 8, "hidden_dim": 32,
        "num_layers": 3}

    model, params, _, _ = _restore_like_generate(out_dir)
    rng = np.random.default_rng(5)
    init = rng.normal(size=(1, 8)).astype(np.float32)
    events = rng.integers(0, 40, size=(13, 1))
    with torch.no_grad():
        want = ref.Train(torch.from_numpy(init),
                         torch.from_numpy(events).to(torch.long)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(init),
                                 jnp.asarray(events)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_import_performance_rnn_session_dict(tmp_path):
    """Format (b): PerformanceRNN session dict; control_dim recovered
    from the concat-input width; teacher-forced logits match."""
    pr = rs.load_performance_rnn()
    torch.manual_seed(102)
    ref = pr.PerformanceRNN(event_dim=40, control_dim=6, init_dim=8,
                            hidden_dim=32, gru_layers=2, gru_dropout=0.0)
    ref.eval()
    pth = tmp_path / "session.sess"
    torch.save({"model_config": {"event_dim": 40},
                "model_state": ref.state_dict(),
                "model_optimizer_state": {}}, pth)

    out_dir = tmp_path / "imported"
    config = import_torch_checkpoint(str(pth), str(out_dir))
    assert config["scheme"] == "midilike_control"
    assert config["model_kwargs"] == {
        "event_dim": 40, "control_dim": 6, "init_dim": 8,
        "hidden_dim": 32, "num_layers": 2}

    model, params, _, _ = _restore_like_generate(out_dir)
    rng = np.random.default_rng(6)
    init = rng.normal(size=(1, 8)).astype(np.float32)
    events = rng.integers(0, 40, size=(11, 1))
    controls = rng.random(size=(11, 1, 6)).astype(np.float32)
    np.random.seed(0)
    with torch.no_grad():
        want = ref.generate(
            torch.from_numpy(init), 11,
            events=torch.from_numpy(events).to(torch.long),
            controls=torch.from_numpy(controls), greedy=1.0,
            temperature=1.0, teacher_forcing_ratio=1.0,
            output_type="logit").numpy()
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(init), jnp.asarray(events),
        jnp.asarray(controls)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_import_popmag_bare_state_dict(tmp_path):
    """Format (c) for PoPMAG: event_dim/bar_dim recovered from the head
    widths and embedding rows (network.py:20-57); compression parity."""
    pg = rs.load_popmag()
    torch.manual_seed(103)
    ref = pg.PoPMAG_RNN(init_dim=8, event_dim=485, hidden_dim=16,
                        bar_dim=188, embed_dim=16, rnn_layers=2,
                        dropout=0.0)
    ref.eval()
    pth = tmp_path / "256_256_2_epoch_4.pth"
    torch.save(ref.state_dict(), pth)

    out_dir = tmp_path / "imported"
    config = import_torch_checkpoint(str(pth), str(out_dir))
    assert config["scheme"] == "mumidi"
    assert config["model_kwargs"] == {
        "event_dim": 485, "bar_dim": 188, "init_dim": 8,
        "embed_dim": 16, "hidden_dim": 16, "num_layers": 2}

    model, params, _, _ = _restore_like_generate(out_dir)
    rng = np.random.default_rng(7)
    src = rng.integers(0, 485 + 188, size=(1, 2, 5, 7))
    with torch.no_grad():
        want = ref.compression(torch.from_numpy(src).to(torch.long))
    got = np.asarray(model.apply({"params": params}, jnp.asarray(src),
                                 method=model.compression))
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-5, atol=2e-5)


def test_import_rejects_unknown_layout(tmp_path):
    pth = tmp_path / "weird.pth"
    torch.save({"something": 1}, pth)
    with pytest.raises(SystemExit, match="unrecognized checkpoint"):
        import_torch_checkpoint(str(pth), str(tmp_path / "out"))
