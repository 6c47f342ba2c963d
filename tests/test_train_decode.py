"""Trainer / decode-engine / mesh tests (SURVEY.md §4 tests #4-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode import DecodeParams, generate
from musicgeneration_tpu.decode.sampling import SamplingParams, sample_logits
from musicgeneration_tpu.models import MusicTransformer
from musicgeneration_tpu.parallel import (
    make_mesh,
    param_shardings,
    shard_batch,
)
from musicgeneration_tpu.train import noam_schedule, smooth_cross_entropy
from musicgeneration_tpu.train.trainer import (
    TrainerConfig,
    create_train_state,
    make_train_step,
)

VOCAB = 64


@pytest.fixture(scope="module")
def tiny_model():
    return MusicTransformer(vocab_size=VOCAB, num_layers=1, d_model=64,
                            max_seq=32)


def test_noam_schedule_matches_reference_formula():
    # criterion.py:88-96
    sched = noam_schedule(d_model=256, warmup_steps=4000)
    for step in [1, 100, 4000, 20000]:
        want = 256 ** -0.5 * min(step ** -0.5, step * 4000 ** -1.5)
        assert float(sched(step)) == pytest.approx(want, rel=1e-6)


def test_smooth_ce_oracle():
    # hand-computed numpy oracle of criterion.py:43-64
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 5).astype(np.float32)
    targets = np.array([0, 1, 2, 3, 4, 4])
    eps, v, ignore = 0.2, 5, 4
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    onehot = np.eye(v)[targets]
    q = (1 - eps) * onehot + eps / v
    q[targets == ignore] = 0.0
    want = -(q * lp).sum(-1).sum() / (targets != ignore).sum()
    got = smooth_cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                               v, eps, ignore)
    assert float(got) == pytest.approx(float(want), rel=1e-5)


def test_train_step_overfits_tiny_batch(tiny_model):
    model = tiny_model
    cfg = TrainerConfig(vocab_size=VOCAB, d_model=64, warmup_steps=10,
                        pad_id=VOCAB - 1, label_smoothing=0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, VOCAB - 1)
    y = jnp.roll(x, -1, axis=1)
    state, tx = create_train_state(model, cfg, rng, x)
    step = jax.jit(make_train_step(model, tx, cfg))
    first = None
    for _ in range(30):
        state, metrics = step(state, x, y)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)
    assert float(metrics["accuracy"]) > 0.15


def test_grad_accumulation_equivalence(tiny_model):
    """accum_steps=2 over a 2B batch must match accum_steps=1 on the same
    data (mean-of-micro-grads == full-batch grad for mean losses over equal
    micro sizes). Dropout off: micro-batches draw different dropout rngs
    by design, which would break exact equality."""
    model = MusicTransformer(vocab_size=VOCAB, num_layers=1, d_model=64,
                             max_seq=32, dropout_rate=0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, VOCAB - 1)
    y = jnp.roll(x, -1, axis=1)
    outs = {}
    for accum in (1, 2):
        cfg = TrainerConfig(vocab_size=VOCAB, d_model=64, accum_steps=accum,
                            pad_id=None, label_smoothing=0.1)
        state, tx = create_train_state(model, cfg, rng, x)
        step = jax.jit(make_train_step(model, tx, cfg))
        state, m = step(state, x, y)
        outs[accum] = (m, state.params)
    m1, p1 = outs[1]
    m2, p2 = outs[2]
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    assert max(jax.tree.leaves(diffs)) < 1e-4


class TestDecodeEngine:
    @pytest.fixture(scope="class")
    def setup(self):
        model = MusicTransformer(vocab_size=VOCAB, num_layers=1, d_model=64,
                                 max_seq=32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))["params"]
        return model, params

    def test_generate_shapes_and_range(self, setup):
        model, params = setup
        prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, VOCAB)
        dp = DecodeParams(max_len=16, steps=8,
                          sampling=SamplingParams(temperature=1.0))
        out = generate(model, params, prompt, jax.random.PRNGKey(2), dp)
        assert out.shape == (2, 8)
        assert int(out.min()) >= 0 and int(out.max()) < VOCAB

    def test_greedy_matches_full_forward_argmax(self, setup):
        """Greedy cached decode == greedy via repeated full forwards
        (the reference's generation schedule, network.py:52-78)."""
        model, params = setup
        prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 0, VOCAB)
        steps = 6
        dp = DecodeParams(max_len=16, steps=steps,
                          sampling=SamplingParams(greedy=True))
        fast = generate(model, params, prompt, jax.random.PRNGKey(0), dp)

        apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
        seq = np.asarray(prompt)
        slow = []
        for i in range(steps):
            logits = apply(params, jnp.asarray(seq))
            nxt = int(jnp.argmax(logits[0, -1]))
            slow.append(nxt)
            seq = np.concatenate([seq, [[nxt]]], axis=1)
        np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(slow))

    def test_bucketed_prompt_matches_unbucketed(self, setup):
        """A prompt padded to a static bucket with pad_id + dynamic
        prompt_len must generate the SAME tokens as the unpadded prompt
        (the pads are causally masked and their cache rows overwritten),
        and two true lengths in one bucket must share ONE compile
        (VERDICT round-1 #7: no per-prime-length decode recompiles)."""
        model, params = setup
        dp = DecodeParams(max_len=24, steps=8,
                          sampling=SamplingParams(temperature=1.0))
        rng = jax.random.PRNGKey(5)
        for p_true in (3, 6):
            prompt = jax.random.randint(jax.random.PRNGKey(p_true),
                                        (2, p_true), 0, VOCAB - 1)
            plain = generate(model, params, prompt, rng, dp)
            padded = jnp.pad(prompt, ((0, 0), (0, 8 - p_true)),
                             constant_values=model.pad_id)
            bucketed = generate(model, params, padded, rng, dp, None,
                                None, jnp.int32(p_true))
            np.testing.assert_array_equal(np.asarray(bucketed),
                                          np.asarray(plain))
        # one compile for both bucketed lengths: the traced signature is
        # identical (static bucket shape, dynamic prompt_len)
        before = generate._cache_size()
        for p_true in (4, 7):
            prompt = jax.random.randint(jax.random.PRNGKey(p_true),
                                        (2, p_true), 0, VOCAB - 1)
            padded = jnp.pad(prompt, ((0, 0), (0, 8 - p_true)),
                             constant_values=model.pad_id)
            generate(model, params, padded, rng, dp, None, None,
                     jnp.int32(p_true))
        assert generate._cache_size() == before  # already traced above

    def test_bucketed_prompt_rnn_gated_prefill(self):
        """RNN (scan-prefill) path: padded prompt steps must not touch
        the hidden state — bucketed == unbucketed continuations."""
        from musicgeneration_tpu.models import EventMelodyRNN

        model = EventMelodyRNN(event_dim=40, init_dim=8, hidden_dim=32,
                               num_layers=2, dropout_rate=0.0)
        init = jnp.zeros((2, 8))
        events = jnp.zeros((5, 2), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), init, events)["params"]
        dp = DecodeParams(max_len=24, steps=8,
                          sampling=SamplingParams(temperature=1.0))
        rng = jax.random.PRNGKey(5)
        prompt = jax.random.randint(jax.random.PRNGKey(9), (2, 5), 0, 39)
        plain = generate(model, params, prompt, rng, dp)
        padded = jnp.pad(prompt, ((0, 0), (0, 3)))  # pad value gated off
        bucketed = generate(model, params, padded, rng, dp, None, None,
                            jnp.int32(5))
        np.testing.assert_array_equal(np.asarray(bucketed),
                                      np.asarray(plain))

    def test_sampling_transforms(self):
        logits = jnp.asarray([[0.0, 1.0, 2.0, 10.0]])
        # greedy
        tok = sample_logits(jax.random.PRNGKey(0), logits,
                            SamplingParams(greedy=True))
        assert int(tok[0]) == 3
        # top_k=1 == greedy regardless of rng
        for seed in range(5):
            tok = sample_logits(jax.random.PRNGKey(seed), logits,
                                SamplingParams(top_k=1))
            assert int(tok[0]) == 3
        # top_p tiny -> only the head survives
        for seed in range(5):
            tok = sample_logits(jax.random.PRNGKey(seed), logits,
                                SamplingParams(top_p=1e-4))
            assert int(tok[0]) == 3


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(dp=4, tp=2)
        assert mesh.shape == {"data": 4, "seq": 1, "model": 2}
        mesh = make_mesh(tp=2, sp=2)  # dp inferred = 2 on 8 devices
        assert mesh.shape == {"data": 2, "seq": 2, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(dp=3, tp=3)

    @pytest.mark.slow  # dryrun_multichip covers this end to end
    def test_sharded_train_step_runs(self, tiny_model):
        """DP x TP SPMD train step on the 8-virtual-device CPU mesh."""
        model = tiny_model
        mesh = make_mesh(dp=4, tp=2)
        cfg = TrainerConfig(vocab_size=VOCAB, d_model=64, pad_id=VOCAB - 1)
        x = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, VOCAB - 1)
        y = jnp.roll(x, -1, axis=1)
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
        shardings = param_shardings(mesh, state.params)
        state = state.replace(
            params=jax.device_put(state.params, shardings))
        xb, yb = shard_batch(mesh, (x, y))
        step = jax.jit(make_train_step(model, tx, cfg))
        state, metrics = step(state, xb, yb)
        assert np.isfinite(float(metrics["loss"]))
        # params keep their shardings through the update
        flat = jax.tree.leaves(state.params)
        assert all(hasattr(p, "sharding") for p in flat)


def test_fsdp_param_sharding():
    """fsdp=True shards a non-'model' dim of 2-D params over 'data'."""
    from musicgeneration_tpu.parallel.mesh import param_shardings

    mesh = make_mesh(dp=4, tp=2)
    params = {
        "layer": {"Wq": {"kernel": jnp.zeros((128, 128))},
                  "bias": jnp.zeros((128,))},
    }
    sh = param_shardings(mesh, params, fsdp=True)
    spec = sh["layer"]["Wq"]["kernel"].spec
    assert "data" in spec and "model" in spec
    assert sh["layer"]["bias"].spec == jax.sharding.PartitionSpec()
    # odd dims fall back gracefully instead of erroring
    odd = {"w": jnp.zeros((127, 125))}
    sh2 = param_shardings(mesh, odd, fsdp=True)
    assert sh2["w"].spec == jax.sharding.PartitionSpec()


def test_sharded_decode_matches_single_device(tiny_model):
    """Pod-slice sampling (BASELINE.md target): generate() under a
    DP x TP mesh with sharded params + prompt produces exactly the
    single-device result (same rng, same sampling path)."""
    from musicgeneration_tpu.decode import DecodeParams, generate
    from musicgeneration_tpu.decode.sampling import SamplingParams
    from musicgeneration_tpu.parallel.mesh import param_shardings

    model = tiny_model
    prompt = jnp.ones((8, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)["params"]
    dp = DecodeParams(max_len=16, steps=8,
                      sampling=SamplingParams(temperature=1.0))
    rng = jax.random.PRNGKey(3)
    ref = np.asarray(generate(model, params, prompt, rng, dp))

    mesh = make_mesh(dp=4, tp=2)
    sharded_params = jax.device_put(params, param_shardings(mesh, params))
    sharded_prompt = shard_batch(mesh, prompt)
    out = np.asarray(generate(model, sharded_params, sharded_prompt,
                              rng, dp))
    np.testing.assert_array_equal(out, ref)


def test_generate_sliding_long_continuation(tiny_model):
    """Sliding-window generation beyond the cache (the reference's
    threshold_len behavior, network.py:52-54, done in cached chunks)."""
    from musicgeneration_tpu.decode.engine import generate_sliding

    model = tiny_model
    prompt = jnp.ones((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)["params"]
    out = generate_sliding(model, params, prompt, jax.random.PRNGKey(1),
                           steps=40, window=16,
                           sampling=SamplingParams(temperature=1.0))
    assert out.shape == (2, 40)
    assert out.min() >= 0 and out.max() < VOCAB
    # within the first window it matches plain cached generation
    dp = DecodeParams(max_len=32, steps=12,
                      sampling=SamplingParams(greedy=True))
    ref = np.asarray(generate(model, params, prompt,
                              jax.random.PRNGKey(1), dp))
    slid = generate_sliding(model, params, prompt, jax.random.PRNGKey(1),
                            steps=12, window=16,
                            sampling=SamplingParams(greedy=True))
    np.testing.assert_array_equal(slid, ref)


def test_multihost_shard_batch_single_process():
    """On one process, multihost assembly == plain batch sharding."""
    from musicgeneration_tpu.parallel import (
        make_mesh,
        multihost_shard_batch,
        shard_batch,
    )

    mesh = make_mesh(dp=8)
    x = np.arange(32, dtype=np.int32).reshape(8, 4)
    a = multihost_shard_batch(mesh, {"x": x})
    b = shard_batch(mesh, {"x": jnp.asarray(x)})
    np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
    assert a["x"].sharding.spec == b["x"].sharding.spec


@pytest.mark.slow
def test_remat_matches_no_remat():
    """jax.checkpoint layers change memory, not math."""
    x = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, VOCAB - 1)
    m0 = MusicTransformer(vocab_size=VOCAB, num_layers=2, d_model=64,
                          max_seq=32, dropout_rate=0.0)
    m1 = MusicTransformer(vocab_size=VOCAB, num_layers=2, d_model=64,
                          max_seq=32, dropout_rate=0.0, remat=True)
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    l0 = m0.apply({"params": params}, x)
    l1 = m1.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-6)
    # gradients flow through the remat boundary
    y = jnp.roll(x, -1, axis=1)
    cfg = TrainerConfig(vocab_size=VOCAB, d_model=64, pad_id=VOCAB - 1)
    state, tx = create_train_state(m1, cfg, jax.random.PRNGKey(0), x)
    step = jax.jit(make_train_step(m1, tx, cfg))
    state, metrics = step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))


class TestScanLayers:
    """scan_layers=True: the trunk as one lax.scan over a stacked layer
    axis (compile-size lever for big-L models)."""

    def _pair(self):
        from musicgeneration_tpu.models.music_transformer import (
            MusicTransformer,
            stack_layer_params,
        )
        kw = dict(vocab_size=64, num_layers=3, d_model=128, max_seq=64,
                  dropout_rate=0.0, attention_impl="xla")
        m_u = MusicTransformer(**kw)
        m_s = MusicTransformer(scan_layers=True, **kw)
        x = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 60)
        p_u = m_u.init(jax.random.PRNGKey(0), x)["params"]
        p_s = stack_layer_params(dict(p_u), 3)
        return m_u, m_s, p_u, p_s, x

    def test_forward_bit_equal(self):
        m_u, m_s, p_u, p_s, x = self._pair()
        lu = m_u.apply({"params": p_u}, x)
        ls = m_s.apply({"params": p_s}, x)
        np.testing.assert_array_equal(np.asarray(lu), np.asarray(ls))

    def test_param_roundtrip(self):
        from musicgeneration_tpu.models.music_transformer import (
            unstack_scanned_params,
        )
        m_u, m_s, p_u, p_s, x = self._pair()
        back = unstack_scanned_params(dict(p_s), 3)
        lu = m_u.apply({"params": p_u}, x)
        lb = m_u.apply({"params": back}, x)
        np.testing.assert_array_equal(np.asarray(lu), np.asarray(lb))

    def test_train_step_and_remat(self):
        """Grad/loss flow through the scanned trunk (+remat compose)."""
        from musicgeneration_tpu.models.music_transformer import (
            MusicTransformer,
        )
        from musicgeneration_tpu.train.trainer import (
            TrainerConfig,
            create_train_state,
            make_train_step,
        )
        for remat in (False, True):
            m = MusicTransformer(vocab_size=64, num_layers=2,
                                 d_model=128, max_seq=32,
                                 scan_layers=True, remat=remat)
            cfg = TrainerConfig(vocab_size=64, d_model=128, pad_id=63)
            x = jax.random.randint(jax.random.PRNGKey(2), (2, 32), 0, 60)
            y = jnp.roll(x, -1, axis=1)
            state, tx = create_train_state(m, cfg, jax.random.PRNGKey(0),
                                           x)
            step = jax.jit(make_train_step(m, tx, cfg))
            state, metrics = step(state, x, y)
            assert np.isfinite(float(metrics["loss"])), f"remat={remat}"

    @pytest.mark.slow
    def test_generate_cli_unstacks_scanned_checkpoint(self, tmp_path):
        """cli.train model.scan_layers=True -> cli.generate decodes via
        the unrolled layout (unstack_scanned_params)."""
        from .fixtures import simple_piano_midi
        from musicgeneration_tpu.cli.generate import main as generate_main
        from musicgeneration_tpu.cli.tokenize import main as tokenize_main
        from musicgeneration_tpu.cli.train import main as train_main

        midi_dir = tmp_path / "m"
        midi_dir.mkdir()
        for i in range(2):
            simple_piano_midi(str(midi_dir / f"f{i}.mid"), seed=i)
        tok = str(tmp_path / "tok")
        assert tokenize_main([str(midi_dir), tok, "--scheme", "midilike",
                              "--workers", "1"]) == 0
        ckpt = str(tmp_path / "ckpt")
        assert train_main([tok, "model=music_transformer", "steps=2",
                           "batch_size=2", "seq_len=32", "log_every=1",
                           "model.num_layers=2", "model.d_model=64",
                           "model.max_seq=64",
                           "model.scan_layers=True",
                           f"ckpt_dir={ckpt}"]) == 0
        out = str(tmp_path / "o.mid")
        assert generate_main([ckpt, out, "--steps", "8",
                              "--temperature", "0"]) == 0
        assert (tmp_path / "o.mid").exists()


def test_engine_validation_edges():
    """Friendly validation errors on the library entry points (found in
    review): align_cache_len stays 16-aligned even when max_len falls
    in a non-16-multiple max_seq's final partial block; generate_sliding
    rejects windows its inner generate() could never serve; speculative
    decoding rejects targets without a position-indexed cache."""
    import types

    from musicgeneration_tpu.decode.engine import (
        align_cache_len,
        generate_sliding,
    )
    from musicgeneration_tpu.decode.speculative import (
        generate_speculative,
    )

    stub = types.SimpleNamespace(_decode_fused=lambda: True,
                                 max_seq=1000)
    assert align_cache_len(stub, 512) == 512
    assert align_cache_len(stub, 513) == 640        # 128-aligned
    assert align_cache_len(stub, 990) == 992        # 16-fallback
    got = align_cache_len(stub, 1000)               # final partial block
    assert got % 16 == 0 and got >= 1000
    xla = types.SimpleNamespace(_decode_fused=lambda: False,
                                max_seq=1000)
    assert align_cache_len(xla, 1000) == 1000       # XLA path untouched

    slide_stub = types.SimpleNamespace(max_seq=512)
    with pytest.raises(ValueError, match="max_seq//2"):
        generate_sliding(slide_stub, {}, jnp.ones((1, 4), jnp.int32),
                         jax.random.PRNGKey(0), steps=2000, window=512)

    rnn_stub = types.SimpleNamespace()              # no decode_chunk
    with pytest.raises(ValueError, match="chunk-verify"):
        generate_speculative(rnn_stub, {}, jnp.ones((1, 4), jnp.int32),
                             jax.random.PRNGKey(0),
                             DecodeParams(max_len=64, steps=16))
