"""Fused decode-step kernel vs the XLA decode path.

The kernel (ops/pallas_decode.py) runs ALL layers' decode step in one
pallas_call; on CPU it runs in interpreter mode — the same code
compiles and runs on TPU (measured ~50k tok/s vs 24.4k for the XLA
path at the flagship decode config, BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode import DecodeParams, generate
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.models import MusicTransformer

VOCAB = 64


def _pair(num_layers=2, d_model=128, max_seq=64):
    kw = dict(vocab_size=VOCAB, num_layers=num_layers, d_model=d_model,
              max_seq=max_seq)
    m_x = MusicTransformer(decode_impl="xla", **kw)
    m_f = MusicTransformer(decode_impl="fused", **kw)
    params = m_x.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8), jnp.int32))["params"]
    return m_x, m_f, params


def test_decode_step_matches_xla_path():
    """Step-by-step logits equality from a fresh cache — exercises the
    in-kernel projections, live-prefix DMA loop, rel-bias slice, the
    analytic current-token term, LN and FFN."""
    m_x, m_f, params = _pair()
    cache_x = m_x.apply({"params": params}, 2, 40,
                        method=m_x.init_cache)
    cache_f = m_f.apply({"params": params}, 2, 40,
                        method=m_f.init_cache)
    toks = jax.random.randint(jax.random.PRNGKey(1), (10, 2), 0,
                              VOCAB - 1)
    for t in range(10):
        lx, cache_x = m_x.apply({"params": params}, toks[t], cache_x,
                                jnp.int32(t), method=m_x.decode_step)
        lf, cache_f = m_f.apply({"params": params}, toks[t], cache_f,
                                jnp.int32(t), method=m_f.decode_step)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                                   rtol=2e-5, atol=2e-5)


def test_prefill_fused_layout_matches():
    """One-pass prefill fills the fused [L, B, S, d] cache layout; a
    decode step from it matches the XLA-layout path."""
    m_x, m_f, params = _pair()
    x = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, VOCAB - 1)
    lx, cx = m_x.apply({"params": params}, x, 40, method=m_x.prefill)
    lf, cf = m_f.apply({"params": params}, x, 40, method=m_f.prefill)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                               rtol=1e-6, atol=1e-6)
    tok = jnp.asarray([3, 5], jnp.int32)
    l2x, _ = m_x.apply({"params": params}, tok, cx, jnp.int32(6),
                       method=m_x.decode_step)
    l2f, _ = m_f.apply({"params": params}, tok, cf, jnp.int32(6),
                       method=m_f.decode_step)
    np.testing.assert_allclose(np.asarray(l2f), np.asarray(l2x),
                               rtol=2e-5, atol=2e-5)


def test_generate_end_to_end_same_tokens():
    """Greedy generation through the engine produces IDENTICAL tokens
    under both decode impls (prefill + scan + bucketing all included)."""
    m_x, m_f, params = _pair()
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 5), 0,
                                VOCAB - 1)
    dp = DecodeParams(max_len=32, steps=16,
                      sampling=SamplingParams(greedy=True))
    rng = jax.random.PRNGKey(4)
    out_x = np.asarray(generate(m_x, params, prompt, rng, dp))
    out_f = np.asarray(generate(m_f, params, prompt, rng, dp))
    np.testing.assert_array_equal(out_f, out_x)
    # bucketed prompt path under the fused impl
    padded = jnp.pad(prompt, ((0, 0), (0, 3)),
                     constant_values=m_f.pad_id)
    out_b = np.asarray(generate(m_f, params, padded, rng, dp, None,
                                None, jnp.int32(5)))
    np.testing.assert_array_equal(out_b, out_x)


def test_fused_block_k_odd_cache_length():
    """Cache lengths that no block size divides degrade to one block."""
    m_x, m_f, params = _pair(max_seq=64)
    cache_x = m_x.apply({"params": params}, 1, 24,
                        method=m_x.init_cache)
    cache_f = m_f.apply({"params": params}, 1, 24,
                        method=m_f.init_cache)
    toks = jax.random.randint(jax.random.PRNGKey(5), (6, 1), 0,
                              VOCAB - 1)
    for t in range(6):
        lx, cache_x = m_x.apply({"params": params}, toks[t], cache_x,
                                jnp.int32(t), method=m_x.decode_step)
        lf, cache_f = m_f.apply({"params": params}, toks[t], cache_f,
                                jnp.int32(t), method=m_f.decode_step)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                                   rtol=2e-5, atol=2e-5)


def test_deep_prefix_multibuffer_matches_xla_path():
    """A live prefix spanning several KV blocks exercises the k-deep
    (depth > 2) stream-buffer rotation: cache 512 rows, block_k 128,
    decode steps at t in [380, 390) -> n_live = 3-4 blocks in flight."""
    import os

    m_x, m_f, params = _pair(max_seq=512)
    assert os.environ.get("MG_DECODE_DEPTH") is None
    b = 2
    cache_x = m_x.apply({"params": params}, b, 512,
                        method=m_x.init_cache)
    cache_f = m_f.apply({"params": params}, b, 512,
                        method=m_f.init_cache)
    # fill the prefix through a long prefill so the caches agree
    x = jax.random.randint(jax.random.PRNGKey(11), (b, 380), 0,
                           VOCAB - 1)
    _, cache_x = m_x.apply({"params": params}, x, 512,
                           method=m_x.prefill)
    _, cache_f = m_f.apply({"params": params}, x, 512,
                           method=m_f.prefill)
    toks = jax.random.randint(jax.random.PRNGKey(12), (6, b), 0,
                              VOCAB - 1)
    for i in range(6):
        t = 380 + i
        lx, cache_x = m_x.apply({"params": params}, toks[i], cache_x,
                                jnp.int32(t), method=m_x.decode_step)
        lf, cache_f = m_f.apply({"params": params}, toks[i], cache_f,
                                jnp.int32(t), method=m_f.decode_step)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                                   rtol=2e-5, atol=2e-5)


def test_decode_depth_env_override():
    """MG_DECODE_DEPTH pins the stream depth (sweep/tuning hook);
    depth 3 must produce the same logits."""
    import os

    m_x, m_f, params = _pair(max_seq=512)
    b = 1
    x = jax.random.randint(jax.random.PRNGKey(13), (b, 300), 0,
                           VOCAB - 1)
    _, cache_f = m_f.apply({"params": params}, x, 512,
                           method=m_f.prefill)
    lx, _ = m_x.apply(
        {"params": params}, jnp.asarray([7], jnp.int32),
        jax.tree_util.tree_map(
            lambda a: a,
            m_x.apply({"params": params}, x, 512,
                      method=m_x.prefill)[1]),
        jnp.int32(300), method=m_x.decode_step)
    os.environ["MG_DECODE_DEPTH"] = "3"
    try:
        lf, _ = m_f.apply({"params": params}, jnp.asarray([7], jnp.int32),
                          cache_f, jnp.int32(300),
                          method=m_f.decode_step)
    finally:
        del os.environ["MG_DECODE_DEPTH"]
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                               rtol=2e-5, atol=2e-5)


def test_cp_decode_step_matches_xla_path():
    """CPTransformer under the same fused whole-stack kernel: per-field
    logits equality vs the XLA layer.decode path from a fresh cache."""
    from musicgeneration_tpu.models import CPTransformer

    kw = dict(num_layers=2, d_model=128, max_seq=32)
    m_x = CPTransformer(decode_impl="xla", **kw)
    m_f = CPTransformer(decode_impl="fused", **kw)
    b = 2
    rows0 = jnp.zeros((b, 4, 8), jnp.int32)
    params = m_x.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, rows0)["params"]
    fdims = list(m_x.field_dims)
    cache_x = m_x.apply({"params": params}, b, 24, method=m_x.init_cache)
    cache_f = m_f.apply({"params": params}, b, 24, method=m_f.init_cache)
    rng = np.random.RandomState(0)
    for t in range(6):
        row = jnp.asarray(
            np.stack([rng.randint(0, fd, b) for fd in fdims], axis=1),
            jnp.int32)
        lx, cache_x = m_x.apply({"params": params}, row, cache_x,
                                jnp.int32(t), method=m_x.decode_step)
        lf, cache_f = m_f.apply({"params": params}, row, cache_f,
                                jnp.int32(t), method=m_f.decode_step)
        for i, (a, c) in enumerate(zip(lx, lf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=2e-4,
                                       err_msg=f"t={t} head={i}")


def test_decode_loop_greedy_matches_scan_path():
    """The whole-generation megakernel (ops/pallas_decode_loop.py) in
    greedy mode must emit token-identical sequences to the XLA scan
    path — this transitively validates the in-kernel sampling, one-hot
    embedding, positional row, layer steps and the in-kernel HBM cache
    row writes (later tokens attend to rows written by earlier ones)."""
    m_x, m_f, params = _pair()
    b, p, steps = 2, 6, 12
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, p), 0,
                                VOCAB - 1)
    dp = DecodeParams(max_len=32, steps=steps,
                      sampling=SamplingParams(greedy=True))
    toks_scan = np.asarray(generate(m_x, params, prompt,
                                    jax.random.PRNGKey(2), dp))
    # decode_impl="fused" + use_loop_kernel opts into the megakernel
    # branch (interpret mode on CPU)
    dp_loop = DecodeParams(max_len=32, steps=steps,
                           sampling=SamplingParams(greedy=True),
                           use_loop_kernel=True)
    toks_loop = np.asarray(generate(m_f, params, prompt,
                                    jax.random.PRNGKey(2), dp_loop))
    np.testing.assert_array_equal(toks_scan, toks_loop)


def test_decode_loop_bulk_variants_match():
    """The per-launch BULK prefix residency (whole caches copied into
    VMEM once per chunk) must emit token-identical greedy sequences to
    the per-step streaming variant of the SAME megakernel. The switch
    rides DecodeParams (part of generate()'s static jit key) — an env
    flip alone would silently hit the jit cache and compare the
    streaming variant against itself."""
    m_x, m_f, params = _pair()
    b, p, steps = 2, 6, 12
    prompt = jax.random.randint(jax.random.PRNGKey(3), (b, p), 0,
                                VOCAB - 1)
    toks = {}
    for flag in (False, True):
        dp = DecodeParams(max_len=32, steps=steps,
                          sampling=SamplingParams(greedy=True),
                          use_loop_kernel=True, loop_bulk=flag)
        toks[flag] = np.asarray(generate(m_f, params, prompt,
                                         jax.random.PRNGKey(2), dp))
    assert toks[False].shape == (b, steps)
    np.testing.assert_array_equal(toks[False], toks[True])


def test_decode_loop_sampling_falls_back_off_tpu():
    """Off-TPU the on-core PRNG can't run (no interpret lowering), so
    temperature sampling and top-k must fall back to the scan path and
    still produce valid sequences through the fused-impl model."""
    _, m_f, params = _pair()
    b, p, steps = 2, 6, 16
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, p), 0,
                                VOCAB - 1)
    for sp in (SamplingParams(temperature=1.0),
               SamplingParams(temperature=1.0, top_k=4)):
        dp = DecodeParams(max_len=32, steps=steps, sampling=sp,
                          use_loop_kernel=True)
        t1 = np.asarray(generate(m_f, params, prompt,
                                 jax.random.PRNGKey(3), dp))
        assert ((t1 >= 0) & (t1 < VOCAB)).all()


def test_decode_loop_multi_launch_matches():
    """steps > chunk: several kernel launches with the chunk rows
    reinserted into the HBM cache between launches — greedy tokens must
    still match the scan path exactly."""
    m_x, m_f, params = _pair()
    b, p, steps = 2, 6, 12
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, p), 0,
                                VOCAB - 1)
    dp = DecodeParams(max_len=32, steps=steps,
                      sampling=SamplingParams(greedy=True))
    toks_scan = np.asarray(generate(m_x, params, prompt,
                                    jax.random.PRNGKey(2), dp))

    @jax.jit
    def run_loop(params, prompt):
        last, cache = m_f.apply({"params": params}, prompt, 32,
                                method=m_f.prefill)
        toks, _ = m_f.apply({"params": params}, last, jnp.int32(p),
                            jax.random.PRNGKey(2), cache, steps, 1.0,
                            True, 4, method=m_f.decode_loop)
        return toks

    np.testing.assert_array_equal(toks_scan,
                                  np.asarray(run_loop(params, prompt)))


def test_grid_kernel_matches_resident():
    """The layer-GRID variant (per-layer weight blocks for d_model>=512
    where resident weights overflow VMEM) must match the resident
    kernel bit-for-bit on the same inputs."""
    from musicgeneration_tpu.models.music_transformer import (
        _stacked_decode_weights,
    )
    from musicgeneration_tpu.ops.pallas_decode import fused_decode_step

    m = MusicTransformer(decode_impl="fused", vocab_size=VOCAB,
                         num_layers=2, d_model=128, max_seq=64)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    bound = m.bind({"params": params})
    w_all, e_all = _stacked_decode_weights(bound.layers, m.dtype)
    cache = bound.init_cache(2, 40)
    k_all, v_all = cache["k"], cache["v"]
    rng = np.random.RandomState(0)
    for t in range(6):
        x = jnp.asarray(rng.randn(2, 128) * 0.3, jnp.float32)
        o1, k1, v1 = fused_decode_step(x, jnp.int32(t), e_all, w_all,
                                       k_all, v_all, m.num_heads,
                                       interpret=True, grid=False)
        o2, k2, v2 = fused_decode_step(x, jnp.int32(t), e_all, w_all,
                                       k_all, v_all, m.num_heads,
                                       interpret=True, grid=True)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2),
                                      err_msg=f"t={t}")
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        k_all, v_all = k1, v1


def test_bulk_kernel_matches_grid():
    """The BULK whole-cache variant (one contiguous [B, S, d] DMA per
    cache per layer, auto-picked at batch<=4 — the single-stream
    latency winner) must match the layer-grid kernel bit-for-bit,
    including t=0 (no copies issued) and deep prefixes."""
    from musicgeneration_tpu.models.music_transformer import (
        _stacked_decode_weights,
    )
    from musicgeneration_tpu.ops.pallas_decode import fused_decode_step

    m = MusicTransformer(decode_impl="fused", vocab_size=VOCAB,
                         num_layers=2, d_model=128, max_seq=64)
    params = m.init(jax.random.PRNGKey(2),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    bound = m.bind({"params": params})
    w_all, e_all = _stacked_decode_weights(bound.layers, m.dtype)
    cache = bound.init_cache(2, 48)
    k_all, v_all = cache["k"], cache["v"]
    rng = np.random.RandomState(2)
    for t in list(range(3)) + [17, 33, 47]:
        x = jnp.asarray(rng.randn(2, 128) * 0.3, jnp.float32)
        o1, k1, v1 = fused_decode_step(x, jnp.int32(t), e_all, w_all,
                                       k_all, v_all, m.num_heads,
                                       block_k=16,
                                       interpret=True, grid=True)
        o2, k2, v2 = fused_decode_step(x, jnp.int32(t), e_all, w_all,
                                       k_all, v_all, m.num_heads,
                                       block_k=16,
                                       interpret=True, grid="bulk")
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2),
                                      err_msg=f"t={t}")
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        k_all, v_all = k1, v1


def test_select_decode_config_bulk():
    """Auto-selection picks bulk only where measured to win: tiny
    batches whose whole cache fits VMEM next to the layer double
    buffer; B8 stays on the resident kernel and big-cache configs fall
    through to streaming modes."""
    from musicgeneration_tpu.ops.pallas_decode import select_decode_config

    w = _fake_weights(6, 256)
    e = (6, 2048, 64)
    assert select_decode_config(w, e, 1, 1024, 2)[0] == "bulk"
    assert select_decode_config(w, e, 4, 1024, 2)[0] == "bulk"
    # B8: read amplification loses (155 vs 160 us/step measured)
    assert select_decode_config(w, e, 8, 1024, 2)[0] is False
    # B4 at a 2048-row cache copies the same bytes as the LOSING B8
    # S1024 case -> byte cap keeps it on the resident kernel
    assert select_decode_config(w, e, 4, 2048, 2)[0] is False
    # whole cache too big at d512 B4 S2048 -> grid fallback
    got = select_decode_config(_fake_weights(6, 512), e, 4, 2048, 2)
    assert got[0] is True


def test_stream_kernel_matches_resident():
    """The weight-STREAMING grid variant (d_model>=1024: matrices stay
    in HBM, matmuls pull column tiles through a shared double buffer)
    must match the resident kernel to float-reassociation tolerance:
    each output column is the same full-depth dot product fetched
    tile-by-tile, but the narrower dot shapes accumulate in a different
    order (~1e-6 f32; the bf16 test below is exact — the quantization
    points absorb it)."""
    from musicgeneration_tpu.models.music_transformer import (
        _stacked_decode_weights,
    )
    from musicgeneration_tpu.ops.pallas_decode import fused_decode_step

    m = MusicTransformer(decode_impl="fused", vocab_size=VOCAB,
                         num_layers=2, d_model=256, max_seq=64)
    params = m.init(jax.random.PRNGKey(1),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    bound = m.bind({"params": params})
    w_all, e_all = _stacked_decode_weights(bound.layers, m.dtype)
    cache = bound.init_cache(2, 40)
    k_all, v_all = cache["k"], cache["v"]
    rng = np.random.RandomState(1)
    for t in range(6):
        x = jnp.asarray(rng.randn(2, 256) * 0.3, jnp.float32)
        o1, k1, v1 = fused_decode_step(x, jnp.int32(t), e_all, w_all,
                                       k_all, v_all, m.num_heads,
                                       interpret=True, grid=False)
        o2, k2, v2 = fused_decode_step(x, jnp.int32(t), e_all, w_all,
                                       k_all, v_all, m.num_heads,
                                       interpret=True, grid="stream")
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=2e-5, atol=2e-5)
        k_all, v_all = k1, v1


def test_int8_stream_matches_dequant_reference():
    """Weight-only int8 streaming (quantize_stream_weights + scales=)
    must equal the stream kernel run on the DEQUANTIZED f32 weights to
    float tolerance — the only difference is where the scale multiply
    happens (per tile in-kernel vs pre-multiplied)."""
    from musicgeneration_tpu.ops.pallas_decode import (
        fused_decode_step,
        quantize_stream_weights,
    )

    rng = np.random.RandomState(0)
    l_, b, s, d, h = 2, 2, 64, 256, 4
    shapes = {"wq": (l_, d, d), "wk": (l_, d, d), "wv": (l_, d, d),
              "wfc": (l_, d, d), "ffn1_w": (l_, d, d // 2),
              "ffn2_w": (l_, d // 2, d), "ffn1_b": (l_, d // 2)}
    from musicgeneration_tpu.ops.pallas_decode import WEIGHT_KEYS
    weights = {k: jnp.asarray(rng.randn(*shapes.get(k, (l_, d))) * 0.1,
                              jnp.float32) for k in WEIGHT_KEYS}
    qw, sc = quantize_stream_weights(weights)
    deq = dict(weights)
    for k in sc:
        deq[k] = qw[k].astype(jnp.float32) * np.asarray(
            sc[k])[:, None, :]
    e_all = jnp.asarray(rng.randn(l_, 128, d // h) * 0.1, jnp.float32)
    kc = jnp.asarray(rng.randn(l_, b, s, d) * 0.1, jnp.float32)
    vc = jnp.asarray(rng.randn(l_, b, s, d) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(b, d) * 0.3, jnp.float32)
    for t in (0, 5, 33):
        o_q, kq, vq = fused_decode_step(x, jnp.int32(t), e_all, qw, kc,
                                        vc, num_heads=h, block_k=16,
                                        interpret=True, scales=sc)
        o_r, kr, vr = fused_decode_step(x, jnp.int32(t), e_all, deq, kc,
                                        vc, num_heads=h, block_k=16,
                                        interpret=True, grid="stream")
        np.testing.assert_allclose(np.asarray(o_q), np.asarray(o_r),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"t={t}")
        # quantization quality vs the unquantized weights: weight-only
        # int8 stays within ~1e-2 relative at this scale
        o_f, _, _ = fused_decode_step(x, jnp.int32(t), e_all, weights,
                                      kc, vc, num_heads=h, block_k=16,
                                      interpret=True, grid="stream")
        rel = (np.abs(np.asarray(o_q) - np.asarray(o_f)).max()
               / (np.abs(np.asarray(o_f)).max() + 1e-9))
        assert rel < 3e-2, rel
    # int8 weights without scales must fail clearly
    with pytest.raises(ValueError, match="scales"):
        fused_decode_step(x, jnp.int32(1), e_all, qw, kc, vc,
                          num_heads=h, block_k=16, interpret=True)


def test_model_decode_quant_int8():
    """decode_quant='int8' generates through the quantized streaming
    kernel with logits close to the unquantized model (model-level
    wiring: MusicTransformer.decode_step -> fused_layer_stack_step)."""
    kw = dict(vocab_size=VOCAB, num_layers=2, d_model=256, max_seq=64,
              decode_impl="fused")
    m_f = MusicTransformer(**kw)
    m_q = MusicTransformer(**kw, decode_quant="int8")
    params = m_f.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8), jnp.int32))["params"]
    cache = m_f.apply({"params": params}, 2, 48,
                      method=m_f.init_cache)
    tok = jnp.array([3, 7], jnp.int32)
    lg_f, _ = m_f.apply({"params": params}, tok, cache, jnp.int32(4),
                        method=m_f.decode_step)
    lg_q, _ = m_q.apply({"params": params}, tok, cache, jnp.int32(4),
                        method=m_q.decode_step)
    rel = (np.abs(np.asarray(lg_q) - np.asarray(lg_f)).max()
           / (np.abs(np.asarray(lg_f)).max() + 1e-9))
    assert rel < 3e-2, rel


def test_stream_kernel_bf16():
    """Streamed weights in bf16 (the serving dtype) against the
    resident kernel — exact equality, same quantization points."""
    from musicgeneration_tpu.models.music_transformer import (
        _stacked_decode_weights,
    )
    from musicgeneration_tpu.ops.pallas_decode import fused_decode_step

    m = MusicTransformer(decode_impl="fused", vocab_size=VOCAB,
                         num_layers=2, d_model=256, max_seq=64,
                         dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(2),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    bound = m.bind({"params": params})
    w_all, e_all = _stacked_decode_weights(bound.layers, m.dtype)
    cache = bound.init_cache(2, 40)
    k_all, v_all = cache["k"], cache["v"]
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 256) * 0.3, jnp.bfloat16)
    o1, k1, v1 = fused_decode_step(x, jnp.int32(3), e_all, w_all,
                                   k_all, v_all, m.num_heads,
                                   interpret=True, grid=False)
    o2, k2, v2 = fused_decode_step(x, jnp.int32(3), e_all, w_all,
                                   k_all, v_all, m.num_heads,
                                   interpret=True, grid="stream")
    np.testing.assert_array_equal(np.asarray(o1, np.float32),
                                  np.asarray(o2, np.float32))
    np.testing.assert_array_equal(np.asarray(k1, np.float32),
                                  np.asarray(k2, np.float32))


def _xla_mask_sets(scaled, top_k, top_p):
    """The sort-based masking from decode/sampling.py sample_logits,
    returning the kept-set mask."""
    logits = scaled
    if top_k and top_k > 0:
        k = min(top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return np.asarray(logits) > -np.inf


def test_sample_mask_matches_xla_sampler_sets():
    """The in-kernel sort-free top-k/top-p masking (integer bisection on
    sortable keys, ops/pallas_decode_loop.py sample_mask) must keep
    EXACTLY the same token sets as the XLA sampler's sort-based masking
    — including ties at the boundary."""
    from musicgeneration_tpu.ops.pallas_decode_loop import sample_mask

    rng = np.random.RandomState(7)
    for trial in range(30):
        b, v = 4, 309
        logits = rng.randn(b, v).astype(np.float32) * 3
        if trial % 3 == 0:  # force boundary ties
            logits[:, 50:60] = logits[:, 49:50]
        top_k = [0, 1, 5, 40, 309][trial % 5]
        top_p = [1.0, 0.9, 0.5, 0.99, 0.01][(trial // 5) % 5]
        if top_k == 0 and top_p == 1.0:
            continue
        scaled = jnp.asarray(logits)
        ref_mask = _xla_mask_sets(scaled, top_k, top_p)
        got = np.asarray(sample_mask(scaled, top_k, top_p))
        got_mask = got > -1e29
        np.testing.assert_array_equal(
            got_mask, ref_mask,
            err_msg=f"trial {trial} k={top_k} p={top_p}")
        # kept entries keep their exact scaled values
        np.testing.assert_array_equal(got[got_mask],
                                      logits[got_mask])


def test_sample_mask_padded_vocab():
    """-1e30 pad columns (the kernel pads V to a lane multiple) must
    never enter the kept set or distort the thresholds."""
    from musicgeneration_tpu.ops.pallas_decode_loop import sample_mask

    rng = np.random.RandomState(8)
    logits = rng.randn(2, 309).astype(np.float32)
    padded = np.pad(logits, ((0, 0), (0, 384 - 309)),
                    constant_values=-1e30)
    for top_k, top_p in [(10, 1.0), (0, 0.8), (7, 0.9)]:
        ref_mask = _xla_mask_sets(jnp.asarray(logits), top_k, top_p)
        got = np.asarray(sample_mask(jnp.asarray(padded), top_k, top_p))
        got_mask = got > -1e29
        np.testing.assert_array_equal(got_mask[:, :309], ref_mask)
        assert not got_mask[:, 309:].any()


def test_sample_mask_large_vocab():
    """Set equality with the XLA sampler at a production vocab size
    (4096 — the documented boundary tolerance of the unsorted top-p
    mass only bites at adversarial p exactly equal to a partial sum;
    random logits never land there)."""
    from musicgeneration_tpu.ops.pallas_decode_loop import sample_mask

    rng = np.random.RandomState(11)
    for trial in range(8):
        b, v = 2, 4096
        logits = rng.randn(b, v).astype(np.float32) * 4
        if trial % 2 == 0:  # boundary ties at scale
            logits[:, 1000:1032] = logits[:, 999:1000]
        top_k = [0, 50, 1, 4096][trial % 4]
        top_p = [0.9, 1.0, 0.5, 0.995][(trial // 2) % 4]
        if top_k == 0 and top_p == 1.0:
            continue
        scaled = jnp.asarray(logits)
        ref_mask = _xla_mask_sets(scaled, top_k, top_p)
        got = np.asarray(sample_mask(scaled, top_k, top_p))
        np.testing.assert_array_equal(
            got > -1e29, ref_mask,
            err_msg=f"trial {trial} k={top_k} p={top_p}")


def test_fused_decode_no_mode_fits_raises():
    """An odd d_model whose grid double-buffer also overflows must fail
    with a descriptive ValueError, not an opaque Mosaic compile error
    (ADVICE r3)."""
    from musicgeneration_tpu.ops.pallas_decode import fused_decode_step

    # d=1152 (not divisible by 256): resident and grid both overflow
    # at max_seq 8192, stream is ineligible
    l_, b, d, s = 8, 8, 1152, 8192
    dh = 64
    mats = {"wq": (l_, d, d), "wk": (l_, d, d), "wv": (l_, d, d),
            "wfc": (l_, d, d), "ffn1_w": (l_, d, d // 2),
            "ffn2_w": (l_, d // 2, d), "ffn1_b": (l_, d // 2)}
    from musicgeneration_tpu.ops.pallas_decode import WEIGHT_KEYS
    weights = {k: jnp.zeros(mats.get(k, (l_, d)), jnp.bfloat16)
               for k in WEIGHT_KEYS}
    e_all = jnp.zeros((l_, s, dh), jnp.float32)
    kc = jnp.zeros((l_, b, s, d), jnp.bfloat16)
    with pytest.raises(ValueError, match="no kernel mode fits"):
        fused_decode_step(jnp.zeros((b, d), jnp.bfloat16), 4, e_all,
                          weights, kc, kc, num_heads=d // dh,
                          interpret=True)


def test_loop_kernel_gate_counts_all_residents():
    """The engine's megakernel gate must use the loop kernel's own
    footprint (embed/pos/head/chunk terms included — ADVICE r3): the
    flagship config passes, a big-batch or long-cache config falls
    back to the per-step kernel."""
    from musicgeneration_tpu.ops.pallas_decode_loop import (
        decode_loop_vmem_bytes,
    )

    mb = 1024 * 1024
    # flagship: 6L d256 V309 S1024 B8 — the measured-at-parity config
    assert decode_loop_vmem_bytes(6, 256, 309, 1024, 64, batch=8) \
        < 14 * mb
    # B64: the chunk K/V outputs + stream buffers alone blow the budget
    assert decode_loop_vmem_bytes(6, 256, 309, 1024, 64, batch=64) \
        >= 14 * mb
    # the loop estimate strictly dominates the step estimate (it counts
    # strictly more residents)
    from musicgeneration_tpu.ops.pallas_decode import decode_vmem_bytes
    assert (decode_loop_vmem_bytes(6, 256, 309, 2048, 64)
            > decode_vmem_bytes(6, 256, 309, 2048, 64))


def _fake_weights(num_layers, d, dtype=jnp.bfloat16):
    import numpy as np

    from musicgeneration_tpu.ops.pallas_decode import WEIGHT_KEYS
    l_ = num_layers
    shapes = {"wq": (l_, d, d), "wk": (l_, d, d), "wv": (l_, d, d),
              "wfc": (l_, d, d), "ffn1_w": (l_, d, d // 2),
              "ffn2_w": (l_, d // 2, d)}
    # numpy zeros: the selector only reads .size/.dtype.itemsize
    return {k: np.zeros(shapes.get(k, (l_, d)), jnp.dtype(dtype))
            for k in WEIGHT_KEYS}


def test_select_decode_config_serving_shapes():
    """Joint (mode, block_k, depth) auto-selection at the serving sweep
    shapes, locked to the round-4 mode_probe measurements on v5e: the
    mode must be judged at the post-shrink block_k (resident bk16 beats
    stream at d256 B128), and the shrink floor must reach 16 (d1024 B64
    crashes the compile helper at bk32, runs at bk16)."""
    from musicgeneration_tpu.ops.pallas_decode import select_decode_config

    expect = {
        # (d, batch): (mode, block_k) at a 2048-row bf16 cache
        (256, 8): (False, 128),     # flagship headline — unchanged
        (256, 32): (False, 64),
        (256, 64): (False, 32),
        (256, 128): (False, 16),    # 124.6k tok/s > stream's 117.9k
        (512, 8): (True, 128),
        (512, 32): (True, 32),      # round-3 gate streamed (crashed)
        (512, 64): (True, 16),
        (512, 128): ("stream", 16),
        (1024, 8): ("stream", 128),
        (1024, 32): ("stream", 32),
        (1024, 64): ("stream", 16), # bk32 overflows scoped VMEM
    }
    for (d, b), (mode, bk) in expect.items():
        w = _fake_weights(6, d)
        got = select_decode_config(w, (6, 2048, 64), b, 2048, 2)
        assert got[:2] == (mode, bk), ((d, b), got, (mode, bk))
        assert 2 <= got[2] <= 4


def test_select_decode_config_pins():
    """Explicit grid= keeps the mode but still shrinks block_k into
    budget; explicit depth>=2 is honored verbatim."""
    from musicgeneration_tpu.ops.pallas_decode import select_decode_config

    w = _fake_weights(6, 512)
    # pin stream at d512 B32 (auto would pick grid): block still shrinks
    mode, bk, depth = select_decode_config(
        w, (6, 2048, 64), 32, 2048, 2, grid="stream")
    assert mode == "stream" and bk == 64
    _, _, depth = select_decode_config(
        w, (6, 2048, 64), 8, 2048, 2, depth=2)
    assert depth == 2
    # odd cache length degrades to a single block
    mode, bk, _ = select_decode_config(_fake_weights(6, 256),
                                       (6, 2048, 64), 8, 96, 2)
    assert bk == 96
    # a pinned mode that never fits the budget falls back to the
    # SMALLEST block (the conservative budget is often beatable — d512
    # B128 grid bk16 measured working), never the hopeless request
    _, bk, _ = select_decode_config(w, (6, 2048, 64), 128, 2048, 2,
                                    grid=True)
    assert bk == 16


def test_decode_kernel_mode_gates():
    """The resident/grid/stream auto selection picks the expected mode
    per config (the ADVICE r2 medium finding: gate and kernel must
    agree on the footprint estimate)."""
    from musicgeneration_tpu.ops.pallas_decode import (
        decode_grid_vmem_bytes,
        decode_stream_vmem_bytes,
        decode_vmem_bytes,
    )

    mb = 1024 * 1024
    # flagship d256/max_seq 2048: resident fits
    assert decode_vmem_bytes(6, 256, 309, 2048, 64) < 10 * mb
    # d512: resident overflows, grid fits
    assert decode_vmem_bytes(6, 512, 309, 2048, 64) >= 10 * mb
    assert decode_grid_vmem_bytes(512, 2048, 64) < 13 * mb
    # d1024: even grid overflows, stream fits
    assert decode_grid_vmem_bytes(1024, 2048, 64) >= 13 * mb
    assert decode_stream_vmem_bytes(1024, 2048, 64) < 14 * mb
    # the ADVICE case: small d_model, huge max_seq — E table overflows
    # the resident estimate but the per-layer variants stay viable
    assert decode_vmem_bytes(6, 256, 309, 8192, 64) >= 10 * mb
    assert decode_grid_vmem_bytes(256, 8192, 64) < 13 * mb


@pytest.mark.parametrize("impl", ["xla", "fused"])
def test_ragged_decode_matches_shifted_reference(impl):
    """RAGGED (continuous-batching) decode: with per-row ``start``
    offsets, row b stepping through cache rows [start_b, t] must be
    BIT-IDENTICAL to the same batch running non-ragged from t=0 with
    row b's stream shifted by start_b — the relative bias depends only
    on the distance t-s, the positional row is gathered per row, and
    rows below start_b are exactly masked (garbage tokens fed to
    not-yet-started rows change nothing). Exercises _layer_step's
    start_col mask (ops/pallas_decode.py) and the XLA decode mask."""
    m = MusicTransformer(decode_impl=impl, vocab_size=VOCAB,
                         num_layers=2, d_model=128, max_seq=64)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    b, cache_len, t_end = 3, 48, 20
    starts = np.array([0, 5, 11], np.int32)
    toks = np.asarray(jax.random.randint(
        jax.random.PRNGKey(1), (t_end, b), 0, VOCAB - 1))
    cache = m.apply({"params": params}, b, cache_len,
                    method=m.init_cache)
    ragged = []
    for t in range(t_end):
        l, cache = m.apply({"params": params}, jnp.asarray(toks[t]),
                           cache, jnp.int32(t), jnp.asarray(starts),
                           method=m.decode_step)
        ragged.append(np.asarray(l))
    ragged = np.stack(ragged)
    # reference: same batch SHAPE, non-ragged — row b fed its shifted
    # stream toks[start_b + j, b] at step j
    n_ref = t_end - int(starts.max())
    ref_toks = np.stack([toks[starts[r]:starts[r] + n_ref, r]
                         for r in range(b)], axis=1)
    cache1 = m.apply({"params": params}, b, cache_len,
                     method=m.init_cache)
    for j in range(n_ref):
        l1, cache1 = m.apply({"params": params},
                             jnp.asarray(ref_toks[j]), cache1,
                             jnp.int32(j), method=m.decode_step)
        for r in range(b):
            np.testing.assert_allclose(
                np.asarray(l1)[r], ragged[starts[r] + j, r],
                rtol=1e-6, atol=1e-6)


def test_ragged_start_all_kernel_modes_agree():
    """The ragged start_col mask rides every kernel variant (resident /
    grid / bulk / stream): identical outputs across modes under a mixed
    start vector, and an all-zero start equals the start=None program
    (the mask is the only difference). Semantic correctness of the
    resident mode is locked vs the XLA model path in
    test_ragged_decode_matches_shifted_reference."""
    from musicgeneration_tpu.models.music_transformer import (
        _stacked_decode_weights,
    )
    from musicgeneration_tpu.ops.pallas_decode import fused_decode_step

    m = MusicTransformer(decode_impl="fused", vocab_size=VOCAB,
                         num_layers=2, d_model=256, max_seq=64)
    params = m.init(jax.random.PRNGKey(4),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    bound = m.bind({"params": params})
    w_all, e_all = _stacked_decode_weights(bound.layers, m.dtype)
    cache = bound.init_cache(3, 48)
    k_all, v_all = cache["k"], cache["v"]
    start = jnp.asarray([4, 7, 19], jnp.int32)
    rng = np.random.RandomState(4)
    modes = (False, True, "bulk", "stream")
    for t in (20, 33, 47):
        x = jnp.asarray(rng.randn(3, 256) * 0.3, jnp.float32)
        outs = [fused_decode_step(x, jnp.int32(t), e_all, w_all,
                                  k_all, v_all, m.num_heads, block_k=16,
                                  interpret=True, grid=g, start=start)
                for g in modes]
        for g, (o, k, v) in zip(modes[1:], outs[1:]):
            if g == "stream":
                # column-tiled matmuls reorder the accumulation:
                # tight allclose instead of bitwise
                np.testing.assert_allclose(
                    np.asarray(outs[0][0]), np.asarray(o),
                    rtol=2e-4, atol=2e-5, err_msg=f"mode={g} t={t}")
                np.testing.assert_allclose(np.asarray(outs[0][1]),
                                           np.asarray(k),
                                           rtol=2e-4, atol=2e-5)
            else:
                np.testing.assert_array_equal(
                    np.asarray(outs[0][0]), np.asarray(o),
                    err_msg=f"mode={g} t={t}")
                np.testing.assert_array_equal(np.asarray(outs[0][1]),
                                              np.asarray(k))
        # start_min (the live-window floor) is a pure perf hint: any
        # value in [0, min(start)] — block-aligned or not — leaves
        # every mode's output unchanged (skipped blocks are fully
        # masked; the rescale exp(m_old - m_new) zeroes their
        # contribution exactly)
        for g in modes:
            for sm in (0, 3, int(start.min())):
                o_sm, k_sm, _ = fused_decode_step(
                    x, jnp.int32(t), e_all, w_all, k_all, v_all,
                    m.num_heads, block_k=16, interpret=True, grid=g,
                    start=start, start_min=jnp.int32(sm))
                ref_o, ref_k = outs[modes.index(g)][:2]
                np.testing.assert_array_equal(np.asarray(ref_o),
                                              np.asarray(o_sm),
                                              err_msg=f"{g} sm={sm}")
                np.testing.assert_array_equal(np.asarray(ref_k),
                                              np.asarray(k_sm))
        # all-zero start == the start=None (non-ragged) program
        o_none, _, _ = fused_decode_step(
            x, jnp.int32(t), e_all, w_all, k_all, v_all, m.num_heads,
            block_k=16, interpret=True, grid=False)
        o_zero, _, _ = fused_decode_step(
            x, jnp.int32(t), e_all, w_all, k_all, v_all, m.num_heads,
            block_k=16, interpret=True, grid=False,
            start=jnp.zeros(3, jnp.int32))
        np.testing.assert_array_equal(np.asarray(o_none),
                                      np.asarray(o_zero))
        k_all, v_all = outs[0][1], outs[0][2]
