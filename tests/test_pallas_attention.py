"""Fused Pallas relative-attention kernel vs the XLA path and the naive
O(L^2) oracle (SURVEY.md §4 test #3; hard-part #2 of §7).

On the CPU test backend the kernel runs in interpreter mode — the same
kernel code compiles on TPU (verified on hardware; see
ops/pallas_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.ops.pallas_attention import (
    _xla_equivalent,
    fused_relative_attention,
)
from musicgeneration_tpu.ops.relative_attention import (
    naive_relative_attention_reference,
)

INTERPRET = jax.default_backend() != "tpu"


def _qkve(b=2, h=2, l=256, dh=64, max_seq=512, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q, k, v = (jax.random.normal(ks[i], (b, h, l, dh)) for i in range(3))
    e = jax.random.normal(ks[3], (max_seq, dh))
    return q, k, v, e


@pytest.mark.parametrize("block_q,block_k", [(128, 128), (128, 256),
                                             (256, 128), (256, 256),
                                             (512, 512)])
def test_matches_xla_path(block_q, block_k):
    """block_q > 128 exercises the chunked hierarchical shear."""
    q, k, v, e = _qkve(l=512)
    out = fused_relative_attention(q, k, v, e, None, block_q, block_k,
                                   True, INTERPRET)
    ref = _xla_equivalent(q, k, v, e, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_chunked_shear_bit_equal():
    """The hierarchical (chunked) shear is the same permutation as the
    log2(block_q) roll chain: (512,512) output must be BIT-equal to a
    kernel whose only difference is the shear decomposition — compare
    against (128,*) runs is inexact (different softmax tiling), so lock
    the permutation directly on _shear/_unshear."""
    from musicgeneration_tpu.ops.pallas_attention import (
        _SHEAR_CHUNK, _shear, _unshear,
    )

    def shear_ref(qe, bq, bk):
        rows = [qe[t, (bq - 1 - t):(bq - 1 - t) + bk] for t in
                range(bq)]
        return jnp.stack(rows)

    for bq, bk in ((256, 128), (512, 512), (256, 512)):
        w = bq + bk
        qe = jax.random.normal(jax.random.PRNGKey(bq + bk), (bq, w))
        got = np.asarray(jax.jit(
            lambda x: _shear(x, bq, bk))(qe))
        want = np.asarray(shear_ref(qe, bq, bk))
        np.testing.assert_array_equal(got, want)

        ds = jax.random.normal(jax.random.PRNGKey(bq - bk), (bq, bk))
        got_u = np.asarray(jax.jit(
            lambda x: _unshear(x, bq, w))(ds))
        want_u = np.zeros((bq, w), np.float32)
        for t in range(bq):
            want_u[t, (bq - 1 - t):(bq - 1 - t) + bk] = np.asarray(ds[t])
        np.testing.assert_array_equal(got_u, want_u)
    assert _SHEAR_CHUNK == 128


def test_shear_sub_chunk_bit_equal(monkeypatch):
    """MG_SHEAR_SUB < 128 takes the realign-roll branches (chunk
    offsets not 128-aligned: one uniform roll + log2(sub) variable
    rolls) — must be the SAME permutation. Measured slower on v5e
    (BASELINE.md round-4 negative result) but the knob stays, so the
    exactness must stay locked in CI, not just in the one-off probe."""
    from musicgeneration_tpu.ops.pallas_attention import _shear, _unshear

    def shear_ref(qe, bq, bk):
        return jnp.stack([qe[t, (bq - 1 - t):(bq - 1 - t) + bk]
                          for t in range(bq)])

    for sub in (8, 32):
        monkeypatch.setenv("MG_SHEAR_SUB", str(sub))
        for bq, bk in ((256, 128), (512, 512)):
            w = bq + bk
            qe = jax.random.normal(jax.random.PRNGKey(sub + bq), (bq, w))
            got = np.asarray(jax.jit(
                lambda x, bq=bq, bk=bk: _shear(x, bq, bk))(qe))
            np.testing.assert_array_equal(got,
                                          np.asarray(shear_ref(qe, bq,
                                                               bk)))
            ds = jax.random.normal(jax.random.PRNGKey(sub + bk),
                                   (bq, bk))
            got_u = np.asarray(jax.jit(
                lambda x, bq=bq, w=w: _unshear(x, bq, w))(ds))
            want_u = np.zeros((bq, w), np.float32)
            for t in range(bq):
                want_u[t, (bq - 1 - t):(bq - 1 - t) + bk] = \
                    np.asarray(ds[t])
            np.testing.assert_array_equal(got_u, want_u)


def test_autotuned_fwd_blocks():
    from musicgeneration_tpu.ops.pallas_attention import (
        autotuned_fwd_blocks,
    )
    assert autotuned_fwd_blocks(2048, 64) == (256, 256)
    assert autotuned_fwd_blocks(2048, 128) == (512, 512)
    assert autotuned_fwd_blocks(256, 128) == (256, 256)
    assert autotuned_fwd_blocks(128, 128) == (128, 128)
    assert autotuned_fwd_blocks(128, 64) == (128, 128)


def test_gradients_big_bwd_blocks():
    """bwd block_q=256 exercises the chunked _unshear inside the fused
    one-pass backward kernel."""
    q, k, v, e = _qkve(l=512)

    def loss_pallas(q, k, v, e):
        return jnp.sum(fused_relative_attention(
            q, k, v, e, None, 128, 128, True, INTERPRET, 256, 256) ** 2)

    def loss_xla(q, k, v, e):
        return jnp.sum(_xla_equivalent(q, k, v, e, None, True) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, e)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, e)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_matches_naive_oracle():
    q, k, v, e = _qkve(l=256)
    out = fused_relative_attention(q, k, v, e, None, 128, 128, True,
                                   INTERPRET)
    ref = naive_relative_attention_reference(q, k, v, e, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_key_pad_mask():
    q, k, v, e = _qkve(l=256)
    pad = (jax.random.uniform(jax.random.PRNGKey(7), (2, 256)) < 0.15)
    pad = pad.at[:, :4].set(False).astype(jnp.float32)
    out = fused_relative_attention(q, k, v, e, pad, 128, 128, True,
                                   INTERPRET)
    ref = _xla_equivalent(q, k, v, e, pad, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_no_pad_specialization_bit_equal():
    """key_pad=None now compiles a kernel variant that (a) skips the
    key-pad add entirely and (b) runs interior (fully-below-diagonal)
    KV tiles through an UNMASKED body. Both must be bit-equal to the
    all-zero-mask kernel: +0.0 from the causal where and 0 * -1e9 from
    the pad row change nothing. Locked bitwise, fwd and bwd."""
    q, k, v, e = _qkve(l=512)
    zeros = jnp.zeros((2, 512), jnp.float32)

    for bq, bk in ((128, 128), (256, 128), (128, 256)):
        out_n = fused_relative_attention(q, k, v, e, None, bq, bk,
                                         True, INTERPRET)
        out_z = fused_relative_attention(q, k, v, e, zeros, bq, bk,
                                         True, INTERPRET)
        np.testing.assert_array_equal(np.asarray(out_n),
                                      np.asarray(out_z))

    def loss(pad):
        def f(q, k, v, e):
            return jnp.sum(fused_relative_attention(
                q, k, v, e, pad, 128, 128, True, INTERPRET) ** 2)
        return f

    g_n = jax.grad(loss(None), argnums=(0, 1, 2, 3))(q, k, v, e)
    g_z = jax.grad(loss(zeros), argnums=(0, 1, 2, 3))(q, k, v, e)
    for a, b in zip(g_n, g_z):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_knob_bit_equal(monkeypatch):
    """MG_ATTN_SPLIT=1 (bench knob: interior/diagonal split loops —
    measured slower on v5e, kept for A/Bs) must be bit-equal to the
    default single all-masked tile loop."""
    q, k, v, e = _qkve(l=512)

    def run():
        out = fused_relative_attention(q, k, v, e, None, 128, 128,
                                       True, INTERPRET)
        g = jax.grad(lambda a, b, c, d: jnp.sum(fused_relative_attention(
            a, b, c, d, None, 128, 128, True, INTERPRET) ** 2),
            argnums=(0, 1, 2, 3))(q, k, v, e)
        return out, g

    out_s, g_s = run()
    monkeypatch.setenv("MG_ATTN_SPLIT", "1")
    out_m, g_m = run()
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_m))
    for a, b in zip(g_s, g_m):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prescale_knob_bit_equal(monkeypatch):
    """The dh=4^k scale fold into q (pure exponent shift — default at
    dh64) must be BIT-equal to the old [BQ, BK] logits*scale / g*scale
    passes (MG_ATTN_NO_PRESCALE=1), for the output and all four
    gradients, in f32 and bf16."""
    for dtype in (np.float32, jnp.bfloat16):
        q, k, v, e = (x.astype(dtype) for x in _qkve(l=512))

        def run():
            out = fused_relative_attention(q, k, v, e, None, 128, 128,
                                           True, INTERPRET)
            g = jax.grad(
                lambda a, b, c, d: jnp.sum(fused_relative_attention(
                    a, b, c, d, None, 128, 128, True,
                    INTERPRET).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2, 3))(q, k, v, e)
            return out, g

        out_p, g_p = run()
        monkeypatch.setenv("MG_ATTN_NO_PRESCALE", "1")
        out_o, g_o = run()
        monkeypatch.delenv("MG_ATTN_NO_PRESCALE")
        np.testing.assert_array_equal(np.asarray(out_p),
                                      np.asarray(out_o))
        for a, b in zip(g_p, g_o):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_pad_in_input_false_bit_equal():
    """pad_in_input=False (cli.train's dense-window setting) must be
    BIT-equal to the default model on pad-free batches — logits and
    grads — for both attention impls."""
    from musicgeneration_tpu.models import MusicTransformer

    x = jax.random.randint(jax.random.PRNGKey(3), (2, 128), 0, 60)
    for impl in ("xla", "pallas"):
        m_def = MusicTransformer(vocab_size=64, num_layers=2,
                                 d_model=128, max_seq=128,
                                 attention_impl=impl)
        m_np = MusicTransformer(vocab_size=64, num_layers=2,
                                d_model=128, max_seq=128,
                                attention_impl=impl,
                                pad_in_input=False)
        params = m_def.init(jax.random.PRNGKey(0), x)["params"]
        np.testing.assert_array_equal(
            np.asarray(m_def.apply({"params": params}, x)),
            np.asarray(m_np.apply({"params": params}, x)))

        def loss(m):
            def f(p):
                return jnp.sum(m.apply({"params": p}, x) ** 2)
            return f

        g_d = jax.grad(loss(m_def))(params)
        g_n = jax.grad(loss(m_np))(params)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), g_d, g_n)


def test_gradients_flow():
    q, k, v, e = _qkve(l=256)

    def loss_pallas(q, k, v, e):
        return jnp.sum(fused_relative_attention(q, k, v, e, None, 128,
                                                128, True, INTERPRET) ** 2)

    def loss_xla(q, k, v, e):
        return jnp.sum(_xla_equivalent(q, k, v, e, None, True) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, e)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, e)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_model_integration_pallas_matches_xla():
    from musicgeneration_tpu.models import MusicTransformer

    x = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 60)
    m_x = MusicTransformer(vocab_size=64, num_layers=2, d_model=128,
                           max_seq=128, attention_impl="xla")
    m_p = MusicTransformer(vocab_size=64, num_layers=2, d_model=128,
                           max_seq=128, attention_impl="pallas")
    params = m_x.init(jax.random.PRNGKey(0), x)["params"]
    lx = m_x.apply({"params": params}, x)
    lp = m_p.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=2e-4, atol=2e-4)


def test_backward_short_length_falls_back_to_xla():
    """L=64 passes the forward with block 64 but divides NO backward
    block size; the VJP must route through the exact XLA path instead of
    launching an empty Pallas grid (uninitialized gradients)."""
    q, k, v, e = _qkve(l=64, max_seq=128)

    def loss_pallas(q, k, v, e):
        return jnp.sum(fused_relative_attention(q, k, v, e, None, 64, 64,
                                                True, INTERPRET) ** 2)

    def loss_xla(q, k, v, e):
        return jnp.sum(_xla_equivalent(q, k, v, e, None, True) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, e)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, e)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_rejects_bad_shapes():
    q, k, v, e = _qkve(l=192)
    with pytest.raises(ValueError, match="multiple"):
        fused_relative_attention(q, k, v, e, None, 128, 128, True,
                                 INTERPRET)
    q, k, v, e = _qkve(l=1024, max_seq=512)
    with pytest.raises(ValueError, match="exceeds"):
        fused_relative_attention(q, k, v, e, None, 128, 128, True,
                                 INTERPRET)
