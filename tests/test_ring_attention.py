"""Ring (sequence-parallel) relative attention vs the single-device path
on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.ops.relative_attention import (
    relative_global_attention,
)
from musicgeneration_tpu.parallel.mesh import make_mesh
from musicgeneration_tpu.parallel.ring_attention import (
    ring_relative_attention,
)


def _qkve(l=256, b=2, h=2, dh=32, max_seq=512, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q, k, v = (jax.random.normal(ks[i], (b, h, l, dh)) for i in range(3))
    e = jax.random.normal(ks[3], (max_seq, dh))
    return q, k, v, e


def _xla_causal(q, k, v, e):
    l = q.shape[2]
    t = jnp.arange(l)
    mask = (t[None, :] > t[:, None])[None, None].astype(jnp.float32)
    return relative_global_attention(q, k, v, e, mask)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_single_device(sp):
    mesh = make_mesh(dp=8 // sp // 1, sp=sp, tp=1)
    q, k, v, e = _qkve()
    ref = _xla_causal(q, k, v, e)
    out = ring_relative_attention(q, k, v, e, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_non_causal():
    mesh = make_mesh(dp=2, sp=4, tp=1)
    q, k, v, e = _qkve(l=128)
    ref = relative_global_attention(q, k, v, e, None)
    out = ring_relative_attention(q, k, v, e, mesh, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_under_jit_with_sharded_inputs():
    """Inputs already sharded over 'seq' stay sharded through a jitted
    ring-attention call (no resharding round-trips)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(dp=1, sp=8, tp=1)
    q, k, v, e = _qkve(l=512, b=1, h=1)
    sh = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(
        lambda a, b, c, d: ring_relative_attention(a, b, c, d, mesh)
    )(qs, ks_, vs, e)
    ref = _xla_causal(q, k, v, e)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert out.sharding.spec == P(None, None, "seq", None)


def test_ring_rejects_indivisible_length():
    mesh = make_mesh(dp=1, sp=8, tp=1)
    q, k, v, e = _qkve(l=100)
    with pytest.raises(ValueError, match="not divisible"):
        ring_relative_attention(q, k, v, e, mesh)
