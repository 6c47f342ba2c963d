"""Ring attention over the 'seq' mesh axis — sequence-parallel relative
attention (SURVEY.md §5 long-context row: "the natural on-ramp ... if
sequence lengths grow").

The sequence axis is sharded across devices: each device holds an
L/n-slice of Q, K and V. KV slices rotate around the ring with
`jax.lax.ppermute` while every device accumulates flash-style online
softmax statistics of its local queries against each passing KV block —
the relative bias is computed per block from GLOBAL positions, exactly
matching the single-device Music-Transformer semantics
(Srel[t, s] = q_t . E[max_seq-1-(t-s)], masked to s <= t).

Collectives ride the ICI neighbor links (ppermute), overlap with the
per-block compute, and the full [L, L] score matrix never exists on any
device. Tested for exactness against the single-device XLA path on the
8-virtual-device CPU mesh (tests/test_ring_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e9


def _block_logits(q, k_blk, e, t0, s0, max_seq, causal, pad_blk=None):
    """Masked, scaled logits of local queries [B,H,Lq,dh] against one KV
    block [B,H,Ls,dh] whose global key offset is s0 (t0 = global query
    offset). Identical math to ops.relative_attention (reference
    layers.py:94-100) with per-block global indices. pad_blk: optional
    [B, Ls] (1.0 = padded key, the reference mask convention)."""
    lq, ls = q.shape[2], k_blk.shape[2]
    dh = q.shape[-1]
    qk = jnp.einsum("bhld,bhsd->bhls", q, k_blk,
                    preferred_element_type=jnp.float32)
    t = t0 + jnp.arange(lq)[:, None]
    s = s0 + jnp.arange(ls)[None, :]
    rel = jnp.clip(max_seq - 1 - (t - s), 0, max_seq - 1)  # [Lq, Ls]
    e_g = jnp.take(e.astype(jnp.float32), rel, axis=0)     # [Lq, Ls, dh]
    srel = jnp.einsum("bhld,lsd->bhls", q.astype(jnp.float32), e_g)
    srel = jnp.where((s <= t)[None, None], srel, 0.0)
    logits = (qk + srel) / jnp.sqrt(jnp.float32(dh))
    if causal:
        logits = logits + jnp.where(s > t, NEG_INF, 0.0)[None, None]
    if pad_blk is not None:
        logits = logits + (pad_blk.astype(jnp.float32)[:, None, None, :]
                           * NEG_INF)
    return logits


def _ring_body(q, k, v, e, pad, n_shards: int, axis_name: str,
               max_seq: int, causal: bool):
    """Per-shard function run under shard_map. pad: [B, L/n] local key
    padding, rotated around the ring alongside its KV shard."""
    idx = jax.lax.axis_index(axis_name)
    l_loc = q.shape[2]
    dh = q.shape[-1]
    t0 = idx * l_loc
    qf = q.astype(jnp.float32)

    m = jnp.full(q.shape[:3] + (1,), NEG_INF, jnp.float32)
    l = jnp.zeros(q.shape[:3] + (1,), jnp.float32)
    acc = jnp.zeros(q.shape[:3] + (dh,), jnp.float32)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    k_blk, v_blk, pad_blk = k, v, pad
    for r in range(n_shards):
        # after r rotations, this device holds the KV shard that started
        # on device (idx - r) mod n
        src = (idx - r) % n_shards
        s0 = src * l_loc
        logits = _block_logits(qf, k_blk.astype(jnp.float32), e, t0, s0,
                               max_seq, causal, pad_blk)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhls,bhsd->bhld", p, v_blk.astype(jnp.float32))
        m = m_new
        if r + 1 < n_shards:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            if pad_blk is not None:
                pad_blk = jax.lax.ppermute(pad_blk, axis_name, perm)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_relative_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    e: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    causal: bool = True,
    batch_axis: Optional[str] = "data",
    key_pad: Optional[jnp.ndarray] = None,
):
    """Sequence-parallel relative global attention.

    q/k/v: GLOBAL [B, H, L, dh] arrays (sharded or shardable over
    `axis_name` on dim 2, and over `batch_axis` on dim 0 when that axis
    exists in the mesh — so dp and sp compose without replicating the
    batch). e: [max_seq, dh] replicated. key_pad: optional [B, L]
    (1.0 = padded key); its shards rotate around the ring with their KV.
    Returns [B, H, L, dh] sharded the same way. L must divide evenly by
    the axis size and fit the relative table.
    """
    n = mesh.shape[axis_name]
    if q.shape[2] % n:
        raise ValueError(f"L={q.shape[2]} not divisible by "
                         f"{axis_name}={n}")
    if q.shape[2] > e.shape[0]:
        # beyond the table every distance >= max_seq would silently clip
        # to E[0] — reject like the fused/XLA paths do
        raise ValueError(f"L={q.shape[2]} exceeds the relative table "
                         f"({e.shape[0]})")
    b_ax = batch_axis if (batch_axis and batch_axis in mesh.shape
                          and q.shape[0] % mesh.shape[batch_axis] == 0)\
        else None
    if key_pad is None:
        key_pad = jnp.zeros((q.shape[0], q.shape[2]), jnp.float32)
    spec = P(b_ax, None, axis_name, None)
    body = functools.partial(_ring_body, n_shards=n, axis_name=axis_name,
                             max_seq=e.shape[0], causal=causal)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, P(), P(b_ax, axis_name)),
        out_specs=spec,
    )
    return fn(q, k, v, e, key_pad)
