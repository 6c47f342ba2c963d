"""Fused relative global attention — Pallas TPU kernel.

One kernel computes what the reference does in five materialized [L, L]
tensors (mg/model/MusicTransformer/layers.py:64-109: QE, skewed Srel,
QK^T, masked logits, softmax weights): a flash-style streaming pass —

    per query block (grid):  loop over kv blocks (causal prefix only):
        qk    = q_blk @ k_blk^T                         (MXU)
        qe    = q_blk @ E[base : base+W]^T              (MXU)
        srel  = shear(qe)   # per-row shift, log2(BQ) roll+select (VPU)
        logits = (qk + srel) / sqrt(dh) + masks * -1e9
        online softmax accumulate into (acc, row_max, row_sum)

Nothing of size [L, L] ever exists: HBM traffic is O(L * dh) per query
block instead of O(L^2), which is the whole game on TPU (HBM bandwidth
bound).  The skew trick (layers.py:116-125) becomes a *local* shear: for
the (t0, s0) tile, Srel[t, s] = q_t . E[max_seq-1-t+s] = qe[t, p+s] with
p = (t0+BQ-1) - t, and a row-varying shift-by-p is log2(BQ) static
circular rolls with bit-masked selects (verified exact on TPU hardware).

Numerics match ops.relative_attention.relative_global_attention (the
XLA path) to f32 tolerance; tests compare both against the naive O(L^2)
gather oracle.

Backward: jax.custom_vjp whose bwd recomputes through the XLA path —
the forward saves only (q, k, v, e, mask) so training memory drops from
O(L^2) activations to O(L * dh); the bwd pays one recompute (standard
flash-attention trade).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .relative_attention import relative_global_attention

NEG_INF = -1e9  # reference mask value (layers.py:98-100)


def _shear(qe: jnp.ndarray, block_q: int, block_k: int) -> jnp.ndarray:
    """srel[t, s] = qe[t, (block_q - 1 - t) + s].

    Row t needs a left-shift by p = block_q-1-t; done in log2(block_q)
    static circular rolls, selecting per row on the bits of p.  Safe
    because the read region [0, block_k) never observes wrapped values:
    c + p <= (block_k-1) + (block_q-1) < W.
    """
    w = qe.shape[-1]
    p = (block_q - 1) - jax.lax.broadcasted_iota(jnp.int32, qe.shape, 0)
    b = 1
    while b < block_q:
        rolled = pltpu.roll(qe, w - b, 1)  # left-shift by b
        qe = jnp.where((p & b) != 0, rolled, qe)
        b *= 2
    return qe[:, :block_k]


def _kernel(q_ref, k_ref, v_ref, e_ref, pad_ref, out_ref, *,
            block_q: int, block_k: int, max_seq: int, causal: bool):
    qi = pl.program_id(1)
    t0 = qi * block_q
    kv_len = k_ref.shape[1]  # block is [1, L, dh]
    dh = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(dh)

    q = q_ref[0].astype(jnp.float32)  # [BQ, dh]

    n_kv = kv_len // block_k
    if causal:
        # only blocks with s0 <= t0 + BQ - 1 contribute
        n_kv_live = jnp.minimum((t0 + block_q - 1) // block_k + 1, n_kv)
    else:
        n_kv_live = n_kv

    def body(j, carry):
        acc, m, l = carry
        s0 = j * block_k
        k_blk = k_ref[0, pl.ds(s0, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(s0, block_k), :].astype(jnp.float32)

        qk = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BQ, BK]

        # relative scores: E rows for this tile are the contiguous range
        # base .. base+W, W = BQ+BK (one slack row; e is padded so the
        # diagonal tile's future-position rows exist and get masked)
        base = max_seq - block_q - t0 + s0
        e_blk = e_ref[pl.ds(base, block_q + block_k), :]
        qe = jax.lax.dot_general(
            q, e_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BQ, BQ+BK]
        srel = _shear(qe, block_q, block_k)

        logits = (qk + srel) * scale
        t_ids = t0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        s_ids = s0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            logits = logits + jnp.where(s_ids > t_ids, NEG_INF, 0.0)
        pad_row = pad_ref[0, 0:1, pl.ds(s0, block_k)]  # [1, BK]
        logits = logits + pad_row * NEG_INF

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p_ij = jnp.exp(logits - m_new)
        l_new = l * alpha + jnp.sum(p_ij, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p_ij, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, dh), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv_live, body, (acc0, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _fused_fwd_impl(q, k, v, e, key_pad, block_q: int, block_k: int,
                    causal: bool, interpret: bool):
    b, h, l, dh = q.shape
    max_seq = e.shape[0]
    if l % block_q or l % block_k:
        raise ValueError(f"L={l} must be a multiple of block sizes "
                         f"({block_q}, {block_k})")
    if l > max_seq:
        raise ValueError(f"L={l} exceeds the relative table ({max_seq})")
    # pad E with slack rows for future-position reads (masked before
    # softmax): the diagonal tile reads BQ+BK past the end; non-causal
    # tiles reach up to L past it
    slack = (block_q + block_k) if causal else (l + block_k)
    e_padded = jnp.pad(e.astype(jnp.float32), ((0, slack), (0, 0)))
    if key_pad is None:
        key_pad = jnp.zeros((b, l), jnp.float32)
    key_pad = jnp.broadcast_to(key_pad.astype(jnp.float32), (b, l))

    bh = b * h
    qf = q.reshape(bh, l, dh)
    kf = k.reshape(bh, l, dh)
    vf = v.reshape(bh, l, dh)
    # pad mask per (b, h) row: repeat over heads; [bh, 1, L] so the
    # trailing block dims equal the array dims (Mosaic tiling rule)
    padf = jnp.repeat(key_pad, h, axis=0)[:, None, :]  # [bh, 1, L]

    grid = (bh, l // block_q)
    kernel = functools.partial(_kernel, block_q=block_q, block_k=block_k,
                               max_seq=max_seq, causal=causal)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),        # q block
            pl.BlockSpec((1, l, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # k (full row)
            pl.BlockSpec((1, l, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # v
            pl.BlockSpec((max_seq + slack, dh),
                         lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),        # e (full)
            pl.BlockSpec((1, 1, l), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # key pad
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, l, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * l * l * dh * 2,  # qk + pv (srel extra ~qk/2)
            bytes_accessed=bh * l * dh * 4 * 4,
            transcendentals=bh * l * l,
        ),
    )(qf, kf, vf, e_padded, padf)
    return out.reshape(b, h, l, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_relative_attention(q, k, v, e, key_pad=None,
                             block_q: int = 128, block_k: int = 128,
                             causal: bool = True,
                             interpret: bool = False):
    """Flash-style fused relative attention.

    q/k/v: [B, H, L, dh]; e: [max_seq, dh]; key_pad: optional [B, L]
    (1.0 = padded key, reference mask convention). Causal by default
    (the reference model is decoder-only). Returns [B, H, L, dh].
    """
    return _fused_fwd_impl(q, k, v, e, key_pad, block_q, block_k,
                           causal, interpret)


def _xla_equivalent(q, k, v, e, key_pad, causal: bool):
    """The pure-XLA path with an identically-shaped mask (for the VJP)."""
    l = q.shape[2]
    mask = None
    pieces = []
    if causal:
        t = jnp.arange(l)
        pieces.append((t[None, :] > t[:, None])[None, None].astype(
            jnp.float32))
    if key_pad is not None:
        pieces.append(key_pad.astype(jnp.float32)[:, None, None, :])
    if pieces:
        mask = pieces[0]
        for p in pieces[1:]:
            mask = jnp.maximum(mask, p)
    return relative_global_attention(q, k, v, e, mask)


def _fwd(q, k, v, e, key_pad, block_q, block_k, causal, interpret):
    out = _fused_fwd_impl(q, k, v, e, key_pad, block_q, block_k, causal,
                          interpret)
    return out, (q, k, v, e, key_pad)


def _bwd(block_q, block_k, causal, interpret, res, g):
    q, k, v, e, key_pad = res
    # recompute-through-XLA backward: O(L*dh) saved residuals, one extra
    # forward at bwd time (flash-attention memory trade)
    _, vjp = jax.vjp(
        lambda q_, k_, v_, e_: _xla_equivalent(q_, k_, v_, e_, key_pad,
                                               causal), q, k, v, e)
    dq, dk, dv, de = vjp(g)
    return dq, dk, dv, de, None


fused_relative_attention.defvjp(_fwd, _bwd)
