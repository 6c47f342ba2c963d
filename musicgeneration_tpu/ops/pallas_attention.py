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

Backward: fused flash-style Pallas kernels (jax.custom_vjp). Residuals
are (q, k, v, e, key_pad, out, lse) — O(L * dh), never O(L^2). The
dQ+dE kernel re-derives p per tile from the saved LSE and scatters the
relative-table gradient with the inverse shear, accumulating dE across
the (sequential) grid; a second kernel produces dK+dV per kv block.
Backward block sizes are tuned independently (256x256 vs the forward's
128x128); together they make the full train step ~2x faster than the
XLA path at L=2048 on v5e (BASELINE.md).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .relative_attention import relative_global_attention

NEG_INF = -1e9  # reference mask value (layers.py:98-100)


_SHEAR_CHUNK = 128  # lane width: chunk offsets stay 128-aligned


def _shear_sub_rows() -> int:
    """Shear sub-chunk height (rows per roll group). Default 128 keeps
    every chunk offset 128-aligned (pure static slices). Smaller
    powers of two trade ONE extra uniform realign roll per chunk for
    log2(sub) instead of 7 variable rolls on a (sub/128)x narrower
    slab — less total VPU roll work. MG_SHEAR_SUB tunes it (0 = 128)."""
    import os
    return int(os.environ.get("MG_SHEAR_SUB", "0")) or _SHEAR_CHUNK


def _shear(qe: jnp.ndarray, block_q: int, block_k: int) -> jnp.ndarray:
    """srel[t, s] = qe[t, (block_q - 1 - t) + s].

    Row t needs a left-shift by p = block_q-1-t; done with static
    circular rolls, selecting per row on the bits of p.  Safe because
    the read region [0, block_k) never observes wrapped values:
    c + p <= (block_k-1) + (block_q-1) < W.

    For block_q > sub-chunk size c the shift is split hierarchically:
    the multiple-of-c part of p lands via a static 128-aligned column
    slice (c = 128, free) or one uniform realign roll (c < 128),
    leaving only log2(c) variable rolls on a [c, c+block_k] slab per
    chunk instead of log2(block_q) rolls on the full
    [block_q, block_q+block_k] array.  Exact permutation either way
    (bit-identical outputs; locked by the oracle tests)."""
    w = qe.shape[-1]
    c = min(_shear_sub_rows(), block_q)
    if block_q <= c:
        p = (block_q - 1) - jax.lax.broadcasted_iota(jnp.int32, qe.shape,
                                                     0)
        b = 1
        while b < block_q:
            rolled = pltpu.roll(qe, w - b, 1)  # left-shift by b
            qe = jnp.where((p & b) != 0, rolled, qe)
            b *= 2
        return qe[:, :block_k]

    sub_w = c + block_k
    outs = []
    for i in range(block_q // c):
        # rows t = i*c + t' need column (block_q-1-t) + s
        #        = off + (c-1-t') + s  with  off = block_q - c*(i+1)
        off = block_q - c * (i + 1)
        if off % 128 == 0:
            sub = qe[i * c:(i + 1) * c, off:off + sub_w]
        else:
            # realign: one uniform left-roll by off, then the static
            # slice is 0-based (no wrap: off + sub_w <= w)
            sub = pltpu.roll(qe[i * c:(i + 1) * c, :], w - off,
                             1)[:, :sub_w]
        p = (c - 1) - jax.lax.broadcasted_iota(jnp.int32, sub.shape, 0)
        b = 1
        while b < c:
            rolled = pltpu.roll(sub, sub_w - b, 1)
            sub = jnp.where((p & b) != 0, rolled, sub)
            b *= 2
        outs.append(sub[:, :block_k])
    return jnp.concatenate(outs, axis=0)


def _unshear(ds: jnp.ndarray, block_q: int, w: int) -> jnp.ndarray:
    """Inverse of _shear: place ds[t, s] at column (block_q-1-t) + s.

    Row t right-shifts by p = block_q-1-t; the final span [p, p+BK) stays
    inside [0, w) for w >= block_q+block_k-1, and every wrapped element
    comes from the zero right-padding, so the result is exact.

    Mirrors _shear's hierarchical split for block_q > sub-chunk size c:
    the multiple-of-c shift lands via a static 128-aligned left-pad
    (c = 128) or a zero-pad plus one uniform right-roll (c < 128);
    rolls only cover the residual 0..c-1 shift."""
    block_k = ds.shape[1]
    c = min(_shear_sub_rows(), block_q)
    if block_q <= c:
        x = jnp.pad(ds, ((0, 0), (0, w - block_k)))
        p = (block_q - 1) - jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                                     0)
        b = 1
        while b < block_q:
            rolled = pltpu.roll(x, b, 1)  # right-shift by b
            x = jnp.where((p & b) != 0, rolled, x)
            b *= 2
        return x

    sub_w = c + block_k
    outs = []
    for i in range(block_q // c):
        off = block_q - c * (i + 1)
        sub = jnp.pad(ds[i * c:(i + 1) * c], ((0, 0), (0, c)))
        p = (c - 1) - jax.lax.broadcasted_iota(jnp.int32, sub.shape, 0)
        b = 1
        while b < c:
            rolled = pltpu.roll(sub, b, 1)
            sub = jnp.where((p & b) != 0, rolled, sub)
            b *= 2
        if off % 128 == 0:
            outs.append(jnp.pad(sub, ((0, 0), (off, w - off - sub_w))))
        else:
            # pad right to full width (lane-aligned), then one uniform
            # right-roll by off — every wrapped element comes from the
            # zero padding (off + sub_w <= w)
            full = jnp.pad(sub, ((0, 0), (0, w - sub_w)))
            outs.append(pltpu.roll(full, off, 1))
    return jnp.concatenate(outs, axis=0)


def _prescale(dh) -> bool:
    """True when 1/sqrt(dh) is an exact power of two (dh = 4^k): the
    kernels then fold the softmax scale into q at block load — a
    [BQ, dh] multiply that shifts exponents only, BIT-equal to scaling
    the [BQ, BK] logits tile (every downstream product and f32 partial
    sum scales exactly), and it removes the two per-tile [BQ, BK]
    scale passes (logits*scale fwd, g*scale bwd) from this VPU-bound
    kernel — measured ~11% of the dh64 backward. dh=128's
    2^-3.5 would round bf16 mantissas, so it keeps the multiply (its
    scale pass measured free anyway — hidden under the bigger MXU
    dots). MG_ATTN_NO_PRESCALE=1 (trace-time) forces the old path for
    A/Bs; bit-equality locked in test_pallas_attention.py."""
    if os.environ.get("MG_ATTN_NO_PRESCALE") == "1":
        return False
    return math.log2(1.0 / math.sqrt(dh)).is_integer()


def _tile_logits(q, k_ref, e_ref, pad_ref, t0, s0, block_q, block_k,
                 max_seq, causal, scale, masked=True, prescaled=False):
    """Recompute one tile's masked, scaled logits + the e slice — shared
    verbatim by forward and both backward kernels so p is bit-identical.

    Matmuls run in the INPUT dtype (bf16 stays bf16 on the MXU — 2x the
    f32 rate) with f32 accumulation via preferred_element_type.

    masked=False skips the causal iota/compare/select chain: callers
    pass it for INTERIOR tiles (every s in the tile <= every t), where
    the mask is all-zero by construction — bit-equal, and it removes
    ~5 VPU passes over the [BQ, BK] tile from the hot loop of this
    VPU-bound kernel. pad_ref=None likewise skips the key-pad add
    (exact when the caller had no pad mask: 0 * -1e9 adds nothing).
    prescaled=True: q already carries the softmax scale (see
    _prescale) — the [BQ, BK] multiply is skipped."""
    k_blk = k_ref[0, pl.ds(s0, block_k), :]
    base = max_seq - block_q - t0 + s0
    # every term is a multiple of gcd(block_q, block_k, max_seq-block_q);
    # Mosaic needs the sublane alignment stated explicitly for narrow
    # dtypes (bf16 tiles are 16 sublanes)
    align = math.gcd(math.gcd(block_q, block_k), max_seq - block_q)
    if align > 1:
        base = pl.multiple_of(base, align)
    e_blk = e_ref[pl.ds(base, block_q + block_k), :]
    # ONE MXU dot for QK^T and QE^T (concat along the contraction rows):
    # ~6% per-tile at (512,512) dh=128; bit-equal (same dots, f32 accum)
    ke = jnp.concatenate([k_blk, e_blk], axis=0)
    qke = jax.lax.dot_general(q, ke, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qk = qke[:, :block_k]
    qe = qke[:, block_k:]
    srel = _shear(qe, block_q, block_k)
    logits = (qk + srel) if prescaled else (qk + srel) * scale
    if causal and masked:
        t_ids = t0 + jax.lax.broadcasted_iota(jnp.int32,
                                              (block_q, block_k), 0)
        s_ids = s0 + jax.lax.broadcasted_iota(jnp.int32,
                                              (block_q, block_k), 1)
        logits = logits + jnp.where(s_ids > t_ids, NEG_INF, 0.0)
    if pad_ref is not None:
        pad_row = pad_ref[0, 0:1, pl.ds(s0, block_k)]
        logits = logits + pad_row * NEG_INF
    return logits, k_blk, e_blk, base


def _n_interior(t0, block_k, n_kv_live):
    """KV tiles fully below the diagonal for the query block at t0:
    tile j is interior iff its last key (j+1)*BK - 1 <= first query t0,
    i.e. j < (t0 + 1) // BK. Interior tiles need no causal mask and
    COULD run the unmasked _tile_logits body — but the split was
    measured SLOWER on v5e (same-process A/B, alternating reps: dh64
    (256,256) fwd 1.76 vs 1.69 ms / bwd 2.14 vs 1.95 ms all-masked;
    dh128 (512,512) parity; flagship/production train steps ~1%
    faster all-masked), so the default is 0 interior tiles — one
    masked fori_loop, which Mosaic schedules better than two
    dynamic-bound loops with duplicated bodies. MG_ATTN_SPLIT=1 (read
    at trace time) re-enables the split for A/Bs; bit-equal either
    way (locked in test_pallas_attention.py)."""
    if os.environ.get("MG_ATTN_SPLIT") != "1":
        return 0
    return jnp.minimum((t0 + 1) // block_k, n_kv_live)


def _kernel(q_ref, k_ref, v_ref, e_ref, pad_ref, out_ref, lse_ref, *,
            block_q: int, block_k: int, max_seq: int, causal: bool,
            has_pad: bool):
    qi = pl.program_id(1)
    t0 = qi * block_q
    kv_len = k_ref.shape[1]  # block is [1, L, dh]
    dh = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    prescale = _prescale(dh)
    pref = pad_ref if has_pad else None

    q = q_ref[0]  # [BQ, dh], native dtype (bf16 rides the MXU at 2x)
    if prescale:  # exponent-shift only: bit-equal (see _prescale)
        q = q * scale  # python float: weak type, stays native dtype

    n_kv = kv_len // block_k
    if causal:
        # only blocks with s0 <= t0 + BQ - 1 contribute
        n_kv_live = jnp.minimum((t0 + block_q - 1) // block_k + 1, n_kv)
    else:
        n_kv_live = n_kv

    def body(j, carry, masked):
        acc, m, l = carry
        s0 = j * block_k
        v_blk = v_ref[0, pl.ds(s0, block_k), :]
        logits, _, _, _ = _tile_logits(q, k_ref, e_ref, pref, t0, s0,
                                       block_q, block_k, max_seq, causal,
                                       scale, masked=masked,
                                       prescaled=prescale)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        if os.environ.get("MG_ATTN_EXP_BF16") == "1":
            # A/B knob (trace-time): run the big [BQ, BK] exp in bf16
            # (packed VPU lanes) — NOT exact; perf probe for the
            # production-shape MFU study only
            p_ij = jnp.exp((logits - m_new).astype(jnp.bfloat16))
            l_new = l * alpha + jnp.sum(
                p_ij.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            p_ij = jnp.exp(logits - m_new)
            l_new = l * alpha + jnp.sum(p_ij, axis=-1, keepdims=True)
        # weights drop to the value dtype for the PV matmul — the same
        # precision choice as the XLA path (relative_global_attention)
        acc_new = acc * alpha + jax.lax.dot_general(
            p_ij.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, dh), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    carry = (acc0, m0, l0)
    if causal:
        # n_int = 0 by default: one masked loop beats the
        # interior/diagonal split on v5e (see _n_interior)
        n_int = _n_interior(t0, block_k, n_kv_live)
        carry = jax.lax.fori_loop(
            0, n_int, functools.partial(body, masked=False), carry)
        carry = jax.lax.fori_loop(
            n_int, n_kv_live, functools.partial(body, masked=True), carry)
    else:
        carry = jax.lax.fori_loop(
            0, n_kv_live, functools.partial(body, masked=False), carry)
    acc, m, l = carry
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))  # [BQ, 1]


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
    # tiles reach up to L past it. E drops to the compute dtype so the
    # QE matmul stays on the fast MXU path.
    slack = (block_q + block_k) if causal else (l + block_k)
    e_padded = jnp.pad(e.astype(q.dtype), ((0, slack), (0, 0)))
    # key_pad=None compiles the no-pad kernel: the pad add drops out of
    # every tile (bit-equal to a zero mask; the dummy input's [1,1,L]
    # block DMA is noise next to the K/V rows)
    has_pad = key_pad is not None
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
                               max_seq=max_seq, causal=causal,
                               has_pad=has_pad)
    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),        # lse [bh, L, 1]
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, l, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, l, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * l * l * dh * 2,  # qk + pv (srel extra ~qk/2)
            bytes_accessed=bh * l * dh * 4 * 4,
            transcendentals=bh * l * l,
        ),
    )(qf, kf, vf, e_padded, padf)
    return out.reshape(b, h, l, dh), lse


def autotuned_fwd_blocks(l: int, dh: int) -> tuple:
    """Forward block sizes measured on v5e (bf16, L=2048, round 4,
    with the chunked hierarchical shear — which is what makes big
    query blocks win: the old full-width roll chain cost O(log2(bq))
    passes over [bq, bq+bk] and had pinned the optimum at 128x128).

    dh=128 (production shape, B6H8): (512,512) 3.65 ms vs (128,128)
    7.95 ms.  dh=64 (reference shape, B6H4): (256,256) 3.29 ms vs
    (128,128) 8.65 ms — the per-tile VPU chain (softmax + shear set-up)
    amortizes over 4x the MXU work."""
    if dh >= 128:
        for bq, bk in ((512, 512), (256, 256)):
            if l % bq == 0 and l % bk == 0:
                return bq, bk
    else:
        if l % 256 == 0:
            return 256, 256
    return 128, 128


def autotuned_bwd_blocks(l: int, dh: int = 64) -> tuple:
    """Backward block sizes measured on v5e (bf16, one-pass fused
    backward; sweeps recorded in BASELINE.md).

    Round 4, with the chunked hierarchical _unshear, (512,512) wins at
    BOTH head sizes at L=2048: dh=128 B6H8 fwd+bwd 8.16 ms vs 9.07 at
    the old (128,512); dh=64 B6H4 5.19 ms vs 5.54.  For L not divisible
    by 512, fall back to the round-2 rule (narrow query block, widest
    dividing kv block) — (128,512) still beats (256,256) at both head
    sizes, so the old rule stays right whenever 512 doesn't divide L."""
    if l % 512 == 0:
        return 512, 512
    for bk in (512, 256, 128):
        if l % bk == 0 and l % 128 == 0:
            return 128, bk
    return 128, 128  # _bwd falls back to XLA if these don't divide L


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def fused_relative_attention(q, k, v, e, key_pad=None,
                             block_q: int = 128, block_k: int = 128,
                             causal: bool = True,
                             interpret: bool = False,
                             bwd_block_q: int = 0,
                             bwd_block_k: int = 0):
    """Flash-style fused relative attention.

    q/k/v: [B, H, L, dh]; e: [max_seq, dh]; key_pad: optional [B, L]
    (1.0 = padded key, reference mask convention). Causal by default
    (the reference model is decoder-only). Returns [B, H, L, dh].

    Callers should pick forward blocks with autotuned_fwd_blocks(l, dh)
    (the 128x128 parameter default is the safe always-divides choice);
    backward blocks default to the autotune table (pass bwd_block_q/k
    > 0 to override).
    """
    out, _ = _fused_fwd_impl(q, k, v, e, key_pad, block_q, block_k,
                             causal, interpret)
    return out


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


def _bwd_fused_kernel(q_ref, k_ref, v_ref, e_ref, pad_ref, do_ref,
                      lse_ref, delta_ref, dq_ref, dk_ref, dv_ref, de_ref,
                      *, block_q: int, block_k: int, max_seq: int,
                      causal: bool, has_pad: bool):
    """ONE-PASS backward: each (i, qi) grid step recomputes its causal
    row of tiles once and scatters all four gradients — dQ to its own
    block, dK/dV into full-row outputs revisited across qi (init at
    qi==0), dE into a full output revisited across the whole grid.
    Halves the tile-logit recompute vs the split dQ+dE / dK+dV pair."""
    i = pl.program_id(0)
    qi = pl.program_id(1)
    t0 = qi * block_q
    kv_len = k_ref.shape[1]
    dh = q_ref.shape[-1]
    w = block_q + block_k
    scale = 1.0 / math.sqrt(dh)
    prescale = _prescale(dh)

    @pl.when((i == 0) & (qi == 0))
    def _init_de():
        de_ref[...] = jnp.zeros_like(de_ref)

    @pl.when(qi == 0)
    def _init_dkv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0]
    if prescale:
        # q carries the scale: dk/de dot q-scaled (bit-equal to the
        # old (g*scale)^T @ q — s is a pure exponent shift), g skips
        # its [BQ, BK] *scale pass, and dq (computed w.r.t. scaled q)
        # is rescaled once at the end on [BQ, dh].
        q = q * scale
    do = do_ref[0]
    lse = lse_ref[0, pl.ds(t0, block_q), :]      # [BQ, 1]
    delta = delta_ref[0, pl.ds(t0, block_q), :]  # [BQ, 1]
    cdt = q.dtype
    pref = pad_ref if has_pad else None

    n_kv = kv_len // block_k
    n_kv_live = (jnp.minimum((t0 + block_q - 1) // block_k + 1, n_kv)
                 if causal else n_kv)

    def body(j, dq, masked):
        s0 = j * block_k
        v_blk = v_ref[0, pl.ds(s0, block_k), :]
        logits, k_blk, e_blk, base = _tile_logits(
            q, k_ref, e_ref, pref, t0, s0, block_q, block_k, max_seq,
            causal, scale, masked=masked, prescaled=prescale)
        p = jnp.exp(logits - lse)                    # [BQ, BK] f32
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = p * (dp - delta)                         # dL/dlogits
        gs_f32 = g if prescale else g * scale
        gs = gs_f32.astype(cdt)
        dq = dq + jax.lax.dot_general(gs, k_blk, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        # shear in f32 (Mosaic's rotate is 32-bit only), matmuls in cdt
        dqe = _unshear(gs_f32, block_q, w).astype(cdt)  # [BQ, W]
        dq = dq + jax.lax.dot_general(dqe, e_blk, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        de_ref[pl.ds(base, w), :] += jax.lax.dot_general(
            dqe, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [W, dh]
        dk_ref[0, pl.ds(s0, block_k), :] += jax.lax.dot_general(
            gs, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [BK, dh]
        dv_ref[0, pl.ds(s0, block_k), :] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq

    dq = jnp.zeros((block_q, dh), jnp.float32)
    if causal:
        n_int = _n_interior(t0, block_k, n_kv_live)
        dq = jax.lax.fori_loop(
            0, n_int, functools.partial(body, masked=False), dq)
        dq = jax.lax.fori_loop(
            n_int, n_kv_live, functools.partial(body, masked=True), dq)
    else:
        dq = jax.lax.fori_loop(
            0, n_kv_live, functools.partial(body, masked=False), dq)
    if prescale:
        dq = dq * scale  # dL/dq = s * dL/d(q*s); exact (s = 2^-k)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dq_de_kernel(q_ref, k_ref, v_ref, e_ref, pad_ref, do_ref,
                      lse_ref, delta_ref, dq_ref, de_ref, *,
                      block_q: int, block_k: int, max_seq: int,
                      causal: bool, has_pad: bool):
    """dQ and dE for one query block; dE accumulates across the whole
    (sequential) grid into a single revisited output block."""
    i = pl.program_id(0)
    qi = pl.program_id(1)
    t0 = qi * block_q
    kv_len = k_ref.shape[1]
    dh = q_ref.shape[-1]
    w = block_q + block_k
    scale = 1.0 / math.sqrt(dh)
    prescale = _prescale(dh)

    @pl.when((i == 0) & (qi == 0))
    def _init():
        de_ref[...] = jnp.zeros_like(de_ref)

    q = q_ref[0]
    if prescale:  # see _bwd_fused_kernel
        q = q * scale
    do = do_ref[0]
    lse = lse_ref[0, pl.ds(t0, block_q), :]      # [BQ, 1]
    delta = delta_ref[0, pl.ds(t0, block_q), :]  # [BQ, 1]
    cdt = q.dtype  # compute dtype for the MXU legs
    pref = pad_ref if has_pad else None

    n_kv = kv_len // block_k
    n_kv_live = (jnp.minimum((t0 + block_q - 1) // block_k + 1, n_kv)
                 if causal else n_kv)

    def body(j, dq, masked):
        s0 = j * block_k
        v_blk = v_ref[0, pl.ds(s0, block_k), :]
        logits, k_blk, e_blk, base = _tile_logits(
            q, k_ref, e_ref, pref, t0, s0, block_q, block_k, max_seq,
            causal, scale, masked=masked, prescaled=prescale)
        p = jnp.exp(logits - lse)                    # [BQ, BK] f32
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = p * (dp - delta)                         # dL/dlogits
        gs_f32 = g if prescale else g * scale
        dq = dq + jax.lax.dot_general(gs_f32.astype(cdt), k_blk,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        # shear in f32 (Mosaic's rotate is 32-bit only), matmuls in cdt
        dqe = _unshear(gs_f32, block_q, w).astype(cdt)  # [BQ, W]
        dq = dq + jax.lax.dot_general(dqe, e_blk, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        de_ref[pl.ds(base, w), :] += jax.lax.dot_general(
            dqe, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [W, dh]
        return dq

    dq = jnp.zeros((block_q, dh), jnp.float32)
    if causal:
        n_int = _n_interior(t0, block_k, n_kv_live)
        dq = jax.lax.fori_loop(
            0, n_int, functools.partial(body, masked=False), dq)
        dq = jax.lax.fori_loop(
            n_int, n_kv_live, functools.partial(body, masked=True), dq)
    else:
        dq = jax.lax.fori_loop(
            0, n_kv_live, functools.partial(body, masked=False), dq)
    if prescale:
        dq = dq * scale  # dL/dq = s * dL/d(q*s); exact (s = 2^-k)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, e_ref, pad_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, *,
                    block_q: int, block_k: int, max_seq: int,
                    causal: bool, has_pad: bool):
    """dK and dV for one kv block (loop over contributing query blocks)."""
    ki = pl.program_id(1)
    s0 = ki * block_k
    q_len = q_ref.shape[1]
    dh = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    prescale = _prescale(dh)
    n_q = q_len // block_q
    i_min = (s0 // block_q) if causal else 0
    pref = pad_ref if has_pad else None

    def body(qi, carry, masked):
        dk, dv = carry
        t0 = qi * block_q
        q = q_ref[0, pl.ds(t0, block_q), :]
        if prescale:  # see _bwd_fused_kernel
            q = q * scale
        do = do_ref[0, pl.ds(t0, block_q), :]
        lse = lse_ref[0, pl.ds(t0, block_q), :]
        delta = delta_ref[0, pl.ds(t0, block_q), :]
        v_blk = v_ref[0, pl.ds(s0, block_k), :]
        cdt = q.dtype
        logits, _, _, _ = _tile_logits(
            q, k_ref, e_ref, pref, t0, s0, block_q, block_k, max_seq,
            causal, scale, masked=masked, prescaled=prescale)
        p = jnp.exp(logits - lse)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            (g if prescale else g * scale).astype(cdt), q,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [BK, dh]
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    zeros = jnp.zeros((block_k, dh), jnp.float32)
    carry = (zeros, zeros)
    if causal:
        # q tiles overlapping the diagonal ([i_min, qi_clear)) run the
        # masked body; tiles past it see every key in this kv block
        # unmasked (first q row t0 >= last key s0 + BK - 1). Default:
        # ALL masked — the split measured slower (see _n_interior);
        # MG_ATTN_SPLIT=1 re-enables it for A/Bs.
        if os.environ.get("MG_ATTN_SPLIT") == "1":
            qi_clear = jnp.minimum(
                (s0 + block_k + block_q - 2) // block_q, n_q)
        else:
            qi_clear = n_q
        carry = jax.lax.fori_loop(
            i_min, qi_clear, functools.partial(body, masked=True), carry)
        carry = jax.lax.fori_loop(
            qi_clear, n_q, functools.partial(body, masked=False), carry)
    else:
        carry = jax.lax.fori_loop(
            0, n_q, functools.partial(body, masked=False), carry)
    dk, dv = carry
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fwd(q, k, v, e, key_pad, block_q, block_k, causal, interpret,
         bwd_block_q, bwd_block_k):
    out, lse = _fused_fwd_impl(q, k, v, e, key_pad, block_q, block_k,
                               causal, interpret)
    return out, (q, k, v, e, key_pad, out, lse)


# backward implementation: "fused" = one-pass dQ+dK+dV+dE kernel;
# "split" = the round-1 pair (dQ+dE kernel, then dK+dV kernel). Module
# switch so bench.py can compare; "fused" measured faster (one tile-logit
# recompute instead of two).
BWD_IMPL = "fused"


def _bwd(fwd_block_q, fwd_block_k, causal, interpret, bwd_block_q,
         bwd_block_k, res, g):
    """Fused flash-style backward: O(L*dh) residuals, p recomputed per
    tile from the saved LSE; dE gathered by the inverse shear."""
    del fwd_block_q, fwd_block_k
    q, k, v, e, key_pad, out, lse = res
    if bwd_block_q <= 0 or bwd_block_k <= 0:
        bwd_block_q, bwd_block_k = autotuned_bwd_blocks(q.shape[2],
                                                        q.shape[3])
    block_q, block_k = bwd_block_q, bwd_block_k
    if q.shape[2] % block_q or q.shape[2] % block_k:
        block_q = block_k = 128  # fall back for short/odd lengths
    if q.shape[2] % block_q or q.shape[2] % block_k:
        # No valid block size divides L (e.g. a 64-long sequence the
        # forward accepted with block_q=64): launching the kernels would
        # produce an EMPTY grid and return uninitialized buffers. Take
        # the exact XLA path for the gradient instead.
        _, vjp = jax.vjp(
            lambda q_, k_, v_, e_: _xla_equivalent(q_, k_, v_, e_,
                                                   key_pad, causal),
            q, k, v, e)
        dq, dk, dv, de = vjp(g)
        return dq, dk, dv, de, None
    b, h, l, dh = q.shape
    max_seq = e.shape[0]
    bh = b * h
    slack = (block_q + block_k) if causal else (l + block_k)
    e_padded = jnp.pad(e.astype(q.dtype), ((0, slack), (0, 0)))
    has_pad = key_pad is not None
    if key_pad is None:
        key_pad_b = jnp.zeros((b, l), jnp.float32)
    else:
        key_pad_b = jnp.broadcast_to(key_pad.astype(jnp.float32), (b, l))
    padf = jnp.repeat(key_pad_b, h, axis=0)[:, None, :]

    qf = q.reshape(bh, l, dh)
    kf = k.reshape(bh, l, dh)
    vf = v.reshape(bh, l, dh)
    dof = g.reshape(bh, l, dh)
    delta = jnp.sum(dof.astype(jnp.float32)
                    * out.reshape(bh, l, dh).astype(jnp.float32),
                    axis=-1, keepdims=True)          # [bh, L, 1]

    row_spec = pl.BlockSpec((1, l, dh), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, l, 1), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((max_seq + slack, dh), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    pad_spec = pl.BlockSpec((1, 1, l), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    if BWD_IMPL == "fused":
        fused_kernel = functools.partial(
            _bwd_fused_kernel, block_q=block_q, block_k=block_k,
            max_seq=max_seq, causal=causal, has_pad=has_pad)
        dqf, dkf, dvf, de_padded = pl.pallas_call(
            fused_kernel,
            grid=(bh, l // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),    # q block
                row_spec, row_spec, e_spec, pad_spec,
                pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),    # dO block
                col_spec, col_spec,                       # lse, delta
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),    # dq per block
                row_spec,    # dk: revisited full row (accum over qi)
                row_spec,    # dv
                e_spec,      # dE: revisited across the whole grid
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bh, l, dh), q.dtype),
                jax.ShapeDtypeStruct((bh, l, dh), jnp.float32),
                jax.ShapeDtypeStruct((bh, l, dh), jnp.float32),
                jax.ShapeDtypeStruct((max_seq + slack, dh), jnp.float32),
            ),
            interpret=interpret,
        )(qf, kf, vf, e_padded, padf, dof, lse, delta)
        dq = dqf.reshape(b, h, l, dh).astype(q.dtype)
        dk = dkf.reshape(b, h, l, dh).astype(k.dtype)
        dv = dvf.reshape(b, h, l, dh).astype(v.dtype)
        de = de_padded[:max_seq].astype(e.dtype)
        return dq, dk, dv, de, None

    dq_kernel = functools.partial(
        _bwd_dq_de_kernel, block_q=block_q, block_k=block_k,
        max_seq=max_seq, causal=causal, has_pad=has_pad)
    dqf, de_padded = pl.pallas_call(
        dq_kernel,
        grid=(bh, l // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),    # q block
            row_spec, row_spec, e_spec, pad_spec,
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),    # dO block
            col_spec, col_spec,                       # lse, delta
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            e_spec,                                   # dE: revisited block
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, l, dh), q.dtype),
            jax.ShapeDtypeStruct((max_seq + slack, dh), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, e_padded, padf, dof, lse, delta)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, block_q=block_q, block_k=block_k,
        max_seq=max_seq, causal=causal, has_pad=has_pad)
    dkf, dvf = pl.pallas_call(
        dkv_kernel,
        grid=(bh, l // block_k),
        in_specs=[
            row_spec, row_spec, row_spec, e_spec, pad_spec, row_spec,
            col_spec, col_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, l, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, l, dh), v.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, e_padded, padf, dof, lse, delta)

    dq = dqf.reshape(b, h, l, dh).astype(q.dtype)
    dk = dkf.reshape(b, h, l, dh).astype(k.dtype)
    dv = dvf.reshape(b, h, l, dh).astype(v.dtype)
    de = de_padded[:max_seq].astype(e.dtype)
    return dq, dk, dv, de, None


fused_relative_attention.defvjp(_fwd, _bwd)
