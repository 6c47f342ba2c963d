"""Fused whole-layer decode step — one Pallas kernel per transformer
layer per generated token.

Why: KV-cached decode is LATENCY-bound, not FLOP-bound. The XLA path
(models/music_transformer.py EncoderLayer.decode) lowers one decode
step to ~20 tiny ops per layer (4 projections, 2 cache updates, QK^T,
rel-bias gather, softmax, PV, 2 layernorms, 2 FFN matmuls, residuals),
each paying a fixed few-microsecond latency floor at [B<=64, d=256]
shapes — measured ~50 us/layer/step on v5e while the pure
bandwidth/FLOP cost is ~5 us. This kernel runs the layer step in one
program:

    qkv projections -> stream PAST KV blocks HBM->VMEM with a length
    bound n_live = ceil(t/BK) (only the LIVE prefix of the cache is
    read — XLA reads all `cache_len` rows every step) -> online-softmax
    attention with the relative bias computed from the E table exactly
    like relative_decode_bias; the CURRENT token's K/V contribution is
    folded in analytically from the in-kernel projections, so the HBM
    cache needs no in-kernel write -> output projection -> post-LN ->
    FFN -> post-LN.

The kernel also returns the new K/V row; the caller inserts it into the
stacked cache with one dynamic_update_slice per cache (XLA keeps that
in place under scan donation). Heads are addressed as LANE SLICES of
the [B, d] activations — Mosaic cannot shape-cast the lane dimension
into (heads, dh).

Numerics: matmul/softmax accumulation in f32; intermediates quantize to
the model/cache dtype at the same points as the XLA path (projection
outputs, attention weights entering PV), so bf16 models agree with the
reference path to bf16 tolerance and f32 models to ~1e-5. Equality
against EncoderLayer.decode is locked in tests/test_pallas_decode.py.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(x_ref, t_ref, e_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wfc_ref, bfc_ref,
            ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            ln2s_ref, ln2b_ref,
            kc_ref, vc_ref,
            out_ref, knew_ref, vnew_ref,
            kbuf, vbuf, sems, *,
            li: int, num_heads: int, block_k: int, max_seq: int,
            eps: float):
    b, d = x_ref.shape
    dh = d // num_heads
    t = t_ref[0]

    x = x_ref[...].astype(jnp.float32)                    # [B, d]

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            x, w_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_ref[...]
        # the XLA path's Dense emits the model dtype here
        return y.astype(out_ref.dtype).astype(jnp.float32)

    q = proj(wq_ref, bq_ref)
    k_new = proj(wk_ref, bk_ref)
    v_new = proj(wv_ref, bv_ref)
    knew_ref[...] = k_new.astype(knew_ref.dtype)
    vnew_ref[...] = v_new.astype(vnew_ref.dtype)
    # the attention below must see the same quantization the cache
    # stores (bf16 round-trip)
    k_cur = k_new.astype(knew_ref.dtype).astype(jnp.float32)
    v_cur = v_new.astype(vnew_ref.dtype).astype(jnp.float32)

    # online-softmax over the LIVE cache prefix [0, t) only, then the
    # current token folded in analytically. Cache layout is [L, B, S, d]
    # — minor dim d keeps DMA slices 128-aligned (dh=64 minor dims get
    # lane-padded memrefs Mosaic refuses to slice); heads are VALUE lane
    # slices, which Mosaic handles fine
    n_live = (t + block_k - 1) // block_k
    scale = 1.0 / math.sqrt(dh)
    q_heads = [q[:, h * dh:(h + 1) * dh] for h in range(num_heads)]

    def body(j, carry):
        ms, ls, accs = carry
        s0 = j * block_k
        kd = pltpu.make_async_copy(
            kc_ref.at[li, :, pl.ds(s0, block_k), :], kbuf, sems.at[0])
        vd = pltpu.make_async_copy(
            vc_ref.at[li, :, pl.ds(s0, block_k), :], vbuf, sems.at[1])
        kd.start()
        vd.start()
        # relative bias rows: q . E[max_seq-1-t+s] for s <= t
        # (ops/relative_attention.relative_decode_bias); rows past the
        # live range read slack and are masked below
        base = max_seq - 1 - t + s0
        e_blk = e_ref[pl.ds(base, block_k), :].astype(jnp.float32)
        s_ids = s0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        kd.wait()
        vd.wait()
        k_all_blk = kbuf[...].astype(jnp.float32)         # [B, BK, d]
        v_all_blk = vbuf[...].astype(jnp.float32)
        new_ms, new_ls, new_accs = [], [], []
        for h in range(num_heads):
            qh = q_heads[h][:, None, :]                   # [B, 1, dh]
            k_blk = k_all_blk[:, :, h * dh:(h + 1) * dh]  # [B, BK, dh]
            logits = jnp.sum(qh * k_blk, axis=-1)         # [B, BK]
            bias = jnp.sum(qh * e_blk[None], axis=-1)     # [B, BK]
            logits = (logits + bias) * scale
            logits = jnp.where(s_ids >= t, NEG_INF, logits)
            m_new = jnp.maximum(
                ms[h], jnp.max(logits, axis=-1, keepdims=True))
            alpha = jnp.exp(ms[h] - m_new)
            p = jnp.exp(logits - m_new)
            l_new = ls[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            v_blk = v_all_blk[:, :, h * dh:(h + 1) * dh]
            # weights drop to the cache dtype entering PV (XLA parity)
            p_c = p.astype(vbuf.dtype).astype(jnp.float32)
            acc_new = (accs[h] * alpha
                       + jnp.sum(p_c[..., None] * v_blk, axis=1))
            new_ms.append(m_new)
            new_ls.append(l_new)
            new_accs.append(acc_new)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    m0 = tuple(jnp.full((b, 1), NEG_INF, jnp.float32)
               for _ in range(num_heads))
    l0 = tuple(jnp.zeros((b, 1), jnp.float32) for _ in range(num_heads))
    a0 = tuple(jnp.zeros((b, dh), jnp.float32)
               for _ in range(num_heads))
    ms, ls, accs = jax.lax.fori_loop(0, n_live, body, (m0, l0, a0))

    # current token (s == t): rel index max_seq-1, k/v from this step
    e_last = e_ref[max_seq - 1, :].astype(jnp.float32)    # [dh]
    heads_out = []
    for h in range(num_heads):
        qh = q_heads[h]                                   # [B, dh]
        kh = k_cur[:, h * dh:(h + 1) * dh]
        vh = v_cur[:, h * dh:(h + 1) * dh]
        logit_t = (jnp.sum(qh * kh, axis=-1, keepdims=True)
                   + jnp.sum(qh * e_last[None], axis=-1,
                             keepdims=True)) * scale      # [B, 1]
        m_new = jnp.maximum(ms[h], logit_t)
        alpha = jnp.exp(ms[h] - m_new)
        p_t = jnp.exp(logit_t - m_new)
        l_new = ls[h] * alpha + p_t
        p_c = p_t.astype(vbuf.dtype).astype(jnp.float32)
        acc = accs[h] * alpha + p_c * vh
        heads_out.append(acc / jnp.maximum(l_new, 1e-30))
    attn = jnp.concatenate(heads_out, axis=-1)            # [B, d]
    attn = attn.astype(out_ref.dtype).astype(jnp.float32)

    attn = jax.lax.dot_general(
        attn, wfc_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bfc_ref[...]
    attn = attn.astype(out_ref.dtype).astype(jnp.float32)

    def layer_norm(y, s_ref, b_ref):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + eps)
        return yn * s_ref[...] + b_ref[...]

    out1 = layer_norm(attn + x, ln1s_ref, ln1b_ref)
    out1 = out1.astype(out_ref.dtype).astype(jnp.float32)
    h = jax.lax.dot_general(
        out1, w1_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...]
    h = jnp.maximum(h.astype(out_ref.dtype).astype(jnp.float32), 0.0)
    ffn = jax.lax.dot_general(
        h, w2_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...]
    ffn = ffn.astype(out_ref.dtype).astype(jnp.float32)
    out_ref[...] = layer_norm(out1 + ffn, ln2s_ref,
                              ln2b_ref).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("li", "num_heads", "block_k", "interpret"))
def fused_decode_layer(x, t, e, weights, k_cache, v_cache, li: int,
                       num_heads: int, block_k: int = 128,
                       interpret: bool = False):
    """One transformer-layer decode step, fully fused.

    x: [B, d]; t: scalar int32 position; e: [max_seq, dh] f32;
    weights: dict (see models/music_transformer._layer_decode_weights);
    k_cache/v_cache: FULL stacked [L, B, S, d] caches (read-only here;
    the head dim is merged into d so the memref's minor dim stays
    128-aligned for DMA slicing); li selects the layer. Returns
    (out [B, d], k_cache, v_cache) with the new K/V row inserted at
    position t via dynamic-update-slice (in place under jit donation).
    """
    b, d = x.shape
    dh = d // num_heads
    s = k_cache.shape[2]
    max_seq = e.shape[0]
    if s % block_k:
        block_k = s  # degrade to one block for odd cache lengths
    # slack so the bias slice never reads past the table (masked anyway)
    e_pad = jnp.pad(e.astype(jnp.float32), ((0, block_k), (0, 0)))
    t_arr = jnp.asarray(t, jnp.int32).reshape(1)

    w = weights
    kernel = functools.partial(
        _kernel, li=li, num_heads=num_heads, block_k=block_k,
        max_seq=max_seq, eps=1e-6)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    # caches must stay in HBM: ANY lets the compiler pull them into VMEM
    # where the (8,128) tiling pads dh 64->128 and DMA slices of the
    # untiled 64-wide minor dim become misaligned
    anyspec = pl.BlockSpec(memory_space=pltpu.HBM)
    out, k_new, v_new = pl.pallas_call(
        kernel,
        in_specs=[
            vmem(),                                         # x
            pl.BlockSpec(memory_space=pltpu.SMEM),          # t
            vmem(),                                         # e_pad
            *([vmem()] * 16),                               # weights
            anyspec, anyspec,                               # caches
        ],
        out_specs=(vmem(), vmem(), vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((b, d), x.dtype),
            jax.ShapeDtypeStruct((b, d), k_cache.dtype),
            jax.ShapeDtypeStruct((b, d), v_cache.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, block_k, d), k_cache.dtype),
            pltpu.VMEM((b, block_k, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, t_arr, e_pad,
      w["wq"], w["bq"], w["wk"], w["bk"], w["wv"], w["bv"],
      w["wfc"], w["bfc"], w["ln1_scale"], w["ln1_bias"],
      w["ffn1_w"], w["ffn1_b"], w["ffn2_w"], w["ffn2_b"],
      w["ln2_scale"], w["ln2_bias"],
      k_cache, v_cache)
    k_row = k_new.reshape(1, b, 1, d)
    v_row = v_new.reshape(1, b, 1, d)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_row,
                                           (li, 0, t, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_row,
                                           (li, 0, t, 0))
    return out, k_cache, v_cache
