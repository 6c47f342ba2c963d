"""Fused decode step — ALL transformer layers in one Pallas kernel per
generated token.

Why: KV-cached decode is LATENCY-bound, not FLOP-bound. The XLA path
(models/music_transformer.py EncoderLayer.decode) lowers one decode
step to ~20 tiny ops per layer (4 projections, 2 cache updates, QK^T,
rel-bias gather, softmax, PV, 2 layernorms, 2 FFN matmuls, residuals),
each paying a fixed few-microsecond latency floor at [B<=64, d=256]
shapes — measured ~50 us/layer/step on v5e while the pure
bandwidth/FLOP cost is ~5 us. This kernel runs the whole stack's step
in ONE program: per layer,

    qkv projections -> stream PAST KV blocks HBM->VMEM, double-buffered,
    with a length bound n_live = ceil(t/BK) (only the LIVE prefix of the
    cache is read — XLA reads all `cache_len` rows every step) ->
    online-softmax attention with the relative bias sliced from the E
    table exactly like relative_decode_bias; the CURRENT token's K/V
    contribution is folded in analytically from the in-kernel
    projections, so the HBM cache needs no in-kernel write -> output
    projection -> post-LN -> FFN -> post-LN,

with all layer weights stacked [L, ...] in VMEM. The kernel returns the
new K/V rows for every layer; the caller inserts them with ONE
dynamic_update_slice per cache (in place under scan donation).

Mosaic constraints that shaped this (see CLAUDE.md): never reshape
across the lane dim inside a kernel; manual DMA slices need the memref
minor dim 128-aligned, so the fused cache layout is [L, B, S, d] (heads
are VALUE lane slices, which Mosaic handles fine).

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

# keys of the stacked weights dict, in kernel argument order
WEIGHT_KEYS = ("wq", "bq", "wk", "bk", "wv", "bv", "wfc", "bfc",
               "ln1_scale", "ln1_bias", "ffn1_w", "ffn1_b",
               "ffn2_w", "ffn2_b", "ln2_scale", "ln2_bias")


def _layer_step(x, li, t, n_live, e_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wfc_ref, bfc_ref,
                ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln2s_ref, ln2b_ref,
                kc_ref, vc_ref, kbuf, vbuf, sems, *,
                num_heads: int, block_k: int, max_seq: int, eps: float,
                io_dtype, hbm_limit=None,
                chunk=None, warmup: bool = True, prefetch_li=None,
                bias_li=None, cache_li=None, mm=None,
                bulk: bool = False, prefetch_when=None,
                bulk_ready: bool = False, start_col=None, j0=0):
    """One EncoderLayer decode step inside a kernel: qkv projections,
    live-prefix KV streaming with the analytic current-token term,
    output projection, post-LN FFN. Returns (x_out_f32, k_new, v_new) —
    shared by the per-step kernel (_kernel) and the whole-generation
    chunk kernel (pallas_decode_loop).

    `max_seq` is the E-table length of e_ref minus its slack rows: the
    relative row for position s at time t is e_ref[li, max_seq-1-t+s].
    hbm_limit: mask HBM rows s >= hbm_limit (defaults to t — the chunk
    kernel passes t0 because rows [t0, t) live in VMEM instead).
    chunk: optional (chunk_k_ref, chunk_v_ref, i, t0) — VMEM-resident
    rows for positions [t0, t0+i), appended after the HBM stream.
    bias_li / cache_li: independent layer indices for the bias/LN
    tables and the KV caches — the layer-GRID kernel blocks the big
    weight matrices per layer (li=0 within the block) while biases
    ride full (f32, indexed by program_id) and caches stay whole in
    HBM. Default to `li` (the resident kernels).
    mm: optional matmul hook (inp_f32, w_ref, li) -> [B, out] f32 —
    the STREAMING kernel (d_model >= 1024) passes HBM weight refs and
    an mm that manual-DMAs column tiles through a shared double
    buffer; default reads the (VMEM) ref at [li].
    bulk: kbuf/vbuf are WHOLE-CACHE [B, S, d] buffers filled by ONE
    contiguous DMA per cache (the [L, B, S, d] layout makes the [li]
    slice contiguous — a single descriptor at full HBM bandwidth,
    vs the per-block copies' batch-strided descriptors); the compute
    loop then reads VMEM slices with no per-block waits. sems: 2.
    start_col: optional [B, 1] int32 — RAGGED (continuous-batching)
    decode: row b attends only to cache rows s >= start_col[b]. The
    relative-bias index max_seq-1-t+s depends only on the shared
    distance t-s, so right-aligned slots (decode/serving.py) need
    exactly this one extra mask — E rows, DMA bounds and the loop
    trip count stay shared across rows.
    j0: first live KV block (ragged serving passes
    min(start_col)//block_k): blocks below it are start_col-masked for
    EVERY row, so the stream skips their DMA + compute entirely —
    without this the shared serving clock makes each step pay for the
    whole [0, t) prefix while the live window is only t - min(start)
    (measured 0.35 -> 1.9 ms/step as t grows 100 -> 1800 at B32).
    Static 0 compiles the exact original program."""
    if hbm_limit is None:
        hbm_limit = t
    if bias_li is None:
        bias_li = li
    if cache_li is None:
        cache_li = li
    b, d = x.shape
    dh = d // num_heads
    scale = 1.0 / math.sqrt(dh)

    def layer_norm(y, s, bias):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
        return (y - mu) * jax.lax.rsqrt(var + eps) * s + bias

    if mm is None:
        def mm(inp, w_ref, li_):
            return jax.lax.dot_general(
                inp, w_ref[li_].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    if True:  # body kept at the original indentation for a clean diff
        def proj(w_ref_, bias):
            y = mm(x, w_ref_, li) + bias
            # the XLA path's Dense emits the model dtype here
            return y.astype(io_dtype).astype(jnp.float32)

        q = proj(wq_ref, bq_ref[bias_li])
        k_new = proj(wk_ref, bk_ref[bias_li])
        v_new = proj(wv_ref, bv_ref[bias_li])
        # the attention below must see the same quantization the cache
        # stores (bf16 round-trip)
        k_cur = k_new.astype(kbuf.dtype).astype(jnp.float32)
        v_cur = v_new.astype(vbuf.dtype).astype(jnp.float32)
        q_heads = [q[:, h * dh:(h + 1) * dh] for h in range(num_heads)]

        # K-deep multi-buffered KV streaming over the live prefix
        # [0, t): depth = kbuf.shape[0] block-pair DMAs ride in flight
        # (round 4 — the remaining ~130 us/step at B8 was the
        # double-buffered wait chain; deeper rotation hides the
        # per-DMA latency behind more blocks of compute)
        depth = 1 if bulk else kbuf.shape[0]

        def _start(j, which=None):
            if which is None:
                which = cache_li
            if bulk:
                pltpu.make_async_copy(kc_ref.at[which], kbuf,
                                      sems.at[0]).start()
                pltpu.make_async_copy(vc_ref.at[which], vbuf,
                                      sems.at[1]).start()
                return
            slot = jax.lax.rem(j, depth)
            pltpu.make_async_copy(
                kc_ref.at[which, :, pl.ds(j * block_k, block_k), :],
                kbuf.at[slot], sems.at[slot]).start()
            pltpu.make_async_copy(
                vc_ref.at[which, :, pl.ds(j * block_k, block_k), :],
                vbuf.at[slot], sems.at[depth + slot]).start()

        if bulk:
            # bulk copies are ALWAYS caller-issued (the grid-bulk
            # kernel's entry/prefetch hooks); a warmup start here would
            # double-issue the DMA the previous layer already started
            assert not warmup, "bulk mode requires caller-issued copies"
            if not bulk_ready:
                # bulk_ready: the buffer was filled ONCE for the whole
                # call (loop kernel's per-launch prefix copy) — no
                # per-layer wait to consume

                @pl.when(n_live > 0)
                def _bulk_wait():
                    pltpu.make_async_copy(kc_ref.at[cache_li], kbuf,
                                          sems.at[0]).wait()
                    pltpu.make_async_copy(vc_ref.at[cache_li], vbuf,
                                          sems.at[1]).wait()
        elif warmup:
            # cross-layer pipelining (warmup=False): the CALLER started
            # this layer's first depth-1 blocks earlier, hiding the DMA
            # latency behind the previous layer's tail compute / embed
            for jj in range(depth - 1):
                @pl.when(j0 + jj < n_live)
                def _warmup(jj=jj):
                    _start(j0 + jj)

        def body(j, carry):
            ms, ls, accs = carry
            s0 = j * block_k

            if not bulk:
                slot = jax.lax.rem(j, depth)

                # keep `depth` block pairs in flight: block j+depth-1
                # lands in slot (j-1) % depth, consumed last iteration
                @pl.when(j + (depth - 1) < n_live)
                def _prefetch():
                    _start(j + (depth - 1))

            # relative bias rows: q . E[li, max_seq-1-t+s] for s <= t
            # (ops/relative_attention.relative_decode_bias); rows past
            # the live range read slack and are masked below
            base = max_seq - 1 - t + s0
            e_blk = e_ref[li, pl.ds(base, block_k), :].astype(
                jnp.float32)
            s_ids = s0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1)
            if bulk:
                k_all_blk = kbuf[:, pl.ds(s0, block_k), :].astype(
                    jnp.float32)                          # [B, BK, d]
                v_all_blk = vbuf[:, pl.ds(s0, block_k), :].astype(
                    jnp.float32)
            else:
                pltpu.make_async_copy(
                    kc_ref.at[cache_li, :, pl.ds(s0, block_k), :],
                    kbuf.at[slot], sems.at[slot]).wait()
                pltpu.make_async_copy(
                    vc_ref.at[cache_li, :, pl.ds(s0, block_k), :],
                    vbuf.at[slot], sems.at[depth + slot]).wait()
                k_all_blk = kbuf[slot].astype(jnp.float32)  # [B, BK, d]
                v_all_blk = vbuf[slot].astype(jnp.float32)
            new_ms, new_ls, new_accs = [], [], []
            for h in range(num_heads):
                qh = q_heads[h][:, None, :]               # [B, 1, dh]
                k_blk = k_all_blk[:, :, h * dh:(h + 1) * dh]
                logits = jnp.sum(qh * k_blk, axis=-1)     # [B, BK]
                bias = jnp.sum(qh * e_blk[None], axis=-1)
                logits = (logits + bias) * scale
                logits = jnp.where(s_ids >= hbm_limit, NEG_INF, logits)
                if start_col is not None:
                    # ragged lower bound: [B,1] vs [1,BK] -> [B,BK]
                    logits = jnp.where(s_ids < start_col, NEG_INF,
                                       logits)
                m_new = jnp.maximum(
                    ms[h], jnp.max(logits, axis=-1, keepdims=True))
                alpha = jnp.exp(ms[h] - m_new)
                p = jnp.exp(logits - m_new)
                l_new = (ls[h] * alpha
                         + jnp.sum(p, axis=-1, keepdims=True))
                v_blk = v_all_blk[:, :, h * dh:(h + 1) * dh]
                # weights drop to the cache dtype entering PV
                p_c = p.astype(vbuf.dtype).astype(jnp.float32)
                acc_new = (accs[h] * alpha
                           + jnp.sum(p_c[..., None] * v_blk, axis=1))
                new_ms.append(m_new)
                new_ls.append(l_new)
                new_accs.append(acc_new)
            return tuple(new_ms), tuple(new_ls), tuple(new_accs)

        m0 = tuple(jnp.full((b, 1), NEG_INF, jnp.float32)
                   for _ in range(num_heads))
        l0 = tuple(jnp.zeros((b, 1), jnp.float32)
                   for _ in range(num_heads))
        a0 = tuple(jnp.zeros((b, dh), jnp.float32)
                   for _ in range(num_heads))
        ms, ls, accs = jax.lax.fori_loop(j0, n_live, body, (m0, l0, a0))

        if prefetch_li is not None and bulk:
            # the single bulk buffer is fully consumed after the loop:
            # start the NEXT layer's whole-cache copies now so they ride
            # under this layer's tail (output proj, LN, FFN) + the next
            # layer's qkv projections. prefetch_when gates the last
            # grid step (no layer follows — an unwaited DMA must not
            # outlive the kernel)
            pred = n_live > 0
            if prefetch_when is not None:
                pred = pred & prefetch_when

            @pl.when(pred)
            def _prefetch_next_bulk():
                _start(0, which=prefetch_li)
        elif prefetch_li is not None:
            # start the NEXT layer's first depth-1 blocks now: all
            # stream buffers are consumed, and the DMAs overlap this
            # layer's tail (current-token term, output proj, LN, FFN)
            for jj in range(depth - 1):
                @pl.when(j0 + jj < n_live)
                def _prefetch_next_layer(jj=jj):
                    _start(j0 + jj, which=prefetch_li)

        if chunk is not None:
            # VMEM-resident rows for positions [t0, t0+i) — the current
            # launch's freshly generated tokens (pallas_decode_loop)
            ck_ref, cv_ref, chunk_i, chunk_t0 = chunk
            c_len = ck_ref.shape[2]
            ck = ck_ref[li].astype(jnp.float32)           # [B, C, d]
            cv = cv_ref[li].astype(jnp.float32)
            j_ids = jax.lax.broadcasted_iota(jnp.int32, (1, c_len), 1)
            # E rows for s = t0 + j: base max_seq-1-t+t0 (slack-padded)
            e_blk = e_ref[li, pl.ds(max_seq - 1 - t + chunk_t0, c_len),
                          :].astype(jnp.float32)
            new_ms, new_ls, new_accs = [], [], []
            for h in range(num_heads):
                qh = q_heads[h][:, None, :]
                k_blk = ck[:, :, h * dh:(h + 1) * dh]
                logits = jnp.sum(qh * k_blk, axis=-1)     # [B, C]
                bias = jnp.sum(qh * e_blk[None], axis=-1)
                logits = (logits + bias) * scale
                logits = jnp.where(j_ids >= chunk_i, NEG_INF, logits)
                m_new = jnp.maximum(
                    ms[h], jnp.max(logits, axis=-1, keepdims=True))
                alpha = jnp.exp(ms[h] - m_new)
                p = jnp.exp(logits - m_new)
                l_new = (ls[h] * alpha
                         + jnp.sum(p, axis=-1, keepdims=True))
                v_blk = cv[:, :, h * dh:(h + 1) * dh]
                # quantize to the CACHE dtype (the chunk buffers ride
                # f32 — Mosaic crashes on dynamic sublane access to
                # bf16 — but hold bf16-rounded values)
                p_c = p.astype(kbuf.dtype).astype(jnp.float32)
                acc_new = (accs[h] * alpha
                           + jnp.sum(p_c[..., None] * v_blk, axis=1))
                new_ms.append(m_new)
                new_ls.append(l_new)
                new_accs.append(acc_new)
            ms, ls, accs = tuple(new_ms), tuple(new_ls), tuple(new_accs)

        # current token (s == t): rel index max_seq-1, K/V from this step
        e_last = e_ref[li, max_seq - 1, :].astype(jnp.float32)
        heads_out = []
        for h in range(num_heads):
            qh = q_heads[h]
            kh = k_cur[:, h * dh:(h + 1) * dh]
            vh = v_cur[:, h * dh:(h + 1) * dh]
            logit_t = (jnp.sum(qh * kh, axis=-1, keepdims=True)
                       + jnp.sum(qh * e_last[None], axis=-1,
                                 keepdims=True)) * scale
            m_new = jnp.maximum(ms[h], logit_t)
            alpha = jnp.exp(ms[h] - m_new)
            p_t = jnp.exp(logit_t - m_new)
            l_new = ls[h] * alpha + p_t
            p_c = p_t.astype(vbuf.dtype).astype(jnp.float32)
            acc = accs[h] * alpha + p_c * vh
            heads_out.append(acc / jnp.maximum(l_new, 1e-30))
        attn = jnp.concatenate(heads_out, axis=-1)        # [B, d]
        attn = attn.astype(io_dtype).astype(jnp.float32)

        attn = mm(attn, wfc_ref, li) + bfc_ref[bias_li]
        attn = attn.astype(io_dtype).astype(jnp.float32)

        out1 = layer_norm(attn + x, ln1s_ref[bias_li], ln1b_ref[bias_li])
        out1 = out1.astype(io_dtype).astype(jnp.float32)
        hh = mm(out1, w1_ref, li) + b1_ref[bias_li]
        hh = jnp.maximum(hh.astype(io_dtype).astype(jnp.float32),
                         0.0)
        ffn = mm(hh, w2_ref, li) + b2_ref[bias_li]
        ffn = ffn.astype(io_dtype).astype(jnp.float32)
        x = layer_norm(out1 + ffn, ln2s_ref[bias_li], ln2b_ref[bias_li])
        x = x.astype(io_dtype).astype(jnp.float32)
    return x, k_new, v_new


# trace-time ablation knob for the chunk kernel (perf debugging only):
# "norolls" keeps the QE dot but skips the band shifts; "nobias" skips
# the relative bias entirely; "noqe" skips only the wide QE dots
import os as _os

_CHUNK_ABLATE = _os.environ.get("MG_CHUNK_ABLATE", "")


def _band_left_roll(x, c: int, extra: int):
    """Left-roll row r of x by extra + (c-1 - r%c) lanes — the banded
    relative-bias extraction for CHUNK attention (one wide QE dot, then
    per-row shifts align each query's E window; exact circular rolls
    with bit-masked selects, the pallas_attention shear pattern).
    x: [R, W] f32 with R a multiple of c; c a power of two."""
    if _CHUNK_ABLATE == "norolls":
        return x
    w = x.shape[1]
    if extra:
        x = pltpu.roll(x, w - extra, 1)
    shift = (c - 1) - jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, x.shape, 0), c)
    b = 1
    while b < c:
        rolled = pltpu.roll(x, w - b, 1)
        x = jnp.where((shift & b) != 0, rolled, x)
        b *= 2
    return x


def _layer_chunk_step(x, li, t, n_live, e_ref,
                      wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                      wfc_ref, bfc_ref,
                      ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      ln2s_ref, ln2b_ref,
                      kc_ref, vc_ref, kbuf, vbuf, sems, *,
                      num_heads: int, block_k: int, max_seq: int,
                      eps: float, io_dtype, chunk_c: int,
                      warmup: bool = True, prefetch_li=None,
                      bias_li=None, cache_li=None, mm=None):
    """One EncoderLayer CHUNK-VERIFY step inside a kernel (speculative
    decoding): C=chunk_c queries per batch element at absolute positions
    t..t+C-1 attend jointly over the live cache prefix [0, t) plus the
    chunk's own keys (causal within the chunk) — position-by-position
    equal to C sequential `_layer_step` calls, one weight pass total.

    x: [B*C, d] (b-major rows); same weight/cache/stream-buffer
    arguments and DMA machinery as _layer_step. The relative bias rides
    ONE wide QE dot per head per block, then _band_left_roll aligns each
    query row's E window (rows r use shift c-1 - r%c). Requires
    max_seq >= 128, t + C <= max_seq (caller-enforced) and C a power of
    two in [8, 128] (f32 sublane tile floor). Returns
    (x_out_f32 [B*C, d], k_new, v_new)."""
    if bias_li is None:
        bias_li = li
    if cache_li is None:
        cache_li = li
    r, d = x.shape
    c = chunk_c
    b = r // c
    dh = d // num_heads
    scale = 1.0 / math.sqrt(dh)

    def layer_norm(y, s_, bias):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
        return (y - mu) * jax.lax.rsqrt(var + eps) * s_ + bias

    if mm is None:
        def mm(inp, w_ref, li_):
            return jax.lax.dot_general(
                inp, w_ref[li_].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    def proj(w_ref_, bias):
        y = mm(x, w_ref_, li) + bias
        return y.astype(io_dtype).astype(jnp.float32)

    q = proj(wq_ref, bq_ref[bias_li])
    k_new = proj(wk_ref, bk_ref[bias_li])
    v_new = proj(wv_ref, bv_ref[bias_li])
    k_cur = k_new.astype(kbuf.dtype).astype(jnp.float32)
    v_cur = v_new.astype(vbuf.dtype).astype(jnp.float32)

    def dot_t(a, bm):
        # [m, dh] x [n, dh] -> [m, n] (contract the trailing dim)
        return jax.lax.dot_general(
            a, bm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_n(a, bm):
        # [m, k] x [k, n] -> [m, n]
        return jax.lax.dot_general(
            a, bm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    depth = kbuf.shape[0]

    def _start(j, which=None):
        if which is None:
            which = cache_li
        slot = jax.lax.rem(j, depth)
        pltpu.make_async_copy(
            kc_ref.at[which, :, pl.ds(j * block_k, block_k), :],
            kbuf.at[slot], sems.at[slot]).start()
        pltpu.make_async_copy(
            vc_ref.at[which, :, pl.ds(j * block_k, block_k), :],
            vbuf.at[slot], sems.at[depth + slot]).start()

    if warmup:
        for jj in range(depth - 1):
            @pl.when(jj < n_live)
            def _warmup(jj=jj):
                _start(jj)

    wide = block_k + 128  # QE window: band shifts stay within +127

    def body(j, carry):
        ms, ls, accs = carry
        s0 = j * block_k
        slot = jax.lax.rem(j, depth)

        @pl.when(j + (depth - 1) < n_live)
        def _prefetch():
            _start(j + (depth - 1))

        # wide E window starting c-1 rows EARLY: row r's band is the
        # per-row left shift (c-1 - r%c) of one shared QE dot
        base = max_seq - 1 - t + s0 - (c - 1)
        e_blk = e_ref[li, pl.ds(base, wide), :].astype(jnp.float32)
        s_ids = s0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        pltpu.make_async_copy(
            kc_ref.at[cache_li, :, pl.ds(s0, block_k), :],
            kbuf.at[slot], sems.at[slot]).wait()
        pltpu.make_async_copy(
            vc_ref.at[cache_li, :, pl.ds(s0, block_k), :],
            vbuf.at[slot], sems.at[depth + slot]).wait()
        k_all_blk = kbuf[slot].astype(jnp.float32)        # [B, BK, d]
        v_all_blk = vbuf[slot].astype(jnp.float32)
        if _CHUNK_ABLATE in ("nobias", "noqe"):
            bands = None
        else:
            # one roll set for ALL heads: the per-head QE tiles ride
            # side by side along LANES (rolls cost per OP, so H tiles
            # -> 1 wide tile cuts the band cost ~H-fold; shifts <= c-1
            # never cross the W-lane tile boundaries since the band
            # keeps only BK <= W - c + 1 lanes per tile)
            qe = jnp.concatenate(
                [dot_t(q[:, h * dh:(h + 1) * dh], e_blk)
                 for h in range(num_heads)], axis=1)      # [R, H*W]
            bands = _band_left_roll(qe, c, 0)
        new_ms, new_ls, new_accs = [], [], []
        for h in range(num_heads):
            qh = q[:, h * dh:(h + 1) * dh]                # [R, dh]
            if bands is None:
                bias = 0.0
            else:
                bias = bands[:, h * wide:h * wide + block_k]  # [R, BK]
            if b == 1:
                logits = dot_t(qh, k_all_blk[0, :, h * dh:(h + 1) * dh])
            else:
                logits = jnp.concatenate([
                    dot_t(qh[bi * c:(bi + 1) * c],
                          k_all_blk[bi, :, h * dh:(h + 1) * dh])
                    for bi in range(b)], axis=0)          # [R, BK]
            logits = (logits + bias) * scale
            logits = jnp.where(s_ids >= t, NEG_INF, logits)
            m_new = jnp.maximum(
                ms[h], jnp.max(logits, axis=-1, keepdims=True))
            alpha = jnp.exp(ms[h] - m_new)
            p = jnp.exp(logits - m_new)
            l_new = (ls[h] * alpha
                     + jnp.sum(p, axis=-1, keepdims=True))
            p_c = p.astype(vbuf.dtype).astype(jnp.float32)
            if b == 1:
                pv = dot_n(p_c, v_all_blk[0, :, h * dh:(h + 1) * dh])
            else:
                pv = jnp.concatenate([
                    dot_n(p_c[bi * c:(bi + 1) * c],
                          v_all_blk[bi, :, h * dh:(h + 1) * dh])
                    for bi in range(b)], axis=0)          # [R, dh]
            new_ms.append(m_new)
            new_ls.append(l_new)
            new_accs.append(accs[h] * alpha + pv)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    m0 = tuple(jnp.full((r, 1), NEG_INF, jnp.float32)
               for _ in range(num_heads))
    l0 = tuple(jnp.zeros((r, 1), jnp.float32) for _ in range(num_heads))
    a0 = tuple(jnp.zeros((r, dh), jnp.float32)
               for _ in range(num_heads))
    ms, ls, accs = jax.lax.fori_loop(0, n_live, body, (m0, l0, a0))

    if prefetch_li is not None:
        for jj in range(depth - 1):
            @pl.when(jj < n_live)
            def _prefetch_next_layer(jj=jj):
                _start(jj, which=prefetch_li)

    # in-chunk attention: keys/values are THIS chunk's own rows; query
    # row c sees keys j <= c (its own token included — E row max_seq-1
    # at j == c, exactly the step kernel's current-token term). The
    # roll's lane wrap-around only lands in the j > c masked region.
    e_tail = e_ref[li, pl.ds(max_seq - 128, 128), :].astype(jnp.float32)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    c_ids = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (r, c), 0), c)
    if _CHUNK_ABLATE in ("nobias", "noqe"):
        bands_in = None
    else:
        # lane-concat + one roll set, as in the prefix band; the extra
        # (128-c)-lane shift crosses tile boundaries only in the
        # j > c_r region the causal mask hides
        qe_in = jnp.concatenate(
            [dot_t(q[:, h * dh:(h + 1) * dh], e_tail)
             for h in range(num_heads)], axis=1)          # [R, H*128]
        bands_in = _band_left_roll(qe_in, c, 128 - c)
    heads_out = []
    for h in range(num_heads):
        qh = q[:, h * dh:(h + 1) * dh]
        if bands_in is None:
            bias = 0.0
        else:
            bias = bands_in[:, h * 128:h * 128 + c]
        if b == 1:
            logits = dot_t(qh, k_cur[:, h * dh:(h + 1) * dh])
        else:
            logits = jnp.concatenate([
                dot_t(qh[bi * c:(bi + 1) * c],
                      k_cur[bi * c:(bi + 1) * c, h * dh:(h + 1) * dh])
                for bi in range(b)], axis=0)              # [R, C]
        logits = (logits + bias) * scale
        logits = jnp.where(j_ids > c_ids, NEG_INF, logits)
        m_new = jnp.maximum(
            ms[h], jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(ms[h] - m_new)
        p = jnp.exp(logits - m_new)
        l_new = ls[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        p_c = p.astype(vbuf.dtype).astype(jnp.float32)
        if b == 1:
            pv = dot_n(p_c, v_cur[:, h * dh:(h + 1) * dh])
        else:
            pv = jnp.concatenate([
                dot_n(p_c[bi * c:(bi + 1) * c],
                      v_cur[bi * c:(bi + 1) * c, h * dh:(h + 1) * dh])
                for bi in range(b)], axis=0)
        acc = accs[h] * alpha + pv
        heads_out.append(acc / jnp.maximum(l_new, 1e-30))
    attn = jnp.concatenate(heads_out, axis=-1)            # [R, d]
    attn = attn.astype(io_dtype).astype(jnp.float32)

    attn = mm(attn, wfc_ref, li) + bfc_ref[bias_li]
    attn = attn.astype(io_dtype).astype(jnp.float32)
    out1 = layer_norm(attn + x, ln1s_ref[bias_li], ln1b_ref[bias_li])
    out1 = out1.astype(io_dtype).astype(jnp.float32)
    hh = mm(out1, w1_ref, li) + b1_ref[bias_li]
    hh = jnp.maximum(hh.astype(io_dtype).astype(jnp.float32), 0.0)
    ffn = mm(hh, w2_ref, li) + b2_ref[bias_li]
    ffn = ffn.astype(io_dtype).astype(jnp.float32)
    x = layer_norm(out1 + ffn, ln2s_ref[bias_li], ln2b_ref[bias_li])
    x = x.astype(io_dtype).astype(jnp.float32)
    return x, k_new, v_new


def start_block0(kc_ref, vc_ref, li, kbuf, vbuf, sems, block_k,
                 n_live, j0=0):
    """Kick off layer li's first depth-1 KV block DMAs (depth =
    kbuf.shape[0]) starting at block j0 — used by the kernels'
    entry/step preambles so the copies overlap non-stream compute.
    With a STATIC j0 of 0 the callers' `n_live > 0` gate covers block
    0; a traced j0 (ragged serving floor) may equal n_live (empty live
    window), so every start is gated — an unwaited DMA must not
    outlive the kernel."""
    depth = kbuf.shape[0]
    static0 = isinstance(j0, int) and j0 == 0
    for jj in range(depth - 1):
        def _go(jj=jj):
            # block j0+jj lands in slot rem(j0+jj, depth) — the slot
            # _layer_step's wait derives from the block index
            slot = jj if static0 else jax.lax.rem(j0 + jj, depth)
            pltpu.make_async_copy(
                kc_ref.at[li, :, pl.ds((j0 + jj) * block_k, block_k), :],
                kbuf.at[slot], sems.at[slot]).start()
            pltpu.make_async_copy(
                vc_ref.at[li, :, pl.ds((j0 + jj) * block_k, block_k), :],
                vbuf.at[slot], sems.at[depth + slot]).start()
        if jj == 0 and static0:
            _go()
        else:
            pl.when(j0 + jj < n_live)(_go)


def _kernel(x_ref, t_ref, start_ref, e_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wfc_ref, bfc_ref,
            ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            ln2s_ref, ln2b_ref,
            kc_ref, vc_ref,
            out_ref, knew_ref, vnew_ref,
            kbuf, vbuf, sems, *,
            num_layers: int, num_heads: int, block_k: int, max_seq: int,
            eps: float, ragged: bool = False):
    t = t_ref[0]
    start_col = start_ref[...] if ragged else None
    n_live = (t + block_k - 1) // block_k
    j0 = t_ref[1] // block_k if ragged else 0

    # cross-layer DMA pipelining: layer 0's first block starts NOW and
    # each layer prefetches its successor's first block before its tail
    # compute — the block-0 wait latency hides behind real work instead
    # of serializing 6x per step
    @pl.when(n_live > 0)
    def _entry():
        start_block0(kc_ref, vc_ref, 0, kbuf, vbuf, sems, block_k,
                     n_live, j0=j0)

    x = x_ref[...].astype(jnp.float32)                    # [B, d]
    for li in range(num_layers):
        x, k_new, v_new = _layer_step(
            x, li, t, n_live, e_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wfc_ref, bfc_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, ln2s_ref, ln2b_ref,
            kc_ref, vc_ref, kbuf, vbuf, sems,
            num_heads=num_heads, block_k=block_k, max_seq=max_seq,
            eps=eps, io_dtype=out_ref.dtype, warmup=False,
            prefetch_li=li + 1 if li + 1 < num_layers else None,
            start_col=start_col, j0=j0)
        knew_ref[li] = k_new.astype(knew_ref.dtype)
        vnew_ref[li] = v_new.astype(vnew_ref.dtype)
    out_ref[...] = x.astype(out_ref.dtype)


def _kernel_grid(x_ref, t_ref, start_ref, e_ref,
                 wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                 wfc_ref, bfc_ref,
                 ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 ln2s_ref, ln2b_ref,
                 kc_ref, vc_ref,
                 out_ref, knew_ref, vnew_ref,
                 xcar, kbuf, vbuf, sems, *,
                 num_layers: int, num_heads: int, block_k: int,
                 max_seq: int, eps: float, ragged: bool = False):
    """Layer-GRID decode step for models whose stacked weights exceed
    VMEM residency (d_model >= 512): grid=(L,), Mosaic auto-pipelines
    each layer's weight/E blocks HBM->VMEM while the previous layer
    computes; the activation carries across grid steps in a VMEM
    scratch. Biases/LN ride full as f32 (dynamic sublane reads crash on
    bf16) and the caches stay whole in HBM."""
    li = pl.program_id(0)
    t = t_ref[0]
    start_col = start_ref[...] if ragged else None
    n_live = (t + block_k - 1) // block_k
    j0 = t_ref[1] // block_k if ragged else 0
    # xcar is uninitialized at li == 0; where() is an elementwise select
    x = jnp.where(li == 0, x_ref[...].astype(jnp.float32), xcar[...])
    x, k_new, v_new = _layer_step(
        x, 0, t, n_live, e_ref,
        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
        wfc_ref, bfc_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, ln2s_ref, ln2b_ref,
        kc_ref, vc_ref, kbuf, vbuf, sems,
        num_heads=num_heads, block_k=block_k, max_seq=max_seq,
        eps=eps, io_dtype=out_ref.dtype, bias_li=li, cache_li=li,
        start_col=start_col, j0=j0)
    knew_ref[0] = k_new.astype(knew_ref.dtype)
    vnew_ref[0] = v_new.astype(vnew_ref.dtype)
    xcar[...] = x
    out_ref[...] = x.astype(out_ref.dtype)


def _kernel_grid_bulk(x_ref, t_ref, start_ref, e_ref,
                      wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                      wfc_ref, bfc_ref,
                      ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      ln2s_ref, ln2b_ref,
                      kc_ref, vc_ref,
                      out_ref, knew_ref, vnew_ref,
                      xcar, kbuf, vbuf, sems, *,
                      num_layers: int, num_heads: int, block_k: int,
                      max_seq: int, eps: float, ragged: bool = False):
    """Layer-grid decode step with BULK whole-cache KV copies: one
    contiguous [B, S, d] DMA per cache per layer (the [L, B, S, d]
    layout makes the [li] slice contiguous — one descriptor at full
    HBM bandwidth, where the live-prefix per-block copies pay a
    batch-strided descriptor chain each). Layer l+1's copies are
    issued during layer l's tail compute, so the per-layer wait is
    ~max(0, transfer - tail compute). Trades read amplification (the
    whole cache_len, not the live prefix) for wait-chain elimination —
    the win regime is small B*S*d (VMEM gate in select_decode_config);
    per-block streaming stays the fallback."""
    li = pl.program_id(0)
    t = t_ref[0]
    start_col = start_ref[...] if ragged else None
    n_live = (t + block_k - 1) // block_k

    @pl.when((li == 0) & (n_live > 0))
    def _first():
        pltpu.make_async_copy(kc_ref.at[0], kbuf, sems.at[0]).start()
        pltpu.make_async_copy(vc_ref.at[0], vbuf, sems.at[1]).start()

    x = jnp.where(li == 0, x_ref[...].astype(jnp.float32), xcar[...])
    x, k_new, v_new = _layer_step(
        x, 0, t, n_live, e_ref,
        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
        wfc_ref, bfc_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, ln2s_ref, ln2b_ref,
        kc_ref, vc_ref, kbuf, vbuf, sems,
        num_heads=num_heads, block_k=block_k, max_seq=max_seq,
        eps=eps, io_dtype=out_ref.dtype, bias_li=li, cache_li=li,
        bulk=True, warmup=False,
        prefetch_li=jnp.minimum(li + 1, num_layers - 1),
        prefetch_when=li + 1 < num_layers, start_col=start_col,
        j0=t_ref[1] // block_k if ragged else 0)
    knew_ref[0] = k_new.astype(knew_ref.dtype)
    vnew_ref[0] = v_new.astype(vnew_ref.dtype)
    xcar[...] = x
    out_ref[...] = x.astype(out_ref.dtype)


def _make_stream_mm(li, w_tile, wbuf_a, wbuf_b, wsems, scale_of):
    """The weight-STREAMING matmul hook shared by _kernel_grid_stream
    and its chunk-verify twin: every matmul pulls [d_in, w_tile] column
    tiles of an HBM weight ref through one shared double buffer
    (wbuf_a for d-row tiles, wbuf_b for the ffn2's d/2-row tiles),
    overlapped with the previous tile's compute. scale_of: optional
    {id(w_ref): scale_ref} for int8 weight-only dequantization."""

    def mm(inp, w_ref, _li):
        d_in = w_ref.shape[1]
        d_out = w_ref.shape[2]
        n = d_out // w_tile
        buf = wbuf_a if d_in == wbuf_a.shape[1] else wbuf_b
        s_ref = scale_of.get(id(w_ref))
        # whole-row read indexed by program_id (the bias pattern —
        # a [ds(li,1), ds(col,T)] 2-D dynamic slice crashes the
        # Mosaic compile helper); tiles take static lane slices
        srow = s_ref[li] if s_ref is not None else None

        def start(j, slot):
            pltpu.make_async_copy(
                w_ref.at[li, :, pl.ds(j * w_tile, w_tile)],
                buf.at[slot], wsems.at[slot]).start()

        start(0, 0)
        parts = []
        for j in range(n):
            slot = j % 2
            if j + 1 < n:
                start(j + 1, 1 - slot)
            pltpu.make_async_copy(
                w_ref.at[li, :, pl.ds(j * w_tile, w_tile)],
                buf.at[slot], wsems.at[slot]).wait()
            y = jax.lax.dot_general(
                inp, buf[slot].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if srow is not None:
                y = y * jax.lax.slice(srow, (j * w_tile,),
                                      ((j + 1) * w_tile,))[None, :]
            parts.append(y)
        return parts[0] if n == 1 else jnp.concatenate(parts, axis=-1)

    return mm


def _kernel_grid_stream(x_ref, t_ref, start_ref, e_ref,
                        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                        wfc_ref, bfc_ref,
                        ln1s_ref, ln1b_ref, w1_ref, b1_ref,
                        w2_ref, b2_ref, ln2s_ref, ln2b_ref,
                        kc_ref, vc_ref,
                        *rest,
                        num_layers: int, num_heads: int, block_k: int,
                        max_seq: int, eps: float, w_tile: int,
                        quant: bool = False, ragged: bool = False):
    """Layer-grid decode step with STREAMED weight matrices for models
    whose per-layer weights exceed even the grid variant's double
    buffer (d_model >= 1024: ~12.6 MB/layer bf16, 2x > 16 MB VMEM).

    The six big matrices stay whole in HBM; every matmul pulls [d_in,
    w_tile] column tiles through ONE shared double buffer (wbuf_a for
    d-row tiles, wbuf_b for the ffn2's d/2-row tiles) overlapped with
    the previous tile's [B, d_in] x [d_in, w_tile] compute. Per step
    the full weight set still crosses HBM->VMEM once — that bandwidth
    is the d1024 decode floor — but VMEM holds only 2 tiles of it, and
    biases/E/caches behave exactly like _kernel_grid.

    quant=True (weight-only int8, quantize_stream_weights): `rest`
    leads with six [L, d_out] f32 scale refs (wq/wk/wv/wfc/ffn1/ffn2
    order); the streamed tiles are int8 (HALF the HBM traffic) and
    each tile's dot is followed by one [B, w_tile] scale multiply."""
    if quant:
        (sq_ref, sk_ref, sv_ref, sfc_ref, s1_ref, s2_ref,
         out_ref, knew_ref, vnew_ref,
         xcar, kbuf, vbuf, sems, wbuf_a, wbuf_b, wsems) = rest
    else:
        (out_ref, knew_ref, vnew_ref,
         xcar, kbuf, vbuf, sems, wbuf_a, wbuf_b, wsems) = rest
    li = pl.program_id(0)
    t = t_ref[0]
    start_col = start_ref[...] if ragged else None
    n_live = (t + block_k - 1) // block_k
    scale_of = ({id(wq_ref): sq_ref, id(wk_ref): sk_ref,
                 id(wv_ref): sv_ref, id(wfc_ref): sfc_ref,
                 id(w1_ref): s1_ref, id(w2_ref): s2_ref}
                if quant else {})
    mm = _make_stream_mm(li, w_tile, wbuf_a, wbuf_b, wsems, scale_of)

    x = jnp.where(li == 0, x_ref[...].astype(jnp.float32), xcar[...])
    x, k_new, v_new = _layer_step(
        x, 0, t, n_live, e_ref,
        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
        wfc_ref, bfc_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, ln2s_ref, ln2b_ref,
        kc_ref, vc_ref, kbuf, vbuf, sems,
        num_heads=num_heads, block_k=block_k, max_seq=max_seq,
        eps=eps, io_dtype=out_ref.dtype, bias_li=li, cache_li=li,
        mm=mm, start_col=start_col,
        j0=t_ref[1] // block_k if ragged else 0)
    knew_ref[0] = k_new.astype(knew_ref.dtype)
    vnew_ref[0] = v_new.astype(vnew_ref.dtype)
    xcar[...] = x
    out_ref[...] = x.astype(out_ref.dtype)


def decode_vmem_bytes(num_layers: int, d: int, vocab: int,
                      max_seq: int, dh: int, block_k: int = 128,
                      batch: int = 8, bytes_per: int = 2) -> int:
    """Rough VMEM footprint of the fused step (weights + E + buffers) —
    the model's auto impl falls back to XLA when this exceeds ~12 MB."""
    w = num_layers * (4 * d * d + 2 * d * (d // 2)) * bytes_per
    e = num_layers * (max_seq + block_k) * dh * 4
    bufs = 2 * 2 * batch * block_k * d * bytes_per
    return w + e + bufs


def decode_grid_vmem_bytes(d: int, max_seq: int, dh: int,
                           block_k: int = 128, batch: int = 8,
                           bytes_per: int = 2) -> int:
    """VMEM footprint of the layer-GRID variant (per-layer weight/E
    blocks, double-buffered by the pipeline) — models whose resident
    estimate overflows use this gate instead (d_model=512 fits; 1024
    does not and falls back to XLA)."""
    w = 2 * (4 * d * d + 2 * d * (d // 2)) * bytes_per
    e = 2 * (max_seq + block_k) * dh * 4
    bufs = 2 * 2 * batch * block_k * d * bytes_per
    return w + e + bufs


def decode_stream_vmem_bytes(d: int, max_seq: int, dh: int,
                             w_tile: int = 256, block_k: int = 32,
                             batch: int = 8, bytes_per: int = 2) -> int:
    """VMEM footprint of the weight-STREAMING grid variant
    (_kernel_grid_stream): two shared column-tile double buffers + one
    layer's E block (double-buffered) + f32 biases + the KV stream
    buffers. Weights live in HBM, so this stays small at any d_model —
    the d1024 rung that used to fall back to XLA."""
    wbufs = 2 * d * w_tile * bytes_per + 2 * (d // 2) * w_tile * bytes_per
    e = 2 * (max_seq + block_k) * dh * 4
    bufs = 2 * 2 * batch * block_k * d * bytes_per
    return wbufs + e + bufs


# scoped-VMEM budget every selection below must fit (conservative: v5e
# grants 16 MiB scoped; 2 MiB headroom for Mosaic's own spills)
_VMEM_BUDGET = 14 * 1024 * 1024

# the six streamed weight matrices (3-D entries of WEIGHT_KEYS)
_MATRIX_KEYS = ("wq", "wk", "wv", "wfc", "ffn1_w", "ffn2_w")


def quantize_stream_weights(weights):
    """Weight-only int8 quantization for the STREAMING decode kernel
    (d_model >= 1024): per-(layer, output-channel) symmetric scales on
    the six big matrices — halves the HBM->VMEM weight traffic that is
    the streaming kernel's floor. Biases/LN stay in their dtype.
    Returns (qweights, scales) where scales[k] is [L, d_out] f32;
    dequantization (one [B, w_tile] multiply per tile) happens after
    each in-kernel dot. Logit error is the usual weight-only ~1e-2
    relative (tests lock tolerance + greedy agreement)."""
    q = dict(weights)
    scales = {}
    for k in _MATRIX_KEYS:
        w = weights[k].astype(jnp.float32)          # [L, d_in, d_out]
        s = jnp.max(jnp.abs(w), axis=1) / 127.0     # [L, d_out]
        s = jnp.maximum(s, 1e-12)
        q[k] = jnp.clip(jnp.round(w / s[:, None, :]), -127,
                        127).astype(jnp.int8)
        scales[k] = s
    return q, scales


def select_decode_config(weights, e_shape, b, s, bytes_kv, *,
                         block_k: int = 128, grid=None, w_tile: int = 128,
                         depth=None):
    """Joint (mode, block_k, depth) selection for fused_decode_step.

    Picks the FIRST mode in preference order resident -> layer-grid ->
    weight-streaming that fits the scoped-VMEM budget at SOME block_k
    (halving from `block_k` down to 16), and within a mode the LARGEST
    fitting block_k. Measured on v5e (round 4, mode_probe): preferring
    the smaller-footprint mode at a bigger block loses to the
    lower-overhead mode at a shrunken block — resident bk16 beats
    stream bk32 at d256 B128 (124.6k vs 117.9k tok/s), grid beats
    stream at d512 B32/B64; so mode is chosen against the post-shrink
    footprint, not the requested block_k's (the round-3 gate used the
    initial block_k and over-eagerly streamed).

    `grid` pins the mode (False/True/"stream"), skipping the search but
    keeping the block_k shrink; `depth` pins the KV ring depth.
    Returns (mode, block_k, depth).
    """
    num_layers, max_seq, e_dh = e_shape
    d = weights["wq"].shape[-1]
    bytes_w = weights["wq"].dtype.itemsize
    # weights + E are the fixed part of the scoped-VMEM budget; the E
    # term uses the requested block_k's padding (conservative constant)
    fixed = (sum(w.size * w.dtype.itemsize for w in weights.values())
             + (max_seq + block_k) * e_dh * 4 * num_layers
             + 3 * b * d * 4)
    # 2-layer double-buffered footprint of the grid variant
    per_layer = (sum(w.size * w.dtype.itemsize for w in weights.values()
                     if w.ndim == 3) // num_layers
                 + (max_seq + block_k) * e_dh * 4)
    grid_fixed = 2 * per_layer + 3 * b * d * 4
    # stream: only the shared weight tiles + per-layer E/biases resident
    stream_fixed = (2 * d * w_tile * bytes_w
                    + 2 * (d // 2) * w_tile * bytes_w
                    + 2 * (max_seq + block_k) * e_dh * 4
                    + 16 * num_layers * d * 4
                    + 3 * b * d * 4)
    by_mode = {False: fixed, True: grid_fixed, "stream": stream_fixed,
               "bulk": grid_fixed}

    def best_block(mode_fixed):
        # largest block_k (halving, floor 16 — d1024 B64 NEEDS 16) that
        # divides s and fits; None if even 16 overflows
        if s % block_k:
            bk = s  # degrade to one block for odd cache lengths
            return bk if (mode_fixed + 4 * b * bk * d * bytes_kv
                          <= _VMEM_BUDGET) else None
        bk = block_k
        while True:
            if mode_fixed + 4 * b * bk * d * bytes_kv <= _VMEM_BUDGET:
                return bk
            if bk <= 16 or s % (bk // 2):
                return None
            bk //= 2

    if grid is None:
        # tiny batches are wait-chain-bound, not bandwidth-bound: the
        # BULK whole-cache copy (one contiguous DMA per cache per
        # layer) beats per-block streaming at B1 (89 vs 98 us/step,
        # d256 S1024, 0.5 MB/copy) and holds parity at B2-B4; at B8
        # the extra read amplification loses (160 vs 155 at 4 MB/copy)
        # — so gate on the measured-win regime: small batch AND a
        # per-cache copy of at most 2 MiB (the B4 S1024 parity point)
        if (b <= 4 and s % block_k == 0
                and b * s * d * bytes_kv <= 2 * 1024 * 1024
                and grid_fixed + 2 * b * s * d * bytes_kv
                <= _VMEM_BUDGET):
            return "bulk", block_k, 1
        modes = [False, True] + (["stream"] if d % 256 == 0 else [])
        for mode in modes:
            bk = best_block(by_mode[mode])
            if bk is not None:
                grid = mode
                block_k = bk
                break
        else:
            # an odd d_model whose resident/grid footprints also
            # overflow has no fused kernel — fail clearly instead of
            # handing Mosaic an over-budget program (the model-level
            # _decode_fused gate protects the auto path; this protects
            # direct callers)
            raise ValueError(
                f"fused_decode_step: no kernel mode fits d_model={d} "
                f"batch={b} — resident set {fixed} B / layer-grid "
                f"double buffer {grid_fixed} B leave no room for KV "
                f"blocks within {_VMEM_BUDGET} B"
                + ("" if d % 256 == 0 else
                   ", and the weight-streaming kernel needs "
                   "d_model % 256 == 0")
                + ". Use the XLA decode path for this configuration")
    elif grid == "bulk":
        # bulk holds the WHOLE cache in VMEM: block_k only sets the
        # compute-loop granularity (no per-block buffers)
        if s % block_k:
            block_k = s
        if grid_fixed + 2 * b * s * d * bytes_kv > _VMEM_BUDGET:
            raise ValueError(
                f"bulk decode: whole-cache buffers ({2 * b * s * d * bytes_kv} B)"
                f" + layer double-buffer ({grid_fixed} B) exceed "
                f"{_VMEM_BUDGET} B — use the streaming modes")
        return grid, block_k, 1
    else:
        bk = best_block(by_mode[grid])
        if bk is None:
            # pinned mode that never fits the budget: hand Mosaic the
            # SMALLEST block (16-floor halvings) — the budget is
            # conservative and near-boundary configs compile (d512
            # B128 grid bk16 measured working), while the requested
            # block would be hopeless
            if s % block_k:
                bk = s
            else:
                bk = block_k
                while bk > 16 and s % (bk // 2) == 0:
                    bk //= 2
        block_k = bk
    # KV stream buffer DEPTH (round 4): deepen the block rotation past
    # double-buffering when spare scoped VMEM allows — more DMAs in
    # flight shortens the per-layer wait chain. block_k selection above
    # is unchanged (sized for depth 2); depth only grows into slack.
    if depth is None or depth < 2:
        depth = 2
        n_blocks = max(s // block_k, 1)
        while (depth < min(4, n_blocks) and
               by_mode[grid] + 2 * (depth + 1) * b * block_k * d * bytes_kv
               <= _VMEM_BUDGET):
            depth += 1
    return grid, block_k, depth


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_k", "interpret", "grid"))
def fused_decode_step(x, t, e_all, weights, k_cache, v_cache,
                      num_heads: int, block_k: int = 128,
                      interpret: bool = False, grid=None, scales=None,
                      start=None, start_min=None):
    """All-layers decode step, fully fused into one kernel.

    x: [B, d] (already embedded + positioned); t: scalar int32 position;
    e_all: [L, max_seq, dh] f32 (stacked relative tables); weights: dict
    of STACKED per-layer arrays (keys = WEIGHT_KEYS, each [L, ...]);
    k_cache/v_cache: [L, B, S, d]. Returns (out [B, d], k_cache,
    v_cache) with every layer's new K/V row inserted at position t via
    ONE dynamic_update_slice per cache (in place under jit donation).

    scales: optional {matrix key: [L, d_out] f32} from
    quantize_stream_weights — the six big matrices are int8 and stream
    at half the HBM traffic (the d1024 rung's floor); requires the
    STREAMING mode (auto-selected: int8 weights shrink every footprint
    estimate, but only the stream kernel dequantizes).

    start: optional [B] int32 — RAGGED decode for continuous-batching
    serving (decode/serving.py): row b attends only to cache rows
    s in [start[b], t]. Right-aligned slots share t, the E window and
    the DMA trip count, so raggedness costs one masked compare per
    block; start=None compiles the exact non-ragged program.

    start_min: optional scalar int32 <= min(start) — the LIVE-WINDOW
    floor: KV blocks wholly below it are start-masked for every row,
    so the kernels skip their DMA + compute (block loop runs
    [start_min//block_k, ceil(t/block_k))). Pure performance hint:
    any value in [0, min(start)] yields identical outputs; requires
    `start`. Without it a serving step pays for the whole [0, t)
    prefix even when the live window t - min(start) is small.
    """
    b, d = x.shape
    num_layers = k_cache.shape[0]
    s = k_cache.shape[2]
    max_seq = e_all.shape[1]
    bytes_kv = k_cache.dtype.itemsize
    import os
    # column-tile width for the streaming matmuls (MG_DECODE_WTILE
    # overrides for tuning; measured at d1024 B8 on v5e: 128 -> 14.3k
    # tok/s, 256 -> 13.7k, 512 -> 13.0k — smaller tiles overlap the
    # tile-0 waits better at decode's tiny [B, d] compute)
    w_tile = int(os.environ.get("MG_DECODE_WTILE", "0")) or 128
    if scales is not None and grid is None:
        grid = "stream"  # only the stream kernel dequantizes int8
    grid, block_k, depth = select_decode_config(
        weights, e_all.shape, b, s, bytes_kv, block_k=block_k, grid=grid,
        w_tile=w_tile,
        depth=int(os.environ.get("MG_DECODE_DEPTH", "0")) or None)
    if scales is not None and grid != "stream":
        raise ValueError("int8 weights (scales=) require the streaming "
                         f"kernel; got mode {grid!r}")
    if scales is None and weights["wq"].dtype == jnp.int8:
        raise ValueError("int8 weights need their scales= dict "
                         "(quantize_stream_weights)")
    if grid == "stream" and (d % w_tile or (d // 2) % w_tile):
        # the streaming matmuls tile output columns in w_tile chunks of
        # BOTH d and d//2 wide matrices; a remainder would silently drop
        # columns (the model gate only admits d % 256 == 0)
        raise ValueError(
            f"stream decode needs d_model ({d}) and d_model//2 divisible "
            f"by w_tile ({w_tile})")
    # slack so the bias slice never reads past the table (masked anyway)
    e_pad = jnp.pad(e_all.astype(jnp.float32),
                    ((0, 0), (0, block_k), (0, 0)))
    ragged = start is not None
    if start_min is not None and not ragged:
        raise ValueError("start_min requires start (ragged decode)")
    t0 = (jnp.int32(0) if start_min is None
          else jnp.asarray(start_min, jnp.int32))
    t_arr = jnp.stack([jnp.asarray(t, jnp.int32).reshape(()), t0])
    start2d = (jnp.zeros((b, 1), jnp.int32) if start is None
               else jnp.asarray(start, jnp.int32).reshape(b, 1))

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    # caches must stay in HBM: ANY lets the compiler pull them into VMEM
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    if not grid:
        kernel = functools.partial(
            _kernel, num_layers=num_layers, num_heads=num_heads,
            block_k=block_k, max_seq=max_seq, eps=1e-6, ragged=ragged)
        out, k_news, v_news = pl.pallas_call(
            kernel,
            in_specs=[
                vmem(),                                     # x
                pl.BlockSpec(memory_space=pltpu.SMEM),      # t
                vmem(),                                     # start
                vmem(),                                     # e_pad
                *([vmem()] * 16),                           # weights
                hbm, hbm,                                   # caches
            ],
            out_specs=(vmem(), vmem(), vmem()),
            out_shape=(
                jax.ShapeDtypeStruct((b, d), x.dtype),
                jax.ShapeDtypeStruct((num_layers, b, d), k_cache.dtype),
                jax.ShapeDtypeStruct((num_layers, b, d), v_cache.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((depth, b, block_k, d), k_cache.dtype),
                pltpu.VMEM((depth, b, block_k, d), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2 * depth,)),
            ],
            interpret=interpret,
        )(x, t_arr, start2d, e_pad, *[weights[k] for k in WEIGHT_KEYS],
          k_cache, v_cache)
    else:
        # stacked weights exceed VMEM residency (d_model >= 512): grid
        # over layers. grid=True: Mosaic pipelines each layer's whole
        # weight/E blocks while the previous layer computes
        # (_kernel_grid). grid="stream" (d_model >= 1024, where even a
        # 2-layer double buffer overflows): matrices stay in HBM and
        # every matmul streams column tiles (_kernel_grid_stream).
        stream = grid == "stream"
        bulk = grid == "bulk"
        dh = d // num_heads
        e_rows = e_pad.shape[1]

        def wspec(*shape):
            return pl.BlockSpec((1,) + shape,
                                lambda l: (l,) + (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        # biases/LN ride FULL as f32: a (1, d) block violates Mosaic's
        # 8-sublane rule and dynamic sublane reads crash on bf16
        f32b = {k: weights[k].astype(jnp.float32)
                for k in WEIGHT_KEYS
                if weights[k].ndim == 2}
        in_specs = [
            pl.BlockSpec((b, d), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec(memory_space=pltpu.SMEM),          # t
            pl.BlockSpec((b, 1), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),          # start
            wspec(e_rows, dh),                              # e_pad
        ]
        w_args = []
        for k in WEIGHT_KEYS:
            w = weights[k]
            if w.ndim == 3:
                in_specs.append(hbm if stream
                                else wspec(w.shape[1], w.shape[2]))
                w_args.append(w)
            else:
                in_specs.append(vmem())
                w_args.append(f32b[k])
        in_specs += [hbm, hbm]
        scale_args = []
        if scales is not None:
            # six [L, d_out] f32 scale tables ride VMEM, after caches
            for k in _MATRIX_KEYS:
                in_specs.append(vmem())
                scale_args.append(scales[k].astype(jnp.float32))
        if bulk:
            scratch = [
                pltpu.VMEM((b, d), jnp.float32),
                pltpu.VMEM((b, s, d), k_cache.dtype),  # whole cache
                pltpu.VMEM((b, s, d), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            scratch = [
                pltpu.VMEM((b, d), jnp.float32),
                pltpu.VMEM((depth, b, block_k, d), k_cache.dtype),
                pltpu.VMEM((depth, b, block_k, d), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2 * depth,)),
            ]
        if bulk:
            kernel = functools.partial(
                _kernel_grid_bulk, num_layers=num_layers,
                num_heads=num_heads, block_k=block_k, max_seq=max_seq,
                eps=1e-6, ragged=ragged)
        elif stream:
            kernel = functools.partial(
                _kernel_grid_stream, num_layers=num_layers,
                num_heads=num_heads, block_k=block_k, max_seq=max_seq,
                eps=1e-6, w_tile=w_tile, quant=scales is not None,
                ragged=ragged)
            wdt = weights["wq"].dtype
            scratch += [
                pltpu.VMEM((2, d, w_tile), wdt),       # wbuf_a
                pltpu.VMEM((2, d // 2, w_tile), wdt),  # wbuf_b (ffn2)
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kernel = functools.partial(
                _kernel_grid, num_layers=num_layers,
                num_heads=num_heads, block_k=block_k, max_seq=max_seq,
                eps=1e-6, ragged=ragged)
        out, k_news, v_news = pl.pallas_call(
            kernel,
            grid=(num_layers,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((b, d), lambda l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, d), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, d), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, d), x.dtype),
                jax.ShapeDtypeStruct((num_layers, b, d), k_cache.dtype),
                jax.ShapeDtypeStruct((num_layers, b, d), v_cache.dtype),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(x, t_arr, start2d, e_pad, *w_args, k_cache, v_cache,
          *scale_args)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_news.reshape(num_layers, b, 1, d), (0, 0, t, 0))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_news.reshape(num_layers, b, 1, d), (0, 0, t, 0))
    return out, k_cache, v_cache


def _kernel_chunk(x_ref, t_ref, e_ref,
                  wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  wfc_ref, bfc_ref,
                  ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  ln2s_ref, ln2b_ref,
                  kc_ref, vc_ref,
                  out_ref, knew_ref, vnew_ref,
                  kbuf, vbuf, sems, *,
                  num_layers: int, num_heads: int, block_k: int,
                  max_seq: int, eps: float, chunk_c: int):
    """Resident chunk-verify kernel: _kernel's twin over B*C rows."""
    t = t_ref[0]
    n_live = (t + block_k - 1) // block_k

    @pl.when(n_live > 0)
    def _entry():
        start_block0(kc_ref, vc_ref, 0, kbuf, vbuf, sems, block_k,
                     n_live)

    x = x_ref[...].astype(jnp.float32)                    # [B*C, d]
    for li in range(num_layers):
        x, k_new, v_new = _layer_chunk_step(
            x, li, t, n_live, e_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wfc_ref, bfc_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, ln2s_ref, ln2b_ref,
            kc_ref, vc_ref, kbuf, vbuf, sems,
            num_heads=num_heads, block_k=block_k, max_seq=max_seq,
            eps=eps, io_dtype=out_ref.dtype, chunk_c=chunk_c,
            warmup=False,
            prefetch_li=li + 1 if li + 1 < num_layers else None)
        knew_ref[li] = k_new.astype(knew_ref.dtype)
        vnew_ref[li] = v_new.astype(vnew_ref.dtype)
    out_ref[...] = x.astype(out_ref.dtype)


def _kernel_chunk_grid(x_ref, t_ref, e_ref,
                       wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                       wfc_ref, bfc_ref,
                       ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       ln2s_ref, ln2b_ref,
                       kc_ref, vc_ref,
                       out_ref, knew_ref, vnew_ref,
                       xcar, kbuf, vbuf, sems, *,
                       num_layers: int, num_heads: int, block_k: int,
                       max_seq: int, eps: float, chunk_c: int):
    """Layer-grid chunk-verify kernel (_kernel_grid's twin)."""
    li = pl.program_id(0)
    t = t_ref[0]
    n_live = (t + block_k - 1) // block_k
    x = jnp.where(li == 0, x_ref[...].astype(jnp.float32), xcar[...])
    x, k_new, v_new = _layer_chunk_step(
        x, 0, t, n_live, e_ref,
        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
        wfc_ref, bfc_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, ln2s_ref, ln2b_ref,
        kc_ref, vc_ref, kbuf, vbuf, sems,
        num_heads=num_heads, block_k=block_k, max_seq=max_seq,
        eps=eps, io_dtype=out_ref.dtype, chunk_c=chunk_c,
        bias_li=li, cache_li=li)
    knew_ref[0] = k_new.astype(knew_ref.dtype)
    vnew_ref[0] = v_new.astype(vnew_ref.dtype)
    xcar[...] = x
    out_ref[...] = x.astype(out_ref.dtype)


def _kernel_chunk_grid_stream(x_ref, t_ref, e_ref,
                              wq_ref, bq_ref, wk_ref, bk_ref,
                              wv_ref, bv_ref, wfc_ref, bfc_ref,
                              ln1s_ref, ln1b_ref, w1_ref, b1_ref,
                              w2_ref, b2_ref, ln2s_ref, ln2b_ref,
                              kc_ref, vc_ref,
                              *rest,
                              num_layers: int, num_heads: int,
                              block_k: int, max_seq: int, eps: float,
                              w_tile: int, chunk_c: int,
                              quant: bool = False):
    """Weight-streaming chunk-verify kernel (_kernel_grid_stream's
    twin; d_model >= 1024)."""
    if quant:
        (sq_ref, sk_ref, sv_ref, sfc_ref, s1_ref, s2_ref,
         out_ref, knew_ref, vnew_ref,
         xcar, kbuf, vbuf, sems, wbuf_a, wbuf_b, wsems) = rest
    else:
        (out_ref, knew_ref, vnew_ref,
         xcar, kbuf, vbuf, sems, wbuf_a, wbuf_b, wsems) = rest
    li = pl.program_id(0)
    t = t_ref[0]
    n_live = (t + block_k - 1) // block_k
    scale_of = ({id(wq_ref): sq_ref, id(wk_ref): sk_ref,
                 id(wv_ref): sv_ref, id(wfc_ref): sfc_ref,
                 id(w1_ref): s1_ref, id(w2_ref): s2_ref}
                if quant else {})
    mm = _make_stream_mm(li, w_tile, wbuf_a, wbuf_b, wsems, scale_of)
    x = jnp.where(li == 0, x_ref[...].astype(jnp.float32), xcar[...])
    x, k_new, v_new = _layer_chunk_step(
        x, 0, t, n_live, e_ref,
        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
        wfc_ref, bfc_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, ln2s_ref, ln2b_ref,
        kc_ref, vc_ref, kbuf, vbuf, sems,
        num_heads=num_heads, block_k=block_k, max_seq=max_seq,
        eps=eps, io_dtype=out_ref.dtype, chunk_c=chunk_c,
        bias_li=li, cache_li=li, mm=mm)
    knew_ref[0] = k_new.astype(knew_ref.dtype)
    vnew_ref[0] = v_new.astype(vnew_ref.dtype)
    xcar[...] = x
    out_ref[...] = x.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "chunk_c", "block_k", "interpret",
                     "grid"))
def fused_decode_chunk(x, t, e_all, weights, k_cache, v_cache,
                       num_heads: int, chunk_c: int,
                       block_k: int = 128, interpret: bool = False,
                       grid=None, scales=None):
    """All-layers CHUNK-VERIFY forward, fully fused into one kernel
    (speculative decoding, decode/speculative.py): C tokens at absolute
    positions t..t+C-1 process against the live cache prefix in one
    weight pass — position-by-position equal to C sequential
    fused_decode_step calls at a cost close to ONE (the step is
    weight/latency-bound; see BASELINE.md round-4 speculative rows).

    x: [B, C, d] (already embedded + positioned); t: scalar int32;
    other arguments exactly as fused_decode_step. Mode selection
    (resident / layer-grid / weight-streaming + block_k + depth) reuses
    select_decode_config; the bulk mode does not apply (per-block
    streaming only). Requires C a power of two in [8, 128] (f32 sublane
    tile floor), max_seq >= 128 and t + C <= max_seq (the speculative
    engine enforces the headroom).

    Returns (out [B, C, d], k_cache, v_cache) with all layers' C new
    K/V rows inserted at [t, t+C) via one dynamic_update_slice per
    cache."""
    b, c, d = x.shape
    if c & (c - 1) or not 8 <= c <= 128:
        raise ValueError(f"chunk_c must be a power of two in [8, 128], "
                         f"got {c}")
    num_layers = k_cache.shape[0]
    s = k_cache.shape[2]
    max_seq = e_all.shape[1]
    if max_seq < 128:
        raise ValueError(f"chunk kernel needs max_seq >= 128 "
                         f"(in-chunk E window), got {max_seq}")
    bytes_kv = k_cache.dtype.itemsize
    import os
    w_tile = int(os.environ.get("MG_DECODE_WTILE", "0")) or 128
    if scales is not None and grid is None:
        grid = "stream"
    grid, block_k, depth = select_decode_config(
        weights, e_all.shape, b, s, bytes_kv, block_k=block_k,
        grid=grid, w_tile=w_tile,
        depth=int(os.environ.get("MG_DECODE_DEPTH", "0")) or None)
    if grid == "bulk":  # chunk kernel has no bulk variant
        grid, block_k, depth = select_decode_config(
            weights, e_all.shape, b, s, bytes_kv, block_k=block_k,
            grid=True, w_tile=w_tile, depth=None)
        grid = True
    if scales is not None and grid != "stream":
        raise ValueError("int8 weights (scales=) require the streaming "
                         f"kernel; got mode {grid!r}")
    if grid == "stream" and (d % w_tile or (d // 2) % w_tile):
        raise ValueError(
            f"stream decode needs d_model ({d}) and d_model//2 "
            f"divisible by w_tile ({w_tile})")
    # wide-band slack: the QE window reads block_k + 128 rows starting
    # c-1 rows early; worst-case end is max_seq + block_k + 128 - c
    e_pad = jnp.pad(e_all.astype(jnp.float32),
                    ((0, 0), (0, block_k + 128), (0, 0)))
    t_arr = jnp.asarray(t, jnp.int32).reshape(1)
    x_flat = x.reshape(b * c, d)
    r = b * c

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    if not grid:
        kernel = functools.partial(
            _kernel_chunk, num_layers=num_layers, num_heads=num_heads,
            block_k=block_k, max_seq=max_seq, eps=1e-6, chunk_c=c)
        out, k_news, v_news = pl.pallas_call(
            kernel,
            in_specs=[
                vmem(),                                     # x
                pl.BlockSpec(memory_space=pltpu.SMEM),      # t
                vmem(),                                     # e_pad
                *([vmem()] * 16),                           # weights
                hbm, hbm,                                   # caches
            ],
            out_specs=(vmem(), vmem(), vmem()),
            out_shape=(
                jax.ShapeDtypeStruct((r, d), x.dtype),
                jax.ShapeDtypeStruct((num_layers, r, d), k_cache.dtype),
                jax.ShapeDtypeStruct((num_layers, r, d), v_cache.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((depth, b, block_k, d), k_cache.dtype),
                pltpu.VMEM((depth, b, block_k, d), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2 * depth,)),
            ],
            interpret=interpret,
        )(x_flat, t_arr, e_pad, *[weights[k] for k in WEIGHT_KEYS],
          k_cache, v_cache)
    else:
        stream = grid == "stream"
        dh = d // num_heads
        e_rows = e_pad.shape[1]

        def wspec(*shape):
            return pl.BlockSpec((1,) + shape,
                                lambda l: (l,) + (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        f32b = {k: weights[k].astype(jnp.float32)
                for k in WEIGHT_KEYS
                if weights[k].ndim == 2}
        in_specs = [
            pl.BlockSpec((r, d), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),          # x
            pl.BlockSpec(memory_space=pltpu.SMEM),          # t
            wspec(e_rows, dh),                              # e_pad
        ]
        w_args = []
        for k in WEIGHT_KEYS:
            w = weights[k]
            if w.ndim == 3:
                in_specs.append(hbm if stream
                                else wspec(w.shape[1], w.shape[2]))
                w_args.append(w)
            else:
                in_specs.append(vmem())
                w_args.append(f32b[k])
        in_specs += [hbm, hbm]
        scale_args = []
        if scales is not None:
            for k in _MATRIX_KEYS:
                in_specs.append(vmem())
                scale_args.append(scales[k].astype(jnp.float32))
        scratch = [
            pltpu.VMEM((r, d), jnp.float32),
            pltpu.VMEM((depth, b, block_k, d), k_cache.dtype),
            pltpu.VMEM((depth, b, block_k, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2 * depth,)),
        ]
        if stream:
            kernel = functools.partial(
                _kernel_chunk_grid_stream, num_layers=num_layers,
                num_heads=num_heads, block_k=block_k, max_seq=max_seq,
                eps=1e-6, w_tile=w_tile, chunk_c=c,
                quant=scales is not None)
            wdt = weights["wq"].dtype
            scratch += [
                pltpu.VMEM((2, d, w_tile), wdt),
                pltpu.VMEM((2, d // 2, w_tile), wdt),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kernel = functools.partial(
                _kernel_chunk_grid, num_layers=num_layers,
                num_heads=num_heads, block_k=block_k, max_seq=max_seq,
                eps=1e-6, chunk_c=c)
        out, k_news, v_news = pl.pallas_call(
            kernel,
            grid=(num_layers,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((r, d), lambda l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, d), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, d), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r, d), x.dtype),
                jax.ShapeDtypeStruct((num_layers, r, d), k_cache.dtype),
                jax.ShapeDtypeStruct((num_layers, r, d), v_cache.dtype),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(x_flat, t_arr, e_pad, *w_args, k_cache, v_cache, *scale_args)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_news.reshape(num_layers, b, c, d), (0, 0, t, 0))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_news.reshape(num_layers, b, c, d), (0, 0, t, 0))
    return out.reshape(b, c, d), k_cache, v_cache
