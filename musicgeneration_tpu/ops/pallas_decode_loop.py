"""Chunked whole-generation megakernel: C decode steps per Pallas call.

The per-step fused kernel (ops/pallas_decode.py) pays per-token costs
the step boundary forces: a kernel launch, re-copying all stacked
weights + tables HBM->VMEM (~5 MB every token), and XLA glue ops
between launches. This kernel amortizes all of that over a CHUNK of
C tokens: weights, relative tables, positional rows, the embedding
matrix and the output head stay VMEM-resident while

    sample (Gumbel argmax via the on-core PRNG, or greedy) ->
    one-hot embed matmul + positional row ->
    L x _layer_step: HBM-prefix KV streaming for rows [0, t0) PLUS a
        VMEM block for the chunk's own rows [t0, t0+i)
        (shared code with the per-step kernel) ->
    append this step's K/V rows to the VMEM chunk ->
    output-head matmul -> carry logits

runs in a fori_loop over the chunk. The chunk's K/V rows RETURN as
VMEM outputs and the (jitted) caller inserts them into the HBM cache
with one dynamic_update_slice per chunk — in-kernel VMEM->HBM row
writes are not an option: ANY async copy with a strided HBM
destination crashes this environment's Mosaic compiler (probed:
static or dynamic offset, aliased or not — helper subprocess exit 1).

Sampling parity: greedy is exactly argmax (token-identical to the scan
path — tested); stochastic sampling is the Gumbel-max trick over
temperature-scaled logits with ON-CORE top-k / nucleus masking
(sample_mask below: sort-free, exact XLA-sampler set semantics) — the
same categorical DISTRIBUTION as jax.random.categorical but a
different random stream (chi-square-locked on hardware in
tests/test_tpu_sampling.py). The engine auto-selects this kernel on
TPU only: the on-core PRNG has no interpret lowering, so off-TPU only
greedy is eligible.

VMEM at the flagship config (6L/256d bf16, S=1024, C=64): weights
~2 MB + E (sliced to S + slack rows, f32) ~2 MB + pos 1 MB + embed/
head 0.4 MB + chunk K/V outputs 1.6 MB + KV stream buffers 2 MB.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import WEIGHT_KEYS, _layer_step


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def decode_loop_vmem_bytes(num_layers: int, d: int, vocab: int,
                           cache_len: int, dh: int, chunk: int = 32,
                           block_k: int = 128, batch: int = 8,
                           bytes_per: int = 2) -> int:
    """VMEM footprint of the chunk megakernel — unlike the per-step
    estimate (pallas_decode.decode_vmem_bytes) this counts EVERYTHING
    the loop kernel keeps resident: stacked weights, the E table sliced
    to the cache length (+ block/chunk slack, f32), the f32 positional
    table, padded embed matrix + output head, the f32 chunk K/V output
    buffers, in/out logits, and the KV stream double buffers. The
    engine's eligibility gate uses this so a borderline config falls
    back to the per-step kernel instead of overflowing at compile."""
    vpad = _round_up(vocab, 128)
    w = num_layers * (4 * d * d + 2 * d * (d // 2)) * bytes_per
    e = num_layers * (cache_len + block_k + chunk) * dh * 4
    pos = cache_len * d * 4
    embed = vpad * d * bytes_per
    head = d * vpad * bytes_per + vpad * 4
    chunk_kv = 2 * num_layers * batch * chunk * d * 4
    logits = 2 * batch * vpad * 4
    bufs = 4 * batch * block_k * d * bytes_per
    return w + e + pos + embed + head + chunk_kv + logits + bufs


def _sortable_key(x, bitcast):
    """f32 -> int32 key, strictly monotone in float order (negatives:
    XOR the low 31 bits; sign bit keeps them below positives)."""
    s = bitcast(x)
    return s ^ jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(s, 31), 1)


def _mask_search(key, pred_stat, threshold):
    """Smallest int32 T with stat-of-keys-strictly-above-T < threshold,
    via 32-step vectorized bisection. key: [B, V] int32; pred_stat(t)
    -> [B, 1] f32 stat over {key > t}; returns T [B, 1] int32."""
    b = key.shape[0]
    lo0 = jnp.full((b, 1), jnp.iinfo(jnp.int32).min, jnp.int32)
    hi0 = jnp.full((b, 1), jnp.iinfo(jnp.int32).max, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        # overflow-safe floor((lo + hi) / 2)
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        up = pred_stat(mid) >= threshold
        return jnp.where(up, mid, lo), jnp.where(up, hi, mid)

    _, hi = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    return hi


def sample_mask(scaled, top_k: int, top_p: float, bitcast=None):
    """Apply the XLA sampler's top-k / top-p masking
    (decode/sampling.py sample_logits) to temperature-scaled logits,
    WITHOUT sorting — in-kernel friendly. Excluded entries drop to
    -1e30. Exact set equality with the sort-based masking:

    * top-k keeps element i iff #(l_j > l_i) < k (== l_i >= kth
      largest, ties at the boundary all kept, like `logits < kth`),
    * top-p keeps element i iff the probability mass STRICTLY above
      l_i is < p (== l_i >= the sorted-cumsum cutoff value),

    both found as an integer threshold on order-isomorphic int32 keys
    by 32-step bisection (count / masked-mass reductions per step).
    bitcast: f32->int32 bit reinterpret (pltpu.bitcast in kernels;
    defaults to lax.bitcast_convert_type for plain jax use/tests).

    Boundary tolerance: the top-p mass here sums masked probabilities
    in UNSORTED f32 order while the XLA sampler cumsums sorted probs —
    when the cumulative mass lands within float-reassociation distance
    (~1e-7 relative) of p EXACTLY at a kept/dropped boundary, the two
    could keep different (both valid, off-by-one-element) sets. Set
    equality is fuzz-locked at V=309 and V=4096
    (tests/test_pallas_decode.py) where no such collision occurs with
    random logits; an adversarial p chosen equal to a partial sum could
    differ by the boundary element."""
    if bitcast is None:
        def bitcast(x):
            return jax.lax.bitcast_convert_type(x, jnp.int32)
    v = scaled.shape[1]
    key = _sortable_key(scaled, bitcast)
    if top_k and 0 < top_k < v:
        t_k = _mask_search(
            key,
            lambda mid: jnp.sum((key > mid).astype(jnp.float32), axis=-1,
                                keepdims=True),
            jnp.float32(top_k))
        scaled = jnp.where(key >= t_k, scaled, -1e30)
        key = jnp.where(key >= t_k, key, jnp.iinfo(jnp.int32).min)
    if top_p < 1.0:
        m = jnp.max(scaled, axis=-1, keepdims=True)
        ex = jnp.exp(scaled - m)
        probs = ex / jnp.sum(ex, axis=-1, keepdims=True)
        # clamp: p <= 0 must keep the argmax (the mass strictly above
        # the max is 0 < any positive p), like the XLA sampler's
        # cutoff_idx = 0 path — an unclamped 0 would empty the set
        t_p = _mask_search(
            key,
            lambda mid: jnp.sum(jnp.where(key > mid, probs, 0.0),
                                axis=-1, keepdims=True),
            jnp.float32(max(top_p, 1e-9)))
        scaled = jnp.where(key >= t_p, scaled, -1e30)
    return scaled


def _chunk_kernel(t0_ref, seed_ref, logits0_ref, embed_ref, pos_ref,
                  e_ref,
                  wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  wfc_ref, bfc_ref,
                  ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  ln2s_ref, ln2b_ref,
                  fcw_ref, fcb_ref,
                  kc_ref, vc_ref,
                  tokens_ref, ck_ref, cv_ref, logits_out_ref,
                  kbuf, vbuf, sems, *,
                  chunk: int, num_layers: int, num_heads: int,
                  block_k: int, e_len: int, eps: float, sqrt_d: float,
                  inv_temp: float, greedy: bool, top_k: int,
                  top_p: float, io_dtype, bulk: bool = False):
    b, vpad = logits0_ref.shape
    d = embed_ref.shape[1]
    t0 = t0_ref[0]
    n_live = (t0 + block_k - 1) // block_k  # HBM prefix only
    if not greedy:
        pltpu.prng_seed(seed_ref[0])
    # the chunk buffers are read (masked) before every row is written —
    # uninitialized garbage would make 0 * inf = NaN in the PV sums
    ck_ref[...] = jnp.zeros(ck_ref.shape, ck_ref.dtype)
    cv_ref[...] = jnp.zeros(cv_ref.shape, cv_ref.dtype)

    from .pallas_decode import start_block0

    if bulk:
        # the HBM prefix [0, t0) is IMMUTABLE for the whole launch
        # (fresh rows go to the VMEM chunk buffers): copy ALL layers'
        # caches in ONE contiguous DMA each, once per `chunk` steps —
        # every per-step per-layer KV stream DMA disappears. kbuf/vbuf
        # here are [L, B, S, d] whole-cache buffers.
        @pl.when(n_live > 0)
        def _fill_once():
            pltpu.make_async_copy(kc_ref, kbuf, sems.at[0]).start()
            pltpu.make_async_copy(vc_ref, vbuf, sems.at[1]).start()
            pltpu.make_async_copy(kc_ref, kbuf, sems.at[0]).wait()
            pltpu.make_async_copy(vc_ref, vbuf, sems.at[1]).wait()

    def step(i, logits):
        if not bulk:
            # layer 0's first KV block streams in while we sample/embed
            @pl.when(n_live > 0)
            def _entry():
                start_block0(kc_ref, vc_ref, 0, kbuf, vbuf, sems,
                             block_k, n_live)

        # ---- sample ----
        if greedy:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            scaled = logits * inv_temp
            if (top_k and top_k > 0) or top_p < 1.0:
                # on-core top-k / nucleus masking, exact XLA-sampler set
                # semantics via integer bisection (no sort)
                scaled = sample_mask(
                    scaled, top_k, top_p,
                    bitcast=lambda y: pltpu.bitcast(y, jnp.int32))
            bits = pltpu.bitcast(pltpu.prng_random_bits((b, vpad)),
                                 jnp.uint32)
            # Mosaic can't cast uint32->f32; the 24-bit value fits int32
            bits24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
            u = jnp.maximum(bits24.astype(jnp.float32)
                            * (1.0 / float(1 << 24)), 1e-10)
            g = -jnp.log(-jnp.log(u))
            tok = jnp.argmax(scaled + g, axis=-1).astype(jnp.int32)
        tokens_ref[pl.ds(i, 1), :] = tok[None, :]

        # ---- embed: one-hot matmul (no scalar gathers) + pos row ----
        oh = (jax.lax.broadcasted_iota(jnp.int32, (b, vpad), 1)
              == tok[:, None])
        x = jax.lax.dot_general(
            oh.astype(jnp.float32), embed_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # mirror the XLA chain: embed row (dtype) * sqrt(d) + pos (dtype)
        x = (x.astype(io_dtype).astype(jnp.float32) * sqrt_d).astype(
            io_dtype).astype(jnp.float32)
        t = t0 + i
        # pos rides f32 (dynamic sublane reads of bf16 crash Mosaic);
        # quantize the row to the model dtype like the XLA path's table
        pos_row = pos_ref[pl.ds(t, 1), :].astype(io_dtype)
        x = ((x.astype(io_dtype) + pos_row).astype(jnp.float32))

        for li in range(num_layers):
            x, k_new, v_new = _layer_step(
                x, li, t, n_live, e_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wfc_ref, bfc_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, ln2s_ref, ln2b_ref,
                kc_ref, vc_ref,
                kbuf.at[li] if bulk else kbuf,
                vbuf.at[li] if bulk else vbuf, sems,
                num_heads=num_heads, block_k=block_k, max_seq=e_len,
                eps=eps, io_dtype=io_dtype, hbm_limit=t0,
                chunk=(ck_ref, cv_ref, i, t0), warmup=False,
                bulk=bulk, bulk_ready=bulk,
                prefetch_li=(None if bulk else
                             li + 1 if li + 1 < num_layers else None))
            # append this step's rows to the VMEM chunk for later steps;
            # buffers ride f32 (dynamic sublane stores of bf16 crash
            # Mosaic) but hold CACHE-dtype-rounded values for parity
            ck_ref[li, :, pl.ds(i, 1), :] = (
                k_new.astype(kbuf.dtype).astype(ck_ref.dtype)[:, None, :])
            cv_ref[li, :, pl.ds(i, 1), :] = (
                v_new.astype(vbuf.dtype).astype(cv_ref.dtype)[:, None, :])

        new_logits = jax.lax.dot_general(
            x.astype(io_dtype).astype(jnp.float32),
            fcw_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + fcb_ref[0]
        return new_logits.astype(io_dtype).astype(jnp.float32)

    logits_out_ref[...] = jax.lax.fori_loop(0, chunk, step,
                                            logits0_ref[...])


def fused_decode_chunk(logits0, t0, seed, embed, pos_tab, e_all, weights,
                       fc_w, fc_b, k_cache, v_cache, num_heads: int,
                       chunk: int, temperature: float = 1.0,
                       greedy: bool = False, top_k: int = 0,
                       top_p: float = 1.0, block_k: int = 128,
                       interpret: bool = False, bulk=None):
    """Thin wrapper resolving the BULK gate so it is a static argument
    of the jitted impl.

    bulk=None resolves from MG_DECODE_LOOP_BULK — but NOTE that callers
    above this are themselves jitted on static decode params
    (decode/engine.generate), so a mid-process env flip does NOT
    retrace through that path; pass DecodeParams(loop_bulk=...) for a
    reliable same-process A/B (it is part of the jit key)."""
    b = logits0.shape[0]
    num_layers, _, s, d = k_cache.shape
    bk = s if s % block_k else block_k
    # per-launch BULK prefix residency: the whole [L, B, S, d] caches
    # copy into VMEM once per `chunk` steps (two contiguous DMAs),
    # eliminating every per-step per-layer KV stream DMA. Measured
    # NEGATIVE on v5e despite the DMA savings — B1 greedy 65.5 vs
    # 54.2 ms/512, B4 67.5 vs 64.5, B8 parity (token-equal): the
    # attention loop's dynamic strided VMEM reads through the
    # [L, B, S, d] view cost more than the stream's DMA-into-dense-
    # buffer reads. Kept opt-in (equality-locked both ways) in case a
    # different VMEM layout or Mosaic version flips it.
    if bulk is None:
        import os
        bulk = os.environ.get("MG_DECODE_LOOP_BULK") == "1"
    if bulk:
        bulk_bytes = 2 * num_layers * b * s * d * k_cache.dtype.itemsize
        base = decode_loop_vmem_bytes(
            num_layers, d, logits0.shape[1], s, d // num_heads, chunk,
            bk, b, k_cache.dtype.itemsize)
        stream_bufs = 4 * b * bk * d * k_cache.dtype.itemsize
        bulk = base - stream_bufs + bulk_bytes <= 14 * 1024 * 1024
    return _fused_decode_chunk(
        logits0, t0, seed, embed, pos_tab, e_all, weights, fc_w, fc_b,
        k_cache, v_cache, num_heads=num_heads, chunk=chunk,
        temperature=temperature, greedy=greedy, top_k=top_k,
        top_p=top_p, block_k=block_k, interpret=interpret, bulk=bulk)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "chunk", "temperature", "greedy",
                     "top_k", "top_p", "block_k", "interpret", "bulk"))
def _fused_decode_chunk(logits0, t0, seed, embed, pos_tab, e_all,
                        weights, fc_w, fc_b, k_cache, v_cache,
                        num_heads: int, chunk: int,
                        temperature: float = 1.0,
                        greedy: bool = False, top_k: int = 0,
                        top_p: float = 1.0, block_k: int = 128,
                        interpret: bool = False, bulk: bool = False):
    """Generate `chunk` tokens in one kernel call.

    logits0: [B, V] f32 (last-position logits); t0: scalar int32 first
    write position (the HBM caches hold rows [0, t0)); seed: scalar
    int32 PRNG seed; embed: [V, d] (model dtype); pos_tab: [>=S, d];
    e_all: [L, max_seq, dh] f32; weights: stacked dict (WEIGHT_KEYS);
    fc_w/fc_b: output head; caches [L, B, S, d] (read-only here).
    Returns (tokens [B, chunk] int32, chunk_k, chunk_v [L, B, chunk, d],
    final logits [B, V]) — the caller inserts the chunk rows at t0.
    """
    b, v = logits0.shape
    num_layers, _, s, d = k_cache.shape
    max_seq = e_all.shape[1]
    if s % block_k:
        block_k = s
    vpad = _round_up(v, 128)
    logits0 = jnp.pad(logits0.astype(jnp.float32),
                      ((0, 0), (0, vpad - v)), constant_values=-1e30)
    embed = jnp.pad(embed, ((0, vpad - v), (0, 0)))
    fc_w = jnp.pad(fc_w, ((0, 0), (0, vpad - v)))
    fc_b = jnp.pad(fc_b.astype(jnp.float32).reshape(1, -1),
                   ((0, 0), (0, vpad - v)), constant_values=-1e30)
    # E sliced to the last S rows (indices below max_seq - S are never
    # touched for t < S) + masked slack for the block/chunk overreach
    e_len = s
    e_sliced = e_all[:, max_seq - s:, :] if max_seq > s else e_all
    e_pad = jnp.pad(e_sliced.astype(jnp.float32),
                    ((0, 0), (0, block_k + chunk), (0, 0)))
    # f32 for the dynamic per-step row read (see dtype note above)
    pos_tab = pos_tab[:s].astype(jnp.float32)
    t0 = jnp.asarray(t0, jnp.int32).reshape(1)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = functools.partial(
        _chunk_kernel, chunk=chunk, num_layers=num_layers,
        num_heads=num_heads, block_k=block_k, e_len=e_len, eps=1e-6,
        sqrt_d=float(math.sqrt(d)),
        inv_temp=1.0 / max(float(temperature), 1e-6),
        greedy=bool(greedy), top_k=int(top_k), top_p=float(top_p),
        io_dtype=k_cache.dtype, bulk=bulk)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    tokens, chunk_k, chunk_v, logits = pl.pallas_call(
        kernel,
        in_specs=[
            smem, smem,                                    # t0, seed
            vmem(), vmem(), vmem(), vmem(),                # logits0,
            #                                 embed, pos, e_pad
            *([vmem()] * 16),                              # weights
            vmem(), vmem(),                                # fc_w, fc_b
            hbm, hbm,                                      # caches (ro)
        ],
        out_specs=(vmem(), vmem(), vmem(), vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((chunk, b), jnp.int32),
            # f32 carriers for cache-dtype-rounded values (bf16 dynamic
            # sublane stores crash Mosaic)
            jax.ShapeDtypeStruct((num_layers, b, chunk, d), jnp.float32),
            jax.ShapeDtypeStruct((num_layers, b, chunk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, vpad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_layers, b, s, d) if bulk
                       else (2, b, block_k, d), k_cache.dtype),
            pltpu.VMEM((num_layers, b, s, d) if bulk
                       else (2, b, block_k, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(t0, seed, logits0, embed, pos_tab, e_pad,
      *[weights[k] for k in WEIGHT_KEYS], fc_w, fc_b, k_cache, v_cache)
    return tokens.T, chunk_k, chunk_v, logits[:, :v]
