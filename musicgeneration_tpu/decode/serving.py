"""Continuous-batching serving engine (iteration-level scheduling).

The reference has no serving story at all: its generation is a
per-request Python loop that re-forwards the whole prefix per token
(MusicTransformer/network.py:44-80). This module is the TPU-native
serving layer on top of the KV-cached decode engine:

* A fixed pool of B **slots** shares ONE stacked KV cache
  ``[L, B, S, d]`` and ONE scalar clock ``t`` (the next cache row every
  slot writes). Requests are admitted into free slots, decode together,
  and retire independently — the batch never drains to the slowest
  request the way static batching does.
* Slots are **right-aligned**: a request admitted at clock ``t`` has its
  prompt K/V written to rows ``[t-p+1, t)`` and attends only rows
  ``s >= start[b]`` — the ragged ``start`` bound threaded through the
  fused decode kernels (ops/pallas_decode.py ``start_col``; one masked
  compare per block). The relative bias needs no change (it depends
  only on the distance ``t - s``) and the positional row is gathered
  per row at ``t - start[b]``, so every slot sees EXACTLY the program a
  dedicated single-request decode would run — bit-identical logits
  (tests/test_pallas_decode.py ragged lock).
* Decode runs in **compiled segments** of ``seg_len`` steps
  (lax.scan) between host syncs. Scheduling granularity is the segment:
  a request finishing mid-segment wastes at most ``seg_len-1`` slot
  steps. On the tunneled TPU a host round-trip costs ~20-28 ms against
  a ~0.1 ms decode step — per-token scheduling would be ~200x slower
  than the kernel it schedules.
* The clock is kept below ``max_seq`` by **roll-compaction**: when
  ``t + seg_len`` would overrun the cache, every row window shifts left
  by ``min(start)`` (one jitted roll of the cache — O(S) every ~S
  steps, amortized O(1) per token) and the clock drops by the same
  amount. Right-alignment makes compaction exact: shifting all rows by
  a common amount changes neither distances nor ``t - start``.

Admission prefill reuses the model's one-pass ``prefill`` (bucketed to
limit compiles), scattered into the slot's row window. Prompts longer
than the current clock wait (the clock advances ``seg_len`` per
segment); when the pool is idle the clock jumps to fit the longest
queued prompt.

Host-side scheduling (pipelined dispatch, count retirement, drain-tail
shrinking, cancellation, latency accounting) lives in the shared
``SlotScheduler`` base (decode/scheduling.py) — the RNN engine
(decode/serving_rnn.py) runs the same scheduler over O(1) hidden-state
slots.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import align_cache_len
from .sampling import (SamplingParams, sample_logits,
                       sample_logits_batched, unpack_sampling)
from .scheduling import _BLOCKED, _Pending, _Slot, SlotScheduler

__all__ = ["ContinuousBatcher"]


@functools.partial(jax.jit, static_argnames=("model", "seg", "sp"),
                   donate_argnames=("cache", "rng"))
def _run_segment(model, params, cache, tok, start, t, rng,
                 seg: int, sp: SamplingParams):
    """seg decode+sample steps as one scan. tok/start: [B]; t: scalar.
    Returns (cache, tok, t, rng', sampled [seg, B]). The key split
    lives inside the jit so the host issues ONE dispatch per segment on
    device-resident state (each extra dispatch or host scalar transfer
    costs 1-2 ms on the tunneled TPU — comparable to several decode
    steps)."""

    # live-window floor: rows below min(start) are masked for every
    # slot, so the fused kernels skip their KV blocks entirely — the
    # per-step cost tracks the live window t - min(start), not the
    # shared clock t (free slots are parked at the clock by the host
    # mirror so they never drag the floor down)
    smin = jnp.min(start)

    def body(carry, rng_i):
        cache, t, tok = carry
        logits, cache = model.apply(
            {"params": params}, tok, cache, t, start, smin,
            method=model.decode_step)
        nxt = sample_logits(rng_i, logits, sp)
        return (cache, t + 1, nxt), nxt

    rng, sub = jax.random.split(rng)
    rngs = jax.random.split(sub, seg)
    (cache, t, tok), toks = jax.lax.scan(
        body, (cache, jnp.asarray(t, jnp.int32), tok), rngs)
    return cache, tok, t, rng, toks


@functools.partial(jax.jit, static_argnames=("model", "seg"),
                   donate_argnames=("cache", "rng"))
def _run_segment_perrow(model, params, cache, tok, start, samp, t, rng,
                        seg: int):
    """Per-ROW sampling variant of `_run_segment`: `samp` is a
    device-resident ``[B, 4]`` int32 array of ``pack_sampling`` rows
    (temperature/top_p bitcast f32), so every slot decodes under ITS
    request's sampling params. Identical rng structure to the uniform
    segment — a greedy row sees the same argmax either way, and a pool
    whose rows all share the engine default is token-identical to the
    uniform program (locked in tests/test_serving.py)."""
    smin = jnp.min(start)
    sd = unpack_sampling(samp[:, 0], samp[:, 1], samp[:, 2], samp[:, 3])

    def body(carry, rng_i):
        cache, t, tok = carry
        logits, cache = model.apply(
            {"params": params}, tok, cache, t, start, smin,
            method=model.decode_step)
        nxt = sample_logits_batched(rng_i, logits, sd)
        return (cache, t + 1, nxt), nxt

    rng, sub = jax.random.split(rng)
    rngs = jax.random.split(sub, seg)
    (cache, t, tok), toks = jax.lax.scan(
        body, (cache, jnp.asarray(t, jnp.int32), tok), rngs)
    return cache, tok, t, rng, toks


@functools.partial(jax.jit, static_argnames=("model",),
                   donate_argnames=("cache",))
def _admit(model, params, cache, tok, packed, t):
    """Batched admission: ONE prefill over the whole group.

    packed: [S, Pb + 3] int32, ONE host transfer carrying everything —
    columns [0, Pb) the padded prompts (S = slot-pool width; unused
    rows are DUPLICATES of row 0 — re-writing a slot with its own
    values is idempotent, so padding the group to a static width costs
    only wasted prefill FLOPs, no extra programs), then three meta
    columns: true prompt length p, target slot id, and the COMPLETE
    new start vector (the host mirror is authoritative: admitted slots
    get t-p+1, free slots are parked at the clock so the segment's
    live-window floor min(start) never drags on a retired slot's
    stale span).

    Row j's prompt K/V lands in rows [t-p_j+1, t) of its slot; the
    prompt's LAST token becomes the slot's pending input (consumed at
    row t by the next decode step). Prefill rows >= p_j-1 are
    causal-masked garbage (pad_id keys) landing at rows >= t — always
    strictly future, each overwritten by a decode step before anything
    attends it. One admission event costs one transfer and one
    dispatch, replacing S separate transfer+prefill+cache-copy
    round-trips (~10 ms each on the tunnel); the donated cache keeps
    the scatters in place."""
    prompts_pad = packed[:, :-3]
    ps, slots_idx, new_start = packed[:, -3], packed[:, -2], packed[:, -1]
    _, pre = model.apply({"params": params}, prompts_pad,
                         prompts_pad.shape[1], method=model.prefill)
    cache = scatter_prefill(cache, pre, ps, slots_idx, t)
    last = jnp.take_along_axis(prompts_pad, (ps - 1)[:, None],
                               axis=1)[:, 0]
    tok = tok.at[slots_idx].set(last)
    return cache, new_start, tok


def scatter_prefill(cache, pre, ps, slots_idx, t):
    """Scatter a group prefill's K/V into the slot row windows: group
    row j's prompt K/V lands at rows [t-p_j+1, t] of slot slots_idx[j]
    (shared by the flat-token and CP admission programs)."""
    k_all, v_all = cache["k"], cache["v"]
    fused = k_all.ndim == 4                  # [L, B, S, d] vs [L, B, H, S, dh]
    for j in range(pre["k"].shape[1]):
        row0 = t - (ps[j] - 1)
        idx = ((0, slots_idx[j], row0, 0) if fused
               else (0, slots_idx[j], 0, row0, 0))
        src_k = pre["k"][:, j:j + 1]
        src_v = pre["v"][:, j:j + 1]
        k_all = jax.lax.dynamic_update_slice(
            k_all, src_k.astype(k_all.dtype), idx)
        v_all = jax.lax.dynamic_update_slice(
            v_all, src_v.astype(v_all.dtype), idx)
    return {"k": k_all, "v": v_all}


@jax.jit
def _gather_slots(cache, start, tok, idx):
    """Re-pool: keep slot rows `idx` (batch axis 1). Shrinks the pool
    for the drain tail (per-step cost scales with B) or grows it back;
    duplicated rows (growth padding) become free slots. No donation:
    the output pool is a different width, so the input buffers are
    never reusable."""
    cache = {k: jnp.take(v, idx, axis=1) for k, v in cache.items()}
    return cache, start[idx], tok[idx]


@functools.partial(jax.jit, donate_argnames=("cache",))
def _compact(cache, start, shift):
    """Shift every slot's row window left by `shift` (clock drop).
    Rows wrapped from the front by the roll are strictly past the new
    clock for every slot and get overwritten before being attended."""
    axis = cache["k"].ndim - 2
    cache = {k: jnp.roll(v, -shift, axis=axis) for k, v in cache.items()}
    return cache, start - shift


@jax.jit
def _reset_free(start, tok, free_mask, t):
    """Park free slots at start = t (span never exceeds one segment).
    tok may carry trailing structure ([B, 8] CP rows) — the mask
    broadcasts over it."""
    m = free_mask.reshape(free_mask.shape + (1,) * (tok.ndim - 1))
    return (jnp.where(free_mask, jnp.asarray(t, jnp.int32), start),
            jnp.where(m, 0, tok))


class ContinuousBatcher(SlotScheduler):
    """Continuous-batching decode over a fixed slot pool.

    >>> cb = ContinuousBatcher(model, params, slots=8)
    >>> rid = cb.submit(prompt_ids, max_new=256)
    >>> outs = cb.run()          # {rid: np.ndarray of generated ids}

    ``submit`` may be called at any time (including between ``step``
    calls); ``run`` drains the queue. Greedy sampling is token-identical
    to per-request ``generate`` runs of the same batch width.

    With ``per_row_sampling=True`` each ``submit`` may carry its own
    ``SamplingParams`` (greedy and stochastic requests share one pool);
    the engine-level ``sampling`` remains the default for requests that
    omit it. Packed per-slot params ride a host mirror shipped only on
    change, mirroring the ``start`` vector's protocol.
    """

    def __init__(self, model, params, *, slots: int = 8,
                 sampling: SamplingParams = SamplingParams(),
                 seg_len: int = 32, cache_len: Optional[int] = None,
                 prompt_bucket: int = 64, depth: int = 4,
                 min_slots: int = 8, per_row_sampling: bool = False,
                 boost: int = 1,
                 on_finalize: Optional[Callable] = None,
                 rng: Optional[jax.Array] = None):
        # boost: multi-segment fused dispatch (scheduling.py
        # _boosted_seg; additionally pinned by sliding slots and cache
        # headroom in _pre_segment). Off by default — measured NEUTRAL
        # on hardware for this engine (the segment is compute-heavy
        # enough that dispatch amortization doesn't move goodput;
        # BASELINE.md); boost=8 is the RNN engine's winner.
        super().__init__(
            slots=slots, sampling=sampling, seg_len=seg_len,
            prompt_bucket=prompt_bucket, depth=depth, min_slots=min_slots,
            per_row_sampling=per_row_sampling, on_finalize=on_finalize,
            rng=rng, pad_id=getattr(model, "pad_id", 0), boost=boost)
        self.model = model
        self.params = params
        self._next_seg = seg_len
        max_seq = getattr(model, "max_seq", 2048)
        self.cache_len = align_cache_len(
            model, min(cache_len or max_seq, max_seq))
        if self.cache_len <= seg_len:
            raise ValueError(f"cache_len {self.cache_len} must exceed "
                             f"seg_len {seg_len}")
        if boost > 1 and boost * seg_len >= self.cache_len:
            raise ValueError(
                f"boost*seg_len ({boost * seg_len}) must fit under "
                f"cache_len ({self.cache_len}) or boost can never "
                "engage — lower boost/seg_len or raise cache_len")
        self.cache = model.apply({"params": params}, slots,
                                 self.cache_len, method=model.init_cache)
        self.t = 0                      # host mirror of the clock
        self._t_dev = None              # device-resident clock (if warm)
        self.start = jnp.zeros((slots,), jnp.int32)
        # exact host mirror of `start` (admissions/compactions/resets
        # are all host-decided) — scheduling never reads the device.
        # _start_dirty: the mirror has PARKED retired slots at the
        # clock but the device vector hasn't been refreshed yet (the
        # refresh usually rides the next admission's meta transfer;
        # _pre_segment ships it explicitly only in the drain tail, so
        # the live-window floor min(start) never drags on a retired
        # span)
        self._start_host = np.zeros((slots,), np.int64)
        self._start_dirty = False
        self.tok = jnp.zeros((slots,), jnp.int32)
        self._n_compactions = 0
        # sliding-window requests: rid -> admitted context prompt (the
        # re-prime rebuilds each window from prompt + emitted tokens)
        self._sliding_prompts: Dict[int, np.ndarray] = {}
        self._n_reprimes = 0

    def stats(self) -> Dict[str, float]:
        st = super().stats()
        st["compactions"] = self._n_compactions
        st["reprimes"] = self._n_reprimes
        return st

    # --------------------------------------------------- scheduler hooks

    def _validate_request(self, prompt, max_new, eos_id, kw) -> dict:
        window = kw.pop("window", None)
        if kw:
            raise TypeError(f"unexpected submit() arguments: "
                            f"{sorted(kw)}")
        limit = min(self.cache_len,
                    getattr(self.model, "max_seq", self.cache_len))
        if window is not None:
            # sliding request: unbounded max_new via per-slot window
            # re-priming (the serving form of engine.generate_sliding —
            # the context is re-primed from the last `window` tokens
            # whenever it would exceed 2*window, so the slot's span
            # never pins the cache). The prompt is trimmed to the last
            # `window` tokens, exactly generate_sliding's ctx seed.
            window = int(window)
            if window < self.seg_len:
                raise ValueError(
                    f"window ({window}) must be >= seg_len "
                    f"({self.seg_len}) — a re-prime must free at least "
                    "one segment of room")
            if 2 * window + self.seg_len > limit:
                raise ValueError(
                    f"2 * window ({window}) + seg_len ({self.seg_len}) "
                    f"exceeds the serve window ({limit}); shrink the "
                    "window or raise cache_len")
            return {"window": window, "_prompt": prompt[-window:]}
        # span a slot occupies before reuse: count-retired requests
        # (no eos) free their slot AT DISPATCH TIME, overshooting
        # max_new by less than one segment; eos requests stay active
        # until the pipelined host SEES the tokens — up to depth+1
        # segments of lag
        lag = 1 if eos_id is None else self.depth + 1
        cap = prompt.shape[0] + max_new + lag * self.seg_len
        if cap > limit:
            raise ValueError(
                f"prompt ({prompt.shape[0]}) + max_new ({max_new}) + "
                f"{lag} * seg_len ({self.seg_len}) "
                f"exceeds the serve window ({limit}); shorten the "
                "request, raise cache_len, or pass window= for "
                "sliding-context decoding")
        return {}

    def _bucket(self, p: int) -> int:
        # admission writes rows [t-p+1, t-p+1+Pb): a bucket wider than
        # the cache could NEVER be placed (found via a max_seq=24
        # checkpoint under the default 64-wide bucket — the request
        # queued forever); the window check in _validate_request
        # guarantees p itself fits
        return min(super()._bucket(p), self.cache_len)

    def _park_slot(self, i: int) -> None:
        self._start_host[i] = self.t
        self._start_dirty = True

    def _park_pos(self, pos: int) -> None:
        self._start_host[pos] = self.t
        self._start_dirty = True

    def _gather_state(self, idx) -> None:
        self.cache, self.start, self.tok = _gather_slots(
            self.cache, self.start, self.tok,
            jnp.asarray(idx, jnp.int32))
        self._start_host = self._start_host[idx].copy()

    def _warm_after_drain(self) -> None:
        # a zero-shift roll compiles the same program as any shift —
        # without this the first cache wrap pays the compile mid-serve
        self.cache, self.start = _compact(self.cache, self.start,
                                          jnp.int32(0))
        big = self.boost * self.seg_len
        if self.boost > 1 and self.t + big <= self.cache_len:
            # compile the boosted segment program for this width on
            # COPIES (the program donates cache+rng; the live state
            # must survive the throwaway run)
            out = self._launch(jax.tree.map(jnp.copy, self.cache),
                               jax.random.PRNGKey(0), big)
            np.asarray(out[-1])

    def _pre_segment(self):
        if self._maybe_reprime() is _BLOCKED:
            return _BLOCKED
        # boost (scheduling.py _boosted_seg): fuse boost*seg_len steps
        # into one launch when the queue/eos/remaining conditions allow;
        # additionally pinned here by sliding slots (re-prime points are
        # scheduled at base-seg lookahead) and by KV-cache headroom
        seg = self._boosted_seg()
        if seg > self.seg_len and any(
                s.active and s.window for s in self.slots):
            seg = self.seg_len
        self._maybe_compact(seg)
        if self.t + seg > self.cache_len and seg > self.seg_len:
            # no headroom for the boosted launch even post-compaction
            # (the compact already rolled to the live window, so
            # re-compacting at the base length cannot free more)
            seg = self.seg_len
        if self.t + seg > self.cache_len:
            return _BLOCKED
        self._next_seg = seg
        if self._start_dirty:
            # drain tail: retirements parked slots in the mirror with no
            # admission to carry the refresh — ship the vector so the
            # segment's min(start) floor tightens to the live window
            self.start = jnp.asarray(self._start_host.astype(np.int32))
            self._start_dirty = False
        return None

    def _finalize(self, rid: int):
        self._sliding_prompts.pop(rid, None)
        super()._finalize(rid)

    # ------------------------------------------------------- internals

    def _maybe_reprime(self):
        """Sliding-window re-prime: any active slot whose context would
        exceed ``2 * window`` after the next segment gets its window
        rebuilt — the last ``window`` tokens of (prompt + emitted) are
        re-admitted into the SAME slot (one grouped prefill via the
        normal admission program), start jumps to ``t - window + 1``,
        and decoding continues. The per-request context evolution is
        exactly ``engine.generate_sliding``'s (seed ctx = prompt[-w:],
        re-prime at 2w with the last w), so greedy tokens match the
        dedicated sliding run when the re-prime points are
        segment-aligned (locked in tests/test_serving_sliding.py).

        Returns _BLOCKED when a re-prime is due but the host hasn't yet
        collected the slot's in-flight tokens (the run loop collects a
        segment and retries — the window text must be known to rebuild
        it)."""
        need = [(i, s) for i, s in enumerate(self.slots)
                if s.active and s.window
                and (self.t - self._start_host[i] + 1 + self.seg_len
                     > 2 * s.window)]
        if not need:
            return None
        for _, s in need:
            if len(self._emitted[s.rid]) < s.scheduled:
                return _BLOCKED      # window text still in flight
        if self.t + 1 > self.cache_len:
            # the re-prime scatter touches row t itself; a slot at a
            # sliding span never pins min(start) below seg_len + 1
            # (2w + seg <= cache_len), so compaction always frees room
            self._maybe_compact(1)
            if self.t + 1 > self.cache_len:
                return _BLOCKED
        groups: Dict[int, list] = {}          # window -> [(ctx, slot)]
        for i, s in need:
            w = s.window
            prompt = self._sliding_prompts[s.rid]
            em = np.asarray(self._emitted[s.rid], np.int32).reshape(
                (-1,) + prompt.shape[1:])
            ctx = np.concatenate([prompt, em])[-w:]
            self._start_host[i] = self.t - (w - 1)
            groups.setdefault(w, []).append((ctx, i))
        for w, grp in groups.items():
            rows = [c for c, _ in grp]
            ps = [w] * len(grp)
            idx = [i for _, i in grp]
            while len(rows) < self.b:         # duplicate-pad: idempotent
                rows.append(rows[0])
                ps.append(ps[0])
                idx.append(idx[0])
            self._admit_group(w, rows, ps, idx)
            self._n_admit_calls += 1
            self._n_reprimes += len(grp)
        # the admit groups shipped the whole start vector
        self._start_dirty = False
        return None

    def _t_device(self):
        """Device-resident clock scalar (host scalars cost a ~2 ms
        tunnel transfer per dispatch; the segment returns t+seg so the
        steady state never re-uploads)."""
        if self._t_dev is None:
            self._t_dev = jnp.int32(self.t)
        return self._t_dev

    def _maybe_compact(self, need_rows: int, extra_starts=None):
        """Ensure the next `need_rows` clock ticks stay in the cache.

        `extra_starts`: starts of requests grouped for admission in the
        CURRENT `_try_admit` pass but not yet marked active (their
        bookkeeping runs after the loop). They cap the shift exactly
        like active slots — without them a compaction triggered by a
        LATER pending request could drop the clock below an
        earlier-grouped request's start, producing a negative start and
        silently corrupt output. The list is mutated in place so the
        caller's absolute values track the shifted clock."""
        if self.t + need_rows <= self.cache_len:
            return
        act = [int(self._start_host[i]) for i, s in
               enumerate(self.slots) if s.active]
        act += list(extra_starts or ())
        if not act:
            self.t = 0
            self._t_dev = None
            return
        shift = min(act)
        if shift > 0:
            self.cache, self.start = _compact(
                self.cache, self.start, jnp.int32(shift))
            self._start_host -= shift
            self.t -= shift
            self._t_dev = None
            self._n_compactions += 1
            if extra_starts:
                for k in range(len(extra_starts)):
                    extra_starts[k] -= shift

    def _launch(self, cache, rng, seg: int):
        """Dispatch the mode's segment program (uniform static params
        vs per-row packed rows) for `seg` steps — shared by _segment
        and _warm_after_drain's boosted-program compile so the warm
        call signature can never diverge from the served one."""
        if self.per_row:
            if self._samp_dirty:
                self._samp_dev = jnp.asarray(self._samp_host)
                self._samp_dirty = False
            return _run_segment_perrow(
                self.model, self.params, cache, self.tok,
                self.start, self._samp_dev, self._t_device(), rng, seg)
        return _run_segment(
            self.model, self.params, cache, self.tok,
            self.start, self._t_device(), rng, seg, self.sp)

    def _segment(self):
        """Launch one compiled segment and advance the mirrors.
        Returns the [seg, B] token futures. The step count is
        _pre_segment's choice (seg_len, or the boosted length) —
        CONSUMED here so direct _segment() calls that bypass
        _pre_segment (warm()'s widths probes) run the base program."""
        seg = self._next_seg
        self._next_seg = self.seg_len
        self._last_seg = seg
        out = self._launch(self.cache, self.rng, seg)
        self.cache, self.tok, self._t_dev, self.rng, toks = out
        self.t += seg
        return toks

    def _try_admit(self):
        """Move pending requests into free slots (FIFO, skipping those
        whose prompt does not yet fit under the clock). Admissions are
        BATCHED: one `_admit` call per prompt bucket present, each a
        single prefill over the whole group (unused rows duplicate-
        padded)."""
        free = self._free_slots()
        if not free or not self.pending:
            return
        if len(free) == self.b and self.pending:
            # idle pool: jump the clock to fit the longest queued prompt
            need = max(q.prompt.shape[0] - 1 for q in self.pending)
            if self.t < need:
                self.t = need
                self._t_dev = None
            self.start, self.tok = _reset_free(
                self.start, self.tok,
                jnp.ones((self.b,), bool), jnp.int32(self.t))
            self._start_host[:] = self.t
            self._start_dirty = False
        groups: Dict[int, list] = {}          # pb -> [(q, slot)]
        remaining = []
        grouped_starts: list = []   # caps _maybe_compact's shift so a
        for q in self.pending:      # later compaction can't orphan an
            p = q.prompt.shape[0]   # earlier-grouped request
            if not free:
                remaining.append(q)
                continue
            # rows the admission touches: [t-p+1, t-p+1+Pb)
            self._maybe_compact(max(self.seg_len, q.pb - p + 1),
                                grouped_starts)
            if p - 1 > self.t or self.t - (p - 1) + q.pb > self.cache_len:
                remaining.append(q)   # wait for the clock to advance
                continue
            groups.setdefault(q.pb, []).append((q, free.pop(0)))
            grouped_starts.append(self.t - (p - 1))
        if groups:
            # the host start mirror is shipped whole (meta row 2):
            # admitted slots at t-p+1, every still-free slot PARKED at
            # the clock so min(start) tracks the true live window
            self._start_host[free] = self.t
            for grp in groups.values():
                for q, slot in grp:
                    self._start_host[slot] = self.t - (q.prompt.shape[0] - 1)
                    self._admit_bookkeeping(q, slot)
                    w = (q.extra or {}).get("window", 0)
                    self.slots[slot].window = w
                    if w:
                        self._sliding_prompts[q.rid] = q.prompt
            self._start_dirty = False
        for pb, grp in groups.items():
            rows = [q.padded for q, _ in grp]
            ps = [q.prompt.shape[0] for q, _ in grp]
            slots_idx = [slot for _, slot in grp]
            while len(rows) < self.b:         # duplicate-pad: idempotent
                rows.append(rows[0])
                ps.append(ps[0])
                slots_idx.append(slots_idx[0])
            self._admit_group(pb, rows, ps, slots_idx)
            self._n_admit_calls += 1
            self._n_admitted += len(grp)
        self.pending = remaining

    def _admit_group(self, pb: int, rows, ps, slots_idx):
        """ONE host->device transfer per group: prompts [S, Pb] with
        the three meta rows (ps, slot ids, full start vector) appended
        as trailing int32 columns (the CP engine overrides with [P, 8]
        row prompts flattened into the same packed layout)."""
        packed = np.empty((self.b, pb + 3), np.int32)
        packed[:, :pb] = rows
        packed[:, pb] = ps
        packed[:, pb + 1] = slots_idx
        packed[:, pb + 2] = self._start_host
        self.cache, self.start, self.tok = _admit(
            self.model, self.params, self.cache,
            self.tok, jnp.asarray(packed), self._t_device())
