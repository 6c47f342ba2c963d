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
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import align_cache_len
from .sampling import SamplingParams, sample_logits


# _dispatch result: cache full until an in-flight retirement lands
_BLOCKED = object()


@dataclasses.dataclass
class _Slot:
    rid: int = -1
    active: bool = False
    max_new: int = 0
    eos_id: Optional[int] = None
    emitted: List[int] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class _Pending:
    rid: int
    prompt: np.ndarray
    max_new: int
    eos_id: Optional[int]


@functools.partial(jax.jit, static_argnames=("model", "seg", "sp"),
                   donate_argnames=("cache",))
def _run_segment(model, params, cache, tok, start, t, rng,
                 seg: int, sp: SamplingParams):
    """seg decode+sample steps as one scan. tok/start: [B]; t: scalar.
    Returns (cache, tok, t, sampled [seg, B])."""

    def body(carry, rng_i):
        cache, t, tok = carry
        logits, cache = model.apply(
            {"params": params}, tok, cache, t, start,
            method=model.decode_step)
        nxt = sample_logits(rng_i, logits, sp)
        return (cache, t + 1, nxt), nxt

    rngs = jax.random.split(rng, seg)
    (cache, t, tok), toks = jax.lax.scan(
        body, (cache, jnp.asarray(t, jnp.int32), tok), rngs)
    return cache, tok, t, toks


@functools.partial(jax.jit, static_argnames=("model",))
def _admit(model, params, cache, start, tok, prompt_pad, p, slot, t):
    """Prefill prompt_pad[:, :p-1] (positions 0..p-2) and scatter its
    K/V into rows [t-p+1, t) of `slot`; the prompt's LAST token becomes
    the slot's pending input (consumed at row t by the next step).
    prompt_pad: [1, Pb] padded to a static bucket; p: dynamic true
    length. Bucket garbage rows land at rows >= t — always strictly
    future, each overwritten by a decode step before anything attends
    it."""
    k_all, v_all = cache["k"], cache["v"]
    row0 = t - (p - 1)
    # prefill computes K/V for all Pb positions; rows >= p-1 are
    # causal-masked garbage (pad_id keys) and land strictly past t
    _, pre = model.apply({"params": params}, prompt_pad,
                         prompt_pad.shape[1], method=model.prefill)
    if k_all.ndim == 4:                      # fused layout [L, B, S, d]
        idx = (0, slot, row0, 0)
    else:                                    # xla layout [L, B, H, S, dh]
        idx = (0, slot, 0, row0, 0)
    k_all = jax.lax.dynamic_update_slice(
        k_all, pre["k"].astype(k_all.dtype), idx)
    v_all = jax.lax.dynamic_update_slice(
        v_all, pre["v"].astype(v_all.dtype), idx)
    start = start.at[slot].set(row0)
    last = prompt_pad[0, p - 1]
    tok = tok.at[slot].set(last)
    return {"k": k_all, "v": v_all}, start, tok


@jax.jit
def _compact(cache, start, shift):
    """Shift every slot's row window left by `shift` (clock drop).
    Rows wrapped from the front by the roll are strictly past the new
    clock for every slot and get overwritten before being attended."""
    axis = cache["k"].ndim - 2
    cache = {k: jnp.roll(v, -shift, axis=axis) for k, v in cache.items()}
    return cache, start - shift


@jax.jit
def _reset_free(start, tok, free_mask, t):
    """Park free slots at start = t (span never exceeds one segment)."""
    return (jnp.where(free_mask, jnp.asarray(t, jnp.int32), start),
            jnp.where(free_mask, 0, tok))


class ContinuousBatcher:
    """Continuous-batching decode over a fixed slot pool.

    >>> cb = ContinuousBatcher(model, params, slots=8)
    >>> rid = cb.submit(prompt_ids, max_new=256)
    >>> outs = cb.run()          # {rid: np.ndarray of generated ids}

    ``submit`` may be called at any time (including between ``step``
    calls); ``run`` drains the queue. Greedy sampling is token-identical
    to per-request ``generate`` runs of the same batch width.
    """

    def __init__(self, model, params, *, slots: int = 8,
                 sampling: SamplingParams = SamplingParams(),
                 seg_len: int = 64, cache_len: Optional[int] = None,
                 prompt_bucket: int = 64, depth: int = 2,
                 rng: Optional[jax.Array] = None):
        self.model = model
        self.params = params
        self.b = slots
        self.sp = sampling
        self.seg_len = seg_len
        max_seq = getattr(model, "max_seq", 2048)
        self.cache_len = align_cache_len(
            model, min(cache_len or max_seq, max_seq))
        if self.cache_len <= seg_len:
            raise ValueError(f"cache_len {self.cache_len} must exceed "
                             f"seg_len {seg_len}")
        self.prompt_bucket = prompt_bucket
        # segments in flight before the host waits for tokens. depth=2
        # overlaps segment k+1's device compute with the host fetch of
        # segment k's tokens (one full tunnel round-trip, ~20-28 ms on
        # this TPU vs ~10 ms of segment compute); scheduling decisions
        # then lag one segment (a retiring slot idles <= 2*seg_len-1
        # steps instead of <= seg_len-1). depth=1 is fully synchronous.
        self.depth = depth
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.cache = model.apply({"params": params}, slots,
                                 self.cache_len, method=model.init_cache)
        self.t = 0                      # host mirror of the clock
        self.start = jnp.zeros((slots,), jnp.int32)
        # exact host mirror of `start` (admissions/compactions/resets
        # are all host-decided) — scheduling never reads the device
        self._start_host = np.zeros((slots,), np.int64)
        self.tok = jnp.zeros((slots,), jnp.int32)
        self.slots = [_Slot() for _ in range(slots)]
        self.pending: List[_Pending] = []
        self.done: Dict[int, np.ndarray] = {}
        self._next_rid = 0
        self._pad_id = getattr(model, "pad_id", 0)

    # ---------------------------------------------------------- submit

    def submit(self, prompt, max_new: int,
               eos_id: Optional[int] = None) -> int:
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if prompt.size == 0:
            raise ValueError("empty prompt")
        # a slot's row span can overshoot max_new by up to depth+1
        # segments before the pipelined host notices the retirement
        cap = prompt.size + max_new + (self.depth + 1) * self.seg_len
        limit = min(self.cache_len,
                    getattr(self.model, "max_seq", self.cache_len))
        if cap > limit:
            raise ValueError(
                f"prompt ({prompt.size}) + max_new ({max_new}) + "
                f"(depth {self.depth} + 1) * seg_len ({self.seg_len}) "
                f"exceeds the serve window ({limit}); shorten the "
                "request or raise cache_len")
        rid = self._next_rid
        self._next_rid += 1
        self.pending.append(_Pending(rid, prompt, max_new, eos_id))
        return rid

    # ------------------------------------------------------- internals

    def _free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if not s.active]

    def _maybe_compact(self, need_rows: int):
        """Ensure the next `need_rows` clock ticks stay in the cache."""
        if self.t + need_rows <= self.cache_len:
            return
        act = [int(self._start_host[i]) for i, s in
               enumerate(self.slots) if s.active]
        if not act:
            self.t = 0
            return
        shift = min(act)
        if shift > 0:
            self.cache, self.start = _compact(
                self.cache, self.start, jnp.int32(shift))
            self._start_host -= shift
            self.t -= shift

    def _bucket(self, p: int) -> int:
        b = self.prompt_bucket
        return max(b, -(-p // b) * b)

    def _try_admit(self):
        """Move pending requests into free slots (FIFO, skipping those
        whose prompt does not yet fit under the clock)."""
        free = self._free_slots()
        if not free or not self.pending:
            return
        if len(free) == self.b and self.pending:
            # idle pool: jump the clock to fit the longest queued prompt
            need = max(q.prompt.size - 1 for q in self.pending)
            if self.t < need:
                self.t = need
            self.start, self.tok = _reset_free(
                self.start, self.tok,
                jnp.ones((self.b,), bool), jnp.int32(self.t))
            self._start_host[:] = self.t
        remaining = []
        for q in self.pending:
            p = q.prompt.size
            if not free:
                remaining.append(q)
                continue
            pb = self._bucket(p)
            # rows the admission touches: [t-p+1, t-p+1+Pb)
            self._maybe_compact(max(self.seg_len, pb - p + 1))
            if p - 1 > self.t or self.t - (p - 1) + pb > self.cache_len:
                remaining.append(q)   # wait for the clock to advance
                continue
            slot = free.pop(0)
            pad = np.full((1, pb), self._pad_id, np.int32)
            pad[0, :p] = q.prompt
            self.cache, self.start, self.tok = _admit(
                self.model, self.params, self.cache, self.start,
                self.tok, jnp.asarray(pad), jnp.int32(p),
                jnp.int32(slot), jnp.int32(self.t))
            self._start_host[slot] = self.t - (p - 1)
            s = self.slots[slot]
            s.rid, s.active, s.max_new = q.rid, True, q.max_new
            s.eos_id, s.emitted = q.eos_id, []
        self.pending = remaining

    def _retire(self, slot: int):
        s = self.slots[slot]
        toks = s.emitted[:s.max_new]
        if s.eos_id is not None and s.eos_id in toks:
            toks = toks[:toks.index(s.eos_id)]
        self.done[s.rid] = np.asarray(toks, np.int32)
        s.rid, s.active, s.emitted = -1, False, []

    # ------------------------------------------------------------ step

    def _dispatch(self):
        """Admit pending requests, then launch one segment WITHOUT
        waiting for its tokens. Returns (token futures [seg, B],
        occupancy [(slot, rid)]), None if nothing is active, or
        _BLOCKED if the cache has no room for another segment until an
        in-flight retirement is collected (a slot the device already
        finished still grows its row span until the host sees its
        tokens)."""
        self._try_admit()
        if not any(s.active for s in self.slots):
            return None
        self._maybe_compact(self.seg_len)
        if self.t + self.seg_len > self.cache_len:
            return _BLOCKED
        free_mask = np.array([not s.active for s in self.slots])
        if free_mask.any():
            self.start, self.tok = _reset_free(
                self.start, self.tok, jnp.asarray(free_mask),
                jnp.int32(self.t))
            self._start_host[free_mask] = self.t
        self.rng, seg_rng = jax.random.split(self.rng)
        self.cache, self.tok, _, toks = _run_segment(
            self.model, self.params, self.cache, self.tok, self.start,
            jnp.int32(self.t), seg_rng, self.seg_len, self.sp)
        self.t += self.seg_len
        occ = [(i, s.rid) for i, s in enumerate(self.slots) if s.active]
        return toks, occ

    def _collect(self, item):
        """Wait for a dispatched segment's tokens; attribute, retire."""
        toks, occ = item
        toks = np.asarray(toks)          # [seg, B] — the one host sync
        for i, rid in occ:
            s = self.slots[i]
            if not s.active or s.rid != rid:
                continue                 # slot retired mid-pipeline
            s.emitted.extend(int(x) for x in toks[:, i])
            hit_eos = (s.eos_id is not None
                       and s.eos_id in s.emitted[:s.max_new])
            if len(s.emitted) >= s.max_new or hit_eos:
                self._retire(i)

    def step(self) -> bool:
        """Admit, run one compiled segment synchronously, collect.
        Returns True while any work remains."""
        item = self._dispatch()
        if item is not None and item is not _BLOCKED:
            self._collect(item)
        return bool(self.pending) or any(s.active for s in self.slots)

    def run(self) -> Dict[int, np.ndarray]:
        """Drain the queue; returns {rid: generated ids [<= max_new]}.

        Keeps up to `depth` segments in flight so the host token fetch
        (a full tunnel round-trip) overlaps the next segment's device
        compute."""
        from collections import deque

        inflight: deque = deque()
        stalled = 0
        while True:
            while len(inflight) < self.depth:
                item = self._dispatch()
                if item is None or item is _BLOCKED:
                    # _BLOCKED: collecting an in-flight segment frees
                    # room (it surfaces retirements -> compaction gains)
                    break
                inflight.append(item)
            if not inflight:
                if self.pending:     # nothing active, nothing in flight
                    stalled += 1     # -> idle-pool clock jump admits
                    if stalled > 2:  # cannot happen for valid submits
                        raise RuntimeError(
                            f"{len(self.pending)} pending requests "
                            "cannot be admitted (prompt exceeds the "
                            "serve window?)")
                    continue
                break
            stalled = 0
            self._collect(inflight.popleft())
        out, self.done = self.done, {}
        return out
