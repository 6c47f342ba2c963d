"""Shared slot-pool scheduler for the continuous-batching engines.

The host-side scheduling problem is identical for the transformer
engine (decode/serving.py — KV-cache slots, clock, compaction) and the
RNN engine (decode/serving_rnn.py — O(1) hidden-state slots): a fixed
pool of B slots, FIFO admission into free slots, decode in compiled
segments, count-based retirement at dispatch for eos-free requests,
token-inspecting retirement for eos requests, pipelined dispatch,
drain-tail pool shrinking, cancellation, streaming delivery, and
per-request latency accounting. This base class owns all of that;
subclasses own the device state and the three programs that touch it
(admission, segment, resize-gather).

The reference has no serving story at all — its generation is a
per-request Python loop (MusicTransformer/network.py:44-80,
Event_MelodyRNN/network.py:119-164); both engines replace running those
scripts in a shell loop.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from .sampling import SamplingParams, pack_sampling

# _dispatch result: device state full until an in-flight retirement
# lands (transformer cache-clock overrun; never returned by the RNN
# engine whose state is O(1) per slot)
_BLOCKED = object()


@dataclasses.dataclass
class _Slot:
    rid: int = -1
    active: bool = False
    max_new: int = 0
    eos_id: Optional[int] = None
    scheduled: int = 0            # slot-steps dispatched for this rid
    window: int = 0               # sliding context width (0 = bounded)


@dataclasses.dataclass
class _Pending:
    rid: int
    prompt: np.ndarray
    max_new: int
    eos_id: Optional[int]
    padded: np.ndarray = None     # [Pb] host copy at the bucket width
    pb: int = 0                   # its static bucket width
    samp: tuple = None            # pack_sampling() ints (per-row mode)
    extra: dict = None            # engine-specific payload (init/ctrl)


class SlotScheduler:
    """Host-side continuous-batching scheduler over a fixed slot pool.

    Subclasses implement the device side:

    * ``_try_admit()`` — move pending requests into free slots (FIFO;
      may leave requests queued if the engine can't take them yet) and
      fill the per-request bookkeeping via ``_admit_bookkeeping``.
    * ``_segment()`` — launch one compiled segment of ``seg_len`` decode
      steps, return the ``[seg, B]`` token futures.
    * ``_gather_state(idx)`` — re-pool device state to the slot order
      ``idx`` (drain-tail shrink / grow-back).

    and may override the hooks ``_pre_segment`` (room check / state
    refresh before a dispatch; return ``_BLOCKED`` to defer),
    ``_park_slot(i)`` (a slot freed by retirement/cancel),
    ``_park_pos(pos)`` (a duplicate row created by pool growth),
    ``_validate_request`` (engine-specific submit validation + extra
    payload), and ``_warm_after_drain`` (extra compiles after warm).
    """

    def __init__(self, *, slots: int, sampling: SamplingParams,
                 seg_len: int, prompt_bucket: int, depth: int,
                 min_slots: int, per_row_sampling: bool,
                 on_finalize: Optional[Callable],
                 rng: Optional[jax.Array], pad_id: int,
                 boost: int = 1):
        if boost < 1:
            raise ValueError(f"boost must be >= 1, got {boost}")
        self.b = slots
        # drain-tail pool shrinking: with the queue empty the pool
        # halves (down to min_slots) once active requests fit — per-step
        # cost scales with B, so a 4-survivor tail should not pay the
        # 32-wide program. min_slots >= slots disables resizing.
        self._full_b = slots
        self._min_b = min(min_slots, slots)
        self.sp = sampling
        self.seg_len = seg_len
        self._last_seg = seg_len      # steps of the segment in flight
        self.boost = boost            # multi-segment fused dispatch
                                      # (see _boosted_seg)
        self.prompt_bucket = prompt_bucket
        # segments in flight before the host waits for tokens. Count-
        # retired requests (no eos) schedule without reading the device,
        # so depth costs them nothing; it bounds run-ahead memory and,
        # for eos-bearing requests only, the retirement lag (such a slot
        # idles up to depth*seg_len steps past its eos). depth=1 is
        # fully synchronous.
        self.depth = depth
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        # per-row sampling: each slot decodes under its OWN request's
        # params (packed int32 rows — floats bitcast). Host mirror is
        # authoritative; the device copy re-ships only when an
        # admission or resize changed a row (dirty flag), so the steady
        # state adds zero transfers. Opt-in: the flag selects the
        # per-row segment program once, at construction — flipping
        # mid-serve would recompile.
        self.per_row = per_row_sampling
        self._samp_host = np.tile(
            np.asarray(pack_sampling(sampling), np.int32), (slots, 1))
        self._samp_dev = None
        self._samp_dirty = True
        self.slots = [_Slot() for _ in range(slots)]
        self.pending: List[_Pending] = []
        self.done: Dict[int, np.ndarray] = {}
        self._emitted: Dict[int, List[int]] = {}   # rid -> tokens so far
        self._req: Dict[int, tuple] = {}           # rid -> (max_new, eos)
        # streaming delivery: called (rid, tokens) the moment a request
        # finalizes — mid-drain, segments ahead still in flight — so
        # callers ship results without waiting for the queue to empty.
        # Keep it cheap: it runs on the scheduling thread between
        # dispatches (warm()'s throwaway request is suppressed).
        self.on_finalize = on_finalize
        self._warming = False
        # per-request wall-clock: rid -> {submit, admit, done} seconds
        # (perf_counter); admit is the prefill dispatch, done the host
        # commit — done-submit is the e2e latency a client observes,
        # admit-submit the queue wait. Both the summary samples and the
        # per-rid entries are BOUNDED so a long-running server doesn't
        # grow (or pay an ever-larger percentile sort) per request.
        self.times: Dict[int, Dict[str, float]] = {}
        self._lat = deque(maxlen=4096)     # (e2e, wait|None) samples
        self._n_finalized = 0              # lifetime finalize counter
        self._fin_rids = deque()           # finalized rids, prune order
        self._times_cap = 8192
        self._next_rid = 0
        self._pad_id = pad_id
        self._async_fetch = jax.default_backend() != "cpu"
        # observability: cumulative scheduler counters (stats())
        self._n_segments = 0
        self._n_slot_steps = 0
        self._n_active_slot_steps = 0
        self._n_admit_calls = 0
        self._n_admitted = 0
        self._n_committed = 0

    # ------------------------------------------------------------ hooks

    def _canon_prompt(self, prompt) -> np.ndarray:
        """Canonical prompt array: axis 0 is the step axis (default
        flat int32 ids; the CP engine overrides with [P, 8] rows)."""
        return np.asarray(prompt, np.int32).reshape(-1)

    def _warm_prompt(self, n: int) -> np.ndarray:
        """The warm() probe prompt at length n (engine token shape)."""
        return np.ones(n, np.int32)

    def _empty_result(self) -> np.ndarray:
        """A zero-length result in the engine's token shape (the CP
        engine overrides with [0, 8] so empty results keep the
        documented row contract)."""
        return np.zeros((0,), np.int32)

    def _validate_request(self, prompt: np.ndarray, max_new: int,
                          eos_id: Optional[int], kw: dict) -> dict:
        """Engine-specific submit validation. Returns the extra payload
        stored on the pending entry; must consume/reject every kwarg."""
        if kw:
            raise TypeError(f"unexpected submit() arguments: "
                            f"{sorted(kw)}")
        return {}

    def _park_slot(self, i: int) -> None:
        """A slot freed by retirement or cancel (override to park
        engine mirrors, e.g. the transformer's start vector)."""

    def _park_pos(self, pos: int) -> None:
        """A duplicate row created by pool growth became a free slot."""

    def _pre_segment(self):
        """Room check / device-state refresh before a dispatch. Return
        ``_BLOCKED`` to defer until an in-flight segment is collected."""
        return None

    def _boosted_seg(self) -> int:
        """The step count an engine with ``self.boost > 1`` should
        dispatch: ``boost*seg_len`` when the queue is empty and every
        active slot is eos-free with at least that many steps left
        (a longer launch must never delay admission or eos
        retirement), else ``seg_len``. An all-free pool (warm()'s
        widths probe) also returns ``seg_len`` so warm compiles the
        BASE program per width — the boosted variant is the engine's
        ``_warm_after_drain`` job. The engine records the chosen
        length in ``_last_seg`` before launching."""
        if self.boost <= 1 or self.pending:
            return self.seg_len
        big = self.boost * self.seg_len
        any_active = False
        for s in self.slots:
            if s.active:
                any_active = True
                if (s.eos_id is not None
                        or s.max_new - s.scheduled < big):
                    return self.seg_len
        return big if any_active else self.seg_len

    def _warm_after_drain(self) -> None:
        """Extra compiles after the warm request drains (per width)."""

    def _eos_index(self, toks, eos_id) -> Optional[int]:
        """Index of the first eos hit in a token list, or None. The CP
        engine overrides to match the FAMILY column of compound rows."""
        for j, x in enumerate(toks):
            if x == eos_id:
                return j
        return None

    def _try_admit(self) -> None:
        raise NotImplementedError

    def _segment(self):
        raise NotImplementedError

    def _gather_state(self, idx: List[int]) -> None:
        raise NotImplementedError

    # ------------------------------------------------------------ stats

    def stats(self) -> Dict[str, float]:
        """Cumulative scheduler counters: segments dispatched, slot-step
        occupancy (active slot-steps / dispatched slot-steps — the
        fraction of decode work that belonged to live requests),
        committed tokens (delivered, post-trim), admission calls/
        requests. Resets never; diff across calls for per-window
        rates."""
        dispatched = self._n_slot_steps
        return {
            "segments": self._n_segments,
            "slot_steps": dispatched,
            "active_slot_steps": self._n_active_slot_steps,
            "occupancy": (self._n_active_slot_steps / dispatched
                          if dispatched else 0.0),
            "committed_tokens": self._n_committed,
            "admit_calls": self._n_admit_calls,
            "admitted": self._n_admitted,
        }

    def latency_summary(self) -> Dict[str, float]:
        """Client-side request latency over the most recent finalized
        requests (a bounded 4096-sample window): e2e (submit -> host
        commit) and queue wait (submit -> prefill dispatch) p50/p95 in
        seconds. e2e includes pipeline lag — an
        eos-bearing request's slot retires up to `depth` segments after
        its eos, and commit waits for the segment fetch — so this is
        the number a caller actually observes, not device decode time."""
        e2e = sorted(s[0] for s in self._lat)
        wait = sorted(s[1] for s in self._lat if s[1] is not None)
        if not e2e:
            return {"n": 0, "n_finalized": self._n_finalized}
        q = lambda xs, f: xs[min(len(xs) - 1, int(f * len(xs)))]
        # wait can be empty while e2e is not: a request cancelled while
        # still QUEUED records done but never admit.  `n` is the SAMPLE
        # WINDOW size (caps at 4096); `n_finalized` is the lifetime
        # finalized-request counter for cumulative monitoring.
        return {"n": len(e2e), "n_finalized": self._n_finalized,
                "e2e_p50": q(e2e, 0.5), "e2e_p95": q(e2e, 0.95),
                "wait_p50": q(wait, 0.5) if wait else 0.0,
                "wait_p95": q(wait, 0.95) if wait else 0.0}

    # ------------------------------------------------------------ warm

    def warm(self, prompt_len: int = 1, max_new: Optional[int] = None,
             widths: bool = False, window: Optional[int] = None):
        """Compile the engine's programs before real traffic: one
        admission (at prompt_len's bucket) + segment (+ whatever
        ``_warm_after_drain`` adds — without this the first cache wrap
        pays its compile mid-serve, ~0.8 s on the tunneled v5e).
        widths=True also compiles the drain-tail shrink chain (gather +
        segment per halved width). window=W decodes the warm probe as a
        sliding request long enough to compile the re-prime admission
        (transformer engines only)."""
        if self.pending or any(s.active for s in self.slots):
            # warm()'s internal run() would drain (and, under _warming,
            # silently discard) any real request already submitted
            raise RuntimeError(
                "warm() must run before real traffic: the pool has "
                "pending or active requests whose results the warm "
                "drain would discard")
        p = self._warm_prompt(max(1, prompt_len))
        self._warming = True
        rid = None
        try:
            kw = {} if window is None else {"window": window}
            default_new = 2 * window if window else self.seg_len
            rid = self.submit(p, max_new or default_new, **kw)
            self.run()
        finally:
            self._warming = False
            self.times.pop(rid, None)
        self._warm_after_drain()
        if not widths:
            return
        while self.b // 2 >= self._min_b:
            self._resize(self.b // 2)
            np.asarray(self._segment())
            self._warm_after_drain()
        self._resize(self._full_b)

    # ---------------------------------------------------------- submit

    def submit(self, prompt, max_new: int,
               eos_id: Optional[int] = None,
               sampling: Optional[SamplingParams] = None, **kw) -> int:
        prompt = self._canon_prompt(prompt)
        if prompt.shape[0] == 0:
            raise ValueError("empty prompt")
        if sampling is not None and not self.per_row:
            raise ValueError(
                "per-request sampling needs per_row_sampling=True — the "
                "flag picks the per-row segment program at construction")
        extra = self._validate_request(prompt, max_new, eos_id, kw)
        # an engine may substitute the admitted context (e.g. the
        # sliding-window engine trims to the last `window` tokens —
        # generate_sliding's ctx = prompt[-window:] semantics)
        prompt = extra.pop("_prompt", prompt)
        rid = self._next_rid
        self._next_rid += 1
        # pad on the host now; the device transfer happens per
        # ADMISSION GROUP (one packed put per event) — per-request
        # device_puts cost ~2 ms of tunnel latency each, a 0.5 s tax
        # on a 256-request burst
        pb = self._bucket(prompt.shape[0])
        pad = np.full((pb,) + prompt.shape[1:], self._pad_id, np.int32)
        pad[:prompt.shape[0]] = prompt
        self.pending.append(_Pending(
            rid, prompt, max_new, eos_id, padded=pad, pb=pb,
            samp=pack_sampling(sampling or self.sp), extra=extra))
        self.times[rid] = {"submit": time.perf_counter()}
        return rid

    # ---------------------------------------------------------- cancel

    def cancel(self, rid: int) -> bool:
        """Cancel a request. Queued requests are dropped outright; an
        ACTIVE request's slot frees at the next dispatch, and whatever
        tokens it produced are delivered through `done` (trimmed like a
        normal finalize — callers distinguish a cancelled result only
        by having asked for the cancel). Returns False for unknown/
        already-finished rids. Cancelling costs no extra dispatch: it
        is pure host bookkeeping."""
        for q in self.pending:
            if q.rid == rid:
                self.pending.remove(q)
                self.done[rid] = self._empty_result()
                self.times[rid]["done"] = time.perf_counter()
                self._record_latency(rid)
                # queued cancels honor the streaming-delivery contract
                # too: step()-driven embedders that clear `done` after
                # each on_finalize would otherwise silently lose the
                # (empty) result of a queued cancel.
                if self.on_finalize is not None and not self._warming:
                    self.on_finalize(rid, self.done[rid])
                return True
        for i, s in enumerate(self.slots):
            if s.active and s.rid == rid:
                s.rid, s.active = -1, False
                self._park_slot(i)
                # deliver what's been collected so far (in-flight
                # segments may still append before the fetch lands;
                # _collect skips rids no longer in _req)
                self._finalize(rid)
                return True
        return False

    # ------------------------------------------------------- internals

    def _record_latency(self, rid: int) -> None:
        """Push the finalized request's latency sample and prune the
        oldest per-rid entries past the cap (warm probes excluded)."""
        if self._warming:
            return
        t = self.times.get(rid)
        if t is None or "done" not in t:
            return
        self._n_finalized += 1
        wait = (t["admit"] - t["submit"]) if "admit" in t else None
        self._lat.append((t["done"] - t["submit"], wait))
        self._fin_rids.append(rid)
        while len(self._fin_rids) > self._times_cap:
            self.times.pop(self._fin_rids.popleft(), None)

    def _free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if not s.active]

    def _bucket(self, p: int) -> int:
        b = self.prompt_bucket
        return max(b, -(-p // b) * b)

    def _admit_bookkeeping(self, q: _Pending, slot: int) -> None:
        """Per-request host bookkeeping at admission time (shared by
        every engine's `_try_admit`)."""
        self._samp_host[slot] = q.samp
        self._samp_dirty = True
        s = self.slots[slot]
        s.rid, s.active, s.max_new = q.rid, True, q.max_new
        s.eos_id, s.scheduled = q.eos_id, 0
        self._emitted[q.rid] = []
        self._req[q.rid] = (q.max_new, q.eos_id)
        self.times[q.rid]["admit"] = time.perf_counter()

    def _resize(self, width: int):
        """Re-pool to `width` slots: one jitted gather along the batch
        axis (active slots first; growth pads by duplicating row 0 —
        the duplicates become free slots)."""
        order = [i for i, s in enumerate(self.slots) if s.active]
        order += [i for i, s in enumerate(self.slots) if not s.active]
        idx = order[:width]
        dup = max(0, width - len(idx))
        idx = idx + [order[0]] * dup
        self._gather_state(idx)
        self._samp_host = self._samp_host[idx].copy()
        self._samp_dirty = True
        new_slots, seen = [], set()
        for pos, i in enumerate(idx):
            s = self.slots[i]
            if i in seen or not s.active:
                new_slots.append(_Slot())
                if i in seen:                 # growth duplicate: park
                    self._park_pos(pos)
            else:
                new_slots.append(s)
                seen.add(i)
        self.slots = new_slots
        self.b = width

    def _maybe_resize(self):
        """Shrink in the drain tail (no pending, actives fit in half the
        pool); grow back to full width as soon as work queues."""
        if self.pending:
            if self.b < self._full_b:
                self._resize(self._full_b)
            return
        n_act = sum(s.active for s in self.slots)
        if n_act == 0:
            return
        width = self.b
        while width // 2 >= self._min_b and n_act <= width // 2:
            width //= 2
        if width < self.b:
            self._resize(width)

    def _assemble_result(self, toks: List, max_new: int,
                         eos_id) -> np.ndarray:
        """Emitted segment units -> the request's result array. The
        default trims to max_new and cuts at eos; the PoPMAG engine
        overrides to flatten per-bar blocks into a token stream."""
        toks = toks[:max_new]
        if eos_id is not None:
            cut = self._eos_index(toks, eos_id)
            if cut is not None:
                toks = toks[:cut]
        arr = np.asarray(toks, np.int32)
        if arr.shape[0] == 0:
            arr = self._empty_result()   # keep the engine's token shape
        return arr

    def _finalize(self, rid: int):
        max_new, eos_id = self._req.pop(rid)
        self.done[rid] = self._assemble_result(
            self._emitted.pop(rid), max_new, eos_id)
        self._n_committed += len(self.done[rid])
        self.times[rid]["done"] = time.perf_counter()
        self._record_latency(rid)
        if self.on_finalize is not None and not self._warming:
            self.on_finalize(rid, self.done[rid])

    # ------------------------------------------------------------ step

    def _dispatch(self):
        """Admit pending requests, then launch one segment WITHOUT
        waiting for its tokens. Returns (token futures [seg, B],
        occupancy [(slot, rid)]), None if nothing is active, or
        _BLOCKED if the engine has no room for another segment until an
        in-flight retirement is collected.

        Requests WITHOUT an eos_id retire BY COUNT, here, at dispatch
        time: the host knows a slot has covered max_new after
        ceil(max_new/seg_len) segments without reading a single token,
        so the slot frees for the next admission immediately — no
        pipeline-lag waste, and scheduling never blocks on the device.
        Only eos-bearing requests must wait for _collect to inspect
        tokens (their slots idle up to depth segments after the eos)."""
        self._maybe_resize()
        self._try_admit()
        if not any(s.active for s in self.slots):
            return None
        if self._pre_segment() is _BLOCKED:
            return _BLOCKED
        toks = self._segment()
        # start the device->host token copy NOW: a blocking fetch pays
        # the full ~25 ms tunnel round-trip however deep the pipeline
        # (fetches serialize); the async copy rides ahead so _collect's
        # np.asarray finds the data already local (measured 25.6 ->
        # 11.8 ms/segment on the segment-shaped probe).
        #
        # CPU backend: fetch SYNCHRONOUSLY here instead. jax 0.9's CPU
        # runtime intermittently returns STALE memory when a buffer is
        # fetched while several donated-buffer programs are still
        # enqueued behind its producer (reproduced ~1-in-5 processes at
        # pipeline depth 4; collects of LATER segments proved the
        # device-side stream itself correct — the long-standing
        # test_serving_per_row_mixed_sampling flake). Pipelined fetch
        # only pays on the tunneled TPU anyway; on CPU the early
        # materialization costs nothing and removes the race.
        if self._async_fetch:
            try:
                toks.copy_to_host_async()
            except AttributeError:
                pass
        else:
            toks = np.asarray(toks)
        occ = [(i, s.rid) for i, s in enumerate(self.slots) if s.active]
        # engines may dispatch a LONGER segment than seg_len (the RNN
        # engine's boost mode fuses several segments into one launch to
        # amortize per-segment dispatch/fetch RTT); _segment() records
        # the actual step count in _last_seg
        seg = self._last_seg
        self._last_seg = self.seg_len
        self._n_segments += 1
        self._n_slot_steps += self.b * seg
        self._n_active_slot_steps += len(occ) * seg
        for i, s in enumerate(self.slots):
            if s.active:
                s.scheduled += seg
                if s.eos_id is None and s.scheduled >= s.max_new:
                    s.rid, s.active = -1, False   # count retirement
                    self._park_slot(i)
        return toks, occ

    def _collect(self, item):
        """Wait for a dispatched segment's tokens; attribute, finalize.
        Count-retired slots were already freed at dispatch; this only
        delivers their tokens (and drives eos retirement)."""
        toks, occ = item
        toks = np.asarray(toks)          # [seg, B] — the one host sync
        for i, rid in occ:
            if rid not in self._req:
                continue                 # finalized mid-pipeline (eos)
            em = self._emitted[rid]
            em.extend(toks[:, i])       # scalars, or [8] compound rows
            max_new, eos_id = self._req[rid]
            if eos_id is None:
                if len(em) >= max_new:
                    self._finalize(rid)
                continue
            hit_eos = self._eos_index(em[:max_new], eos_id) is not None
            if len(em) >= max_new or hit_eos:
                # resolve by rid, not the segment's slot index — a
                # pool resize may have moved the slot since dispatch
                for k, s in enumerate(self.slots):
                    if s.active and s.rid == rid:
                        s.rid, s.active = -1, False
                        self._park_slot(k)
                        break
                self._finalize(rid)

    def step(self) -> bool:
        """Admit, run one compiled segment synchronously, collect.
        Returns True while any work remains."""
        item = self._dispatch()
        if item is not None and item is not _BLOCKED:
            self._collect(item)
        return bool(self.pending) or any(s.active for s in self.slots)

    def run(self) -> Dict[int, np.ndarray]:
        """Drain the queue; returns {rid: generated ids [<= max_new]}.

        Keeps up to `depth` segments in flight: dispatch (including
        count-based retirement and re-admission) runs ahead of the
        token fetches, so the device decodes back-to-back while the
        host trails collecting already-transferred buffers."""
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
