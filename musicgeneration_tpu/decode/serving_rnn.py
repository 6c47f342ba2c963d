"""Continuous-batching serving for the RNN families.

The reference generates from its RNNs one request at a time, a Python
loop per token (Event_MelodyRNN/network.py:119-164,
PerformanceRNN/network.py:106-154, MelodyRNN sampling in
train_basic_rnn.py) — no batching across requests at all. This engine
serves EventMelodyRNN / PerformanceRNN / MelodyRNN through the same
iteration-level scheduler as the transformer engine
(decode/scheduling.py), but over O(1) per-slot state:

* a slot's state is its hidden stack (``[L, B, H]`` GRU/LSTM carries,
  plus MelodyRNN's attention window buffer) — no KV cache, no clock,
  no compaction, and no serve-window limit: any (prompt, max_new) fits,
* admission = one compiled masked prefill per prompt bucket: the group
  scans ``decode_step`` over the padded prompts from fresh state
  (latent-seeded via ``init_to_hidden`` where the family has one),
  freezing each row once past its true length — the same masked-update
  trick as the engine's bucketed ``_prefill`` — then scatters the group
  rows into the pool along the batch axis,
* PerformanceRNN conditioning is PER-ROW: each slot owns a control
  window ``[B, W, C]`` and a cursor ``n`` (its global step index); the
  segment gathers ``buf[b, min(n_b, W-1)]`` per step, and a per-row
  ``control_default`` mask lets conditioned and unconditioned requests
  share one program (models/performance_rnn.py ``_step_input``). The
  clamped cursor reproduces ``expand_controls``'s repeat/truncate
  semantics exactly (decode/engine.py:81-93): a single control repeats,
  a sequence is consumed per global step and holds its last row,
* MelodyRNN's attention window is admission-safe because ``attn_n`` is
  per-row (models/melody_rnn.py): a freshly admitted slot masks its own
  unfilled window regardless of what its pool neighbours have decoded.

Greedy outputs are token-identical to dedicated ``generate`` runs at
the same batch width (same ops, same order); across widths f32
reassociation drifts logits ~1e-6 (the same caveat as the transformer
engine, tests/test_serving.py header).

Cache-leaf batch-axis convention: 1-D leaves are ``[B]`` (MelodyRNN's
``attn_n``), everything else carries batch at axis 1 (``[L, B, H]``
hidden stacks, ``[W, B, H]`` attention windows). Admission scatter and
the drain-tail gather both key off this rule.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import (SamplingParams, sample_logits,
                       sample_logits_batched, unpack_sampling)
from .scheduling import SlotScheduler

__all__ = ["RNNContinuousBatcher"]


def _batch_axis(leaf) -> int:
    """Cache-leaf batch axis (module docstring convention)."""
    return 0 if leaf.ndim == 1 else 1


@functools.partial(jax.jit, static_argnames=("model", "seg", "sp"),
                   donate_argnames=("cache", "tok", "n", "rng"))
def _run_segment_rnn(model, params, cache, tok, n, ctrl_buf, dflt, samp,
                     rng, seg: int, sp: SamplingParams):
    """seg decode+sample steps as one scan over the slot pool.

    tok/n: [B] (n = each row's global step cursor, indexing its control
    window); ctrl_buf: [B, W, C] + dflt: [B] bool for control-bearing
    models, None otherwise (a None operand is an empty pytree — the
    program specializes without a static flag); samp: [B, 4] packed
    per-row sampling rows or None for the uniform static params. Same
    rng structure either way, so a pool whose rows all share the
    default is token-identical across modes."""
    if samp is not None:
        sd = unpack_sampling(samp[:, 0], samp[:, 1], samp[:, 2],
                             samp[:, 3])
    w = None if ctrl_buf is None else ctrl_buf.shape[1]

    def body(carry, rng_i):
        cache, tok, n = carry
        if ctrl_buf is None:
            logits, cache = model.apply(
                {"params": params}, tok, cache, method=model.decode_step)
        else:
            c = jnp.take_along_axis(
                ctrl_buf, jnp.clip(n, 0, w - 1)[:, None, None],
                axis=1)[:, 0]
            logits, cache = model.apply(
                {"params": params}, tok, cache, None, c, dflt,
                method=model.decode_step)
        nxt = (sample_logits(rng_i, logits, sp) if samp is None
               else sample_logits_batched(rng_i, logits, sd))
        return (cache, nxt, n + 1), nxt

    rng, sub = jax.random.split(rng)
    rngs = jax.random.split(sub, seg)
    (cache, tok, n), toks = jax.lax.scan(body, (cache, tok, n), rngs)
    return cache, tok, n, rng, toks


@functools.partial(jax.jit, static_argnames=("model",),
                   donate_argnames=("cache", "tok", "n", "ctrl_buf",
                                    "dflt_pool"))
def _admit_rnn(model, params, cache, tok, n, ctrl_buf, dflt_pool,
               packed, inits, ctrls):
    """Batched admission: ONE masked prefill over the whole group.

    packed: [S, Pb + 3] int32 (S = pool width; unused rows duplicate
    row 0 — scattering a slot with its own values is idempotent):
    padded prompts, then true length p, target slot id, and the
    row's control-default flag (1 = unconditioned). inits: [S, init_dim]
    latents (zeros where a request has none — ``init_to_hidden`` of a
    zero latent IS the zero hidden state, both families zero-init the
    bias) or None for families without a latent. ctrls: [S, W, C]
    per-row control windows (rows pre-expanded on the host: a single
    control tiled, a sequence's last row repeated) or None.

    The group scans decode_step over prompt tokens 0..Pb-2 from fresh
    state, freezing each row once past p-1 steps (prompt token p-1
    becomes the slot's pending input, consumed by the next segment with
    control row p-1 — exactly the dedicated engine's stream: its
    prefill consumes control rows 0..p-1 and generation row p+g,
    decode/engine.py:96-129,245-259). Then one scatter per state leaf
    moves the group rows into the pool."""
    prompts = packed[:, :-3]
    ps, slots_idx = packed[:, -3], packed[:, -2]
    dflt_new = packed[:, -1].astype(bool)
    s = prompts.shape[0]
    if inits is not None:
        gc = model.apply({"params": params}, s, 0, inits,
                         method=model.init_cache)
    else:
        gc = model.apply({"params": params}, s, 0,
                         method=model.init_cache)
    w = None if ctrls is None else ctrls.shape[1]

    def body(gc, x):
        tk, i = x
        if ctrls is None:
            _, gc2 = model.apply({"params": params}, tk, gc,
                                 method=model.decode_step)
        else:
            c = jax.lax.dynamic_index_in_dim(
                ctrls, jnp.clip(i, 0, w - 1), axis=1, keepdims=False)
            _, gc2 = model.apply({"params": params}, tk, gc, None, c,
                                 dflt_new, method=model.decode_step)
        live = i < ps - 1                         # [S]

        def sel(nl, ol):
            ax = _batch_axis(nl)
            shape = [1] * nl.ndim
            shape[ax] = nl.shape[ax]
            return jnp.where(live.reshape(shape), nl, ol)

        return jax.tree.map(sel, gc2, gc), None

    steps = prompts.shape[1] - 1
    gc, _ = jax.lax.scan(
        body, gc, (prompts.T[:steps], jnp.arange(steps)))

    cache = jax.tree.map(lambda p, g: (p.at[slots_idx].set(g)
                                       if _batch_axis(p) == 0
                                       else p.at[:, slots_idx].set(g)),
                         cache, gc)
    last = jnp.take_along_axis(prompts, (ps - 1)[:, None], axis=1)[:, 0]
    tok = tok.at[slots_idx].set(last)
    n = n.at[slots_idx].set(ps - 1)
    if ctrl_buf is not None:
        ctrl_buf = ctrl_buf.at[slots_idx].set(ctrls)
        dflt_pool = dflt_pool.at[slots_idx].set(dflt_new)
    return cache, tok, n, ctrl_buf, dflt_pool


@jax.jit
def _gather_rnn(cache, tok, n, ctrl_buf, dflt, idx):
    """Re-pool to the slot order `idx` (drain-tail shrink/grow). No
    donation: the output pool is a different width."""
    cache = jax.tree.map(
        lambda v: jnp.take(v, idx, axis=_batch_axis(v)), cache)
    ctrl_buf = None if ctrl_buf is None else jnp.take(ctrl_buf, idx,
                                                      axis=0)
    dflt = None if dflt is None else jnp.take(dflt, idx, axis=0)
    return cache, tok[idx], n[idx], ctrl_buf, dflt


class RNNContinuousBatcher(SlotScheduler):
    """Continuous-batching decode over a pool of RNN hidden-state slots.

    >>> cb = RNNContinuousBatcher(model, params, slots=8)
    >>> rid = cb.submit(prompt_ids, max_new=256, init=latent)
    >>> outs = cb.run()          # {rid: np.ndarray of generated ids}

    ``submit`` extras beyond the base scheduler:

    * ``init`` — per-request latent ``[init_dim]`` seeding the hidden
      state via ``init_to_hidden`` (EventMelodyRNN / PerformanceRNN;
      defaults to zeros = the zero hidden state),
    * ``control`` — PerformanceRNN conditioning: ``[C]`` (repeats every
      step, reference ``expand_controls`` semantics) or ``[S, C]``
      (consumed per global step, last row held). ``S`` is capped by the
      pool's ``ctrl_window``.

    Prompts must include the family's priming token (the primary event)
    — the same contract as ``engine.generate``, whose callers build
    prompts that way (cli/generate.py).
    """

    def __init__(self, model, params, *, slots: int = 8,
                 sampling: SamplingParams = SamplingParams(),
                 seg_len: int = 32, prompt_bucket: int = 32,
                 depth: int = 4, min_slots: int = 8,
                 per_row_sampling: bool = False, ctrl_window: int = 256,
                 boost: int = 1,
                 on_finalize: Optional[Callable] = None,
                 rng: Optional[jax.Array] = None):
        # boost>1: when the queue is empty, every active slot is
        # eos-free, and all of them have >= boost*seg_len steps left,
        # dispatch ONE boost*seg_len-step program instead of `boost`
        # seg_len ones (scheduling.py _boosted_seg). The GRU step is so
        # cheap on the tunneled TPU that per-segment dispatch+fetch RTT
        # dominates (BASELINE.md RNN serving rows); fusing launches
        # amortizes it with zero token-stream change; boost=8 beats the
        # static server at 64 slots. Exactly two compiled segment
        # programs per pool width (seg and boost*seg); warm()
        # precompiles both.
        super().__init__(
            slots=slots, sampling=sampling, seg_len=seg_len,
            prompt_bucket=prompt_bucket, depth=depth, min_slots=min_slots,
            per_row_sampling=per_row_sampling, on_finalize=on_finalize,
            rng=rng, pad_id=0, boost=boost)
        self.model = model
        self.params = params
        self.init_dim = getattr(model, "init_dim", None)
        self.ctrl_dim = getattr(model, "control_dim", None)
        self.ctrl_window = ctrl_window
        self.cache = model.apply({"params": params}, slots, 0,
                                 method=model.init_cache)
        self.tok = jnp.zeros((slots,), jnp.int32)
        self.n = jnp.zeros((slots,), jnp.int32)
        if self.ctrl_dim is not None:
            self.ctrl_buf = jnp.zeros(
                (slots, ctrl_window, self.ctrl_dim), jnp.float32)
            self.dflt = jnp.ones((slots,), bool)
        else:
            self.ctrl_buf = self.dflt = None

    # --------------------------------------------------- scheduler hooks

    def _validate_request(self, prompt, max_new, eos_id, kw) -> dict:
        init = kw.pop("init", None)
        control = kw.pop("control", None)
        if kw:
            raise TypeError(f"unexpected submit() arguments: "
                            f"{sorted(kw)}")
        if init is not None:
            if self.init_dim is None:
                raise ValueError(f"{type(self.model).__name__} has no "
                                 "init latent")
            init = np.asarray(init, np.float32).reshape(-1)
            if init.shape != (self.init_dim,):
                raise ValueError(f"init must be [{self.init_dim}], got "
                                 f"{init.shape}")
        if control is not None:
            if self.ctrl_dim is None:
                raise ValueError(f"{type(self.model).__name__} takes no "
                                 "control conditioning")
            control = np.asarray(control, np.float32)
            if control.ndim == 1:
                control = control[None]
            if control.ndim != 2 or control.shape[1] != self.ctrl_dim:
                raise ValueError(f"control must be [C] or [S, C] with "
                                 f"C={self.ctrl_dim}, got {control.shape}")
            if control.shape[0] > self.ctrl_window:
                raise ValueError(
                    f"control sequence ({control.shape[0]} steps) "
                    f"exceeds ctrl_window ({self.ctrl_window}); raise "
                    "ctrl_window at construction")
        return {"init": init, "control": control}

    def _gather_state(self, idx) -> None:
        (self.cache, self.tok, self.n, self.ctrl_buf,
         self.dflt) = _gather_rnn(
            self.cache, self.tok, self.n, self.ctrl_buf, self.dflt,
            jnp.asarray(idx, jnp.int32))

    def _segment(self):
        samp = None
        if self.per_row:
            if self._samp_dirty:
                self._samp_dev = jnp.asarray(self._samp_host)
                self._samp_dirty = False
            samp = self._samp_dev
        seg = self._boosted_seg()
        self._last_seg = seg
        out = _run_segment_rnn(
            self.model, self.params, self.cache, self.tok, self.n,
            self.ctrl_buf, self.dflt, samp, self.rng, seg,
            self.sp)
        self.cache, self.tok, self.n, self.rng, toks = out
        return toks

    def _warm_after_drain(self) -> None:
        """Precompile the boost-length segment program for this width
        (the boost condition never holds during warm()'s tiny probe)."""
        if self.boost > 1:
            samp = None
            if self.per_row:
                if self._samp_dirty:
                    self._samp_dev = jnp.asarray(self._samp_host)
                    self._samp_dirty = False
                samp = self._samp_dev
            out = _run_segment_rnn(
                self.model, self.params, self.cache, self.tok, self.n,
                self.ctrl_buf, self.dflt, samp, self.rng,
                self.boost * self.seg_len, self.sp)
            self.cache, self.tok, self.n, self.rng, toks = out
            np.asarray(toks)   # free slots only: garbage, discarded

    def _try_admit(self):
        """Move pending requests into free slots (FIFO). No clock, no
        waiting: any free slot takes any request. One `_admit_rnn` call
        per prompt bucket present (unused group rows duplicate-padded)."""
        free = self._free_slots()
        if not free or not self.pending:
            return
        groups: Dict[int, list] = {}          # pb -> [(q, slot)]
        remaining = []
        for q in self.pending:
            if not free:
                remaining.append(q)
                continue
            groups.setdefault(q.pb, []).append((q, free.pop(0)))
        for pb, grp in groups.items():
            for q, slot in grp:
                self._admit_bookkeeping(q, slot)
            rows = [q.padded for q, _ in grp]
            ps = [q.prompt.shape[0] for q, _ in grp]
            slots_idx = [slot for _, slot in grp]
            extras = [q.extra for q, _ in grp]
            while len(rows) < self.b:         # duplicate-pad: idempotent
                rows.append(rows[0])
                ps.append(ps[0])
                slots_idx.append(slots_idx[0])
                extras.append(extras[0])
            packed = np.empty((self.b, pb + 3), np.int32)
            packed[:, :pb] = rows
            packed[:, pb] = ps
            packed[:, pb + 1] = slots_idx
            packed[:, pb + 2] = [e["control"] is None for e in extras]
            inits = None
            if self.init_dim is not None:
                inits = np.zeros((self.b, self.init_dim), np.float32)
                for j, e in enumerate(extras):
                    if e["init"] is not None:
                        inits[j] = e["init"]
                inits = jnp.asarray(inits)
            ctrls = None
            if self.ctrl_dim is not None:
                ctrls = np.zeros(
                    (self.b, self.ctrl_window, self.ctrl_dim),
                    np.float32)
                for j, e in enumerate(extras):
                    c = e["control"]
                    if c is not None:
                        # pre-expand: rows beyond the sequence hold its
                        # last row, so the clamped cursor reproduces
                        # expand_controls exactly at every step index
                        ctrls[j, :c.shape[0]] = c
                        ctrls[j, c.shape[0]:] = c[-1]
                ctrls = jnp.asarray(ctrls)
            (self.cache, self.tok, self.n, self.ctrl_buf,
             self.dflt) = _admit_rnn(
                self.model, self.params, self.cache, self.tok, self.n,
                self.ctrl_buf, self.dflt, jnp.asarray(packed), inits,
                ctrls)
            self._n_admit_calls += 1
            self._n_admitted += len(grp)
        self.pending = remaining
