"""Continuous-batching serving for the Compound Word transformer.

Completes the serving matrix: with decode/serving.py (flat-token
transformer) and decode/serving_rnn.py (the RNN families), every LM
family in the framework now serves through the shared slot scheduler.
The reference has no CP model at all (its README lists the compound
scheme as "to do"); this engine serves ours the same way the flat
engine replaces per-request generate.py loops.

A CP request decodes 8-field ROWS instead of flat tokens. Everything
cache-side is inherited from the flat transformer engine — the KV cache
layout, the shared clock, right-aligned ragged slots (the CP
``decode_step`` threads the same ``start``/``start_min`` bounds through
``fused_layer_stack_step``), roll-compaction, the live-window floor —
because a CP row occupies exactly one cache position. What changes:

* the pending token is a row ``[B, 8]``; prompts are ``[P, 8]``,
* sampling is the type-first masked row draw (decode/cp_generate.py):
  greedy static, temperature traced, fields not owned by the sampled
  FAMILY forced to their ignore ids. Per-head top-k/p and per-row
  sampling params are not defined for compound rows — the engine
  rejects them at construction,
* ``eos_id`` is matched against the FAMILY column (pass
  ``cp.FAMILY_EOS`` to cut a request at its end-of-piece row; the
  flat engines match whole tokens).

Greedy serving is row-identical to dedicated ``generate_cp`` runs at
the same width (same masked argmax stream); across widths the usual
~1e-6 f32 reassociation caveat applies (tests/test_serving.py header).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cp_generate import _mask_row
from .sampling import SamplingParams
from .serving import ContinuousBatcher, scatter_prefill

__all__ = ["CPContinuousBatcher"]


@functools.partial(jax.jit, static_argnames=("model", "seg", "greedy"),
                   donate_argnames=("cache", "rng"))
def _run_segment_cp(model, params, cache, tok, start, t, rng, temp,
                    seg: int, greedy: bool):
    """seg row-decode steps as one scan. tok: [B, 8] pending rows;
    temperature is a traced operand (new values must not recompile the
    segment — decode/cp_generate.py's policy). Returns
    (cache, tok, t, rng', rows [seg, B, 8])."""
    smin = jnp.min(start)

    def sample_row(rng_i, logits):
        keys = jax.random.split(rng_i, len(logits))
        cols = []
        for k, lg in zip(keys, logits):
            if greedy:
                cols.append(jnp.argmax(lg, axis=-1).astype(jnp.int32))
            else:
                cols.append(jax.random.categorical(
                    k, lg / temp, axis=-1).astype(jnp.int32))
        return _mask_row(jnp.stack(cols, axis=-1))

    def body(carry, rng_i):
        cache, t, tok = carry
        logits, cache = model.apply(
            {"params": params}, tok, cache, t, start, smin,
            method=model.decode_step)
        row = sample_row(rng_i, logits)
        return (cache, t + 1, row), row

    rng, sub = jax.random.split(rng)
    rngs = jax.random.split(sub, seg)
    (cache, t, tok), rows = jax.lax.scan(
        body, (cache, jnp.asarray(t, jnp.int32), tok), rngs)
    return cache, tok, t, rng, rows


@functools.partial(jax.jit, static_argnames=("model", "pb"),
                   donate_argnames=("cache",))
def _admit_cp(model, params, cache, tok, packed, t, pb: int):
    """Batched CP admission: same protocol as the flat `_admit`
    (decode/serving.py) with the prompt columns carrying [Pb, 8] rows
    flattened — one transfer, one group prefill, the shared K/V
    scatter."""
    s = packed.shape[0]
    rows = packed[:, :pb * 8].reshape(s, pb, 8)
    ps, slots_idx, new_start = packed[:, -3], packed[:, -2], packed[:, -1]
    _, pre = model.apply({"params": params}, rows, pb,
                         method=model.prefill)
    cache = scatter_prefill(cache, pre, ps, slots_idx, t)
    last = jnp.take_along_axis(rows, (ps - 1)[:, None, None],
                               axis=1)[:, 0]
    tok = tok.at[slots_idx].set(last)
    return cache, new_start, tok


class CPContinuousBatcher(ContinuousBatcher):
    """Continuous-batching row decode over the CP transformer.

    >>> cb = CPContinuousBatcher(model, params, slots=8)
    >>> rid = cb.submit(prompt_rows, max_new=256)   # [P, 8] int rows
    >>> outs = cb.run()          # {rid: np.ndarray [n, 8]}

    Sampling follows ``generate_cp``: ``SamplingParams.greedy`` or
    temperature (top-k/top-p and per-row params are undefined for
    compound rows and rejected). ``eos_id`` matches the FAMILY column
    (``cp.FAMILY_EOS`` cuts at the end-of-piece row).
    """

    def __init__(self, model, params, *, slots: int = 8,
                 sampling: SamplingParams = SamplingParams(),
                 seg_len: int = 32, cache_len: Optional[int] = None,
                 prompt_bucket: int = 64, depth: int = 4,
                 min_slots: int = 8,
                 on_finalize: Optional[Callable] = None,
                 rng: Optional[jax.Array] = None):
        if sampling.top_k or sampling.top_p < 1.0:
            raise ValueError(
                "top-k/top-p are not defined for compound-word rows "
                "(type-first masked sampling draws each field "
                "categorically — decode/cp_generate.py)")
        super().__init__(
            model, params, slots=slots, sampling=sampling,
            seg_len=seg_len, cache_len=cache_len,
            prompt_bucket=prompt_bucket, depth=depth,
            min_slots=min_slots, per_row_sampling=False,
            on_finalize=on_finalize, rng=rng)
        self.tok = jnp.zeros((slots, 8), jnp.int32)
        self._temp_dev = jnp.float32(max(sampling.temperature, 1e-6))

    # --------------------------------------------------- scheduler hooks

    def _canon_prompt(self, prompt) -> np.ndarray:
        rows = np.asarray(prompt, np.int32)
        if rows.ndim != 2 or rows.shape[1] != 8:
            raise ValueError(
                f"CP prompts are [P, 8] compound rows, got {rows.shape}")
        return rows

    def _warm_prompt(self, n: int) -> np.ndarray:
        return np.zeros((n, 8), np.int32)

    def _empty_result(self) -> np.ndarray:
        # empty results keep the [n, 8] row contract (queued cancels,
        # eos on the very first row)
        return np.zeros((0, 8), np.int32)

    def _eos_index(self, toks, eos_id) -> Optional[int]:
        for j, row in enumerate(toks):
            if row[0] == eos_id:
                return j
        return None

    def _segment(self):
        out = _run_segment_cp(
            self.model, self.params, self.cache, self.tok, self.start,
            self._t_device(), self.rng, self._temp_dev, self.seg_len,
            self.sp.greedy)
        self.cache, self.tok, self._t_dev, self.rng, rows = out
        self.t += self.seg_len
        return rows

    def _admit_group(self, pb: int, rows, ps, slots_idx):
        packed = np.empty((self.b, pb * 8 + 3), np.int32)
        packed[:, :pb * 8] = [r.reshape(-1) for r in rows]
        packed[:, -3] = ps
        packed[:, -2] = slots_idx
        packed[:, -1] = self._start_host
        self.cache, self.start, self.tok = _admit_cp(
            self.model, self.params, self.cache,
            self.tok, jnp.asarray(packed), self._t_device(), pb)
