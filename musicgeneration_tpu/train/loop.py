"""The training loop driver: one loop for the whole model zoo.

Replaces the reference's five copy-pasted epoch loops
(MusicTransformer/train.py:252-327, Event_MelodyRNN/train.py:327-358,
PerformanceRNN/train.py, PoPMAG_RNN/train.py:216-276) with a single
driver that composes the jit train step (trainer.py) with the aux
subsystems (utils/): auto-resume checkpointing, JSONL metrics,
profiler windows, and the reference's failure-handling semantics done
properly:

- NaN/inf-loss skip-and-log  (reference: PoPMAG_RNN/train.py:257-259
  skips the optimizer step on NaN; here the *state update itself* is
  rolled back via a jnp.where select inside jit, so the skip costs no
  re-trace).
- KeyboardInterrupt → final checkpoint  (reference: every train.py has
  `except KeyboardInterrupt: save_model`).
- periodic eval on a held-out batch stream  (reference:
  MusicTransformer/train.py:295-302).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp

from ..utils.checkpoint import Checkpointer
from ..utils.metrics_log import MetricsLogger
from .trainer import TrainState


@dataclasses.dataclass
class LoopConfig:
    total_steps: int = 10000
    ckpt_dir: Optional[str] = None
    ckpt_every: int = 1000
    log_every: int = 10
    eval_every: int = 500
    metrics_path: Optional[str] = None
    profile_dir: Optional[str] = None
    profile_steps: int = 0  # trace steps [10, 10+profile_steps)
    # written to meta.json alongside every checkpoint, with the data
    # cursor (= next step; the cli streams are counter-indexed so the
    # cursor IS the step number) — lets a resume detect a seed change
    stream_meta: Optional[Dict[str, Any]] = None


def _guarded(train_step: Callable) -> Callable:
    """Wrap a train step so a non-finite loss rolls back the update."""

    def step(state: TrainState, *batch):
        new_state, metrics = train_step(state, *batch)
        ok = jnp.isfinite(metrics["loss"])
        safe = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_state, state)
        # keep the step counter moving so logging/ckpt cadence is stable
        safe = safe.replace(step=state.step + 1)
        metrics = dict(metrics, skipped=jnp.logical_not(ok).astype(jnp.int32))
        return safe, metrics

    return step


def run_loop(
    state: TrainState,
    train_step: Callable,
    batches: Iterable,
    cfg: LoopConfig,
    eval_step: Optional[Callable] = None,
    eval_batches: Optional[Callable[[], Iterator]] = None,
    tokens_per_batch: int = 0,
    config_dict: Optional[Dict[str, Any]] = None,
) -> TrainState:
    """Drive training to cfg.total_steps; resumable and preemption-safe.

    `batches` yields either (x, y) tuples or pytrees matching the train
    step's signature. `eval_batches` is a zero-arg callable returning a
    fresh iterator of eval batches (so each eval pass re-reads the
    held-out stream).
    """
    step_fn = jax.jit(_guarded(train_step), donate_argnums=(0,))
    ckpt = (Checkpointer(cfg.ckpt_dir, every=cfg.ckpt_every,
                         config=config_dict)
            if cfg.ckpt_dir else None)
    start = 0
    if ckpt is not None:
        state, start = ckpt.restore_or(state)
    log = MetricsLogger(path=cfg.metrics_path, every=cfg.log_every)
    eval_log = MetricsLogger(path=cfg.metrics_path, every=1, prefix="eval")
    it = iter(batches)
    profiling = False

    # `completed` tracks the last step whose step_fn actually finished: a
    # KeyboardInterrupt between fetching a batch and step_fn returning leaves
    # `state` at the previous step, so labeling it with the in-flight loop
    # index would skip one schedule step on resume.
    completed = start - 1
    try:
        for step in range(start, cfg.total_steps):
            if cfg.profile_dir and cfg.profile_steps:
                if step == 10 and not profiling:
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                elif profiling and step == 10 + cfg.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
            try:
                batch = next(it)
            except StopIteration:
                it = iter(batches)
                batch = next(it)
            if isinstance(batch, tuple):
                state, metrics = step_fn(state, *batch)
            else:
                state, metrics = step_fn(state, batch)
            completed = step
            log.write(step, metrics, tokens=tokens_per_batch)
            if ckpt is not None and ckpt.maybe_save(step, state):
                ckpt.write_meta(data_cursor=step + 1,
                                **(cfg.stream_meta or {}))
            if (eval_step is not None and eval_batches is not None
                    and cfg.eval_every and (step + 1) % cfg.eval_every == 0):
                agg: Dict[str, float] = {}
                n = 0
                for eb in eval_batches():
                    m = eval_step(state.params, *eb) if isinstance(eb, tuple) \
                        else eval_step(state.params, eb)
                    for k, v in m.items():
                        agg[k] = agg.get(k, 0.0) + float(v)
                    n += 1
                if n:
                    eval_log.write(step, {k: v / n for k, v in agg.items()})
    except KeyboardInterrupt:
        pass
    finally:
        if profiling:
            jax.profiler.stop_trace()
        # only save if a step actually completed — a no-op resume must not
        # advance the checkpoint label, and an interrupt mid-step must label
        # the (previous-step) state with the previous step's index
        if ckpt is not None and completed >= start:
            ckpt.maybe_save(completed, state, force=True)
            ckpt.write_meta(data_cursor=completed + 1,
                            **(cfg.stream_meta or {}))
        log.close()
        eval_log.close()
    return state
