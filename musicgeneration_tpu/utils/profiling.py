"""Profiling + numerical-health hooks (SURVEY.md §5 tracing/race rows).

The reference's only instrumentation is time.time() deltas printed per
epoch (Event_MelodyRNN/train.py:206,255,304).  Here:

- `profile_trace(dir)`: context manager around `jax.profiler` producing a
  Perfetto/TensorBoard trace of the enclosed steps.
- `timed_block(name)`: wall-clock fence with `block_until_ready` so the
  measurement covers actual device execution, not dispatch.
- `debug_nans(enable)`: flips jax_debug_nans for test harnesses — the
  TPU-side answer to the reference's NaN-loss skip guard
  (PoPMAG_RNN/train.py:257-259); the skip guard itself lives in
  train/loop.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device+host trace of the enclosed block into log_dir."""
    options = jax.profiler.ProfileOptions()
    try:
        options.host_tracer_level = host_tracer_level
    except AttributeError:
        options = None
    if options is not None:
        jax.profiler.start_trace(log_dir, profiler_options=options)
    else:
        jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed_block(name: str, sink: Optional[Dict[str, float]] = None,
                result: Any = None) -> Iterator[Dict[str, float]]:
    """Measure wall-clock of a block, fencing on `result` if given."""
    out: Dict[str, float] = {}
    t0 = time.perf_counter()
    yield out
    if result is not None:
        jax.block_until_ready(result)
    out[name] = time.perf_counter() - t0
    if sink is not None:
        sink[name] = out[name]


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
