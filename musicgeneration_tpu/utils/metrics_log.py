"""Structured JSONL metrics logging.

The reference logs with bare print() + progress bars and a commented-out
TensorBoard writer (SURVEY.md §5; MusicTransformer/train.py:240-246,
PerformanceRNN/train.py:247-249).  Here: one logger that emits a JSON
line per step with loss/accuracy/lr/grad_norm/tokens-per-sec and
wall-clock, to stdout and/or a file, preserving the reference's
MetricsSet composition idea (train/objective.py).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, IO, Optional

import jax
import numpy as np


def _scalar(v: Any) -> Any:
    if isinstance(v, (jax.Array, np.ndarray)):
        return float(np.asarray(v))
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return v


class MetricsLogger:
    """Per-step metric emitter with derived throughput.

    >>> log = MetricsLogger(path="metrics.jsonl", every=10)
    >>> for step ...:
    ...     log.write(step, metrics, tokens=batch*seq_len)
    """

    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None,
                 every: int = 1, prefix: str = "train"):
        self.every = max(1, every)
        self.prefix = prefix
        self._fh = open(path, "a") if path else None
        self._stream = stream if stream is not None else sys.stdout
        self._last_t: Optional[float] = None
        self._last_step: Optional[int] = None
        self._tokens_since = 0

    def write(self, step: int, metrics: Dict[str, Any],
              tokens: int = 0, **extra: Any) -> Optional[Dict[str, Any]]:
        self._tokens_since += tokens
        if step % self.every:
            return None
        now = time.time()
        record: Dict[str, Any] = {"kind": self.prefix, "step": int(step),
                                  "time": now}
        record.update({k: _scalar(v) for k, v in metrics.items()})
        record.update({k: _scalar(v) for k, v in extra.items()})
        if self._last_t is not None and now > self._last_t:
            dt = now - self._last_t
            record["steps_per_sec"] = (step - self._last_step) / dt
            if self._tokens_since:
                record["tokens_per_sec"] = self._tokens_since / dt
        self._last_t, self._last_step = now, step
        self._tokens_since = 0
        line = json.dumps(record)
        if self._stream is not None:
            print(line, file=self._stream, flush=True)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()
        return record

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "MetricsLogger":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()
