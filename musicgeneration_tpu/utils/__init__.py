"""Aux subsystems: checkpointing, config, metrics logging, profiling.

The reference has only ad-hoc versions of these (SURVEY.md §5):
`torch.save` state dicts in three incompatible formats, per-model
`config.py` constant modules with an `eval`-based CLI override
(mg/model/utils/shared.py:73-81), `print()` logging, and no profiler.
This package replaces them with one checkpoint format (atomic,
preemption-safe, auto-resume), one dataclass config tree with dotted
CLI overrides (no eval), JSONL structured metrics, and a
`jax.profiler` trace hook.
"""

from .checkpoint import (
    Checkpointer,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from .compile_cache import enable_persistent_compile_cache
from .config import Config, apply_overrides, config_from_args
from .metrics_log import MetricsLogger
from .profiling import profile_trace

__all__ = [
    "Checkpointer",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "Config",
    "apply_overrides",
    "config_from_args",
    "MetricsLogger",
    "profile_trace",
    "enable_persistent_compile_cache",
]
