"""Training engine: one trainer for the whole model zoo.

Replaces the reference's five copy-pasted train.py scripts with a single
jit-compiled train step + config dataclasses + Orbax checkpointing +
JSONL metrics (SURVEY.md §5)."""

from .objective import (
    CategoricalAccuracy,
    MetricsSet,
    smooth_cross_entropy,
    token_accuracy,
)
from .schedule import noam_schedule

__all__ = [
    "smooth_cross_entropy",
    "token_accuracy",
    "noam_schedule",
    "MetricsSet",
    "CategoricalAccuracy",
]
