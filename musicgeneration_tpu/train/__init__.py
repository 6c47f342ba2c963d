"""Training engine: one trainer for the whole model zoo.

Replaces the reference's five copy-pasted train.py scripts with a single
jit-compiled train step + config dataclasses + Orbax checkpointing +
JSONL metrics (SURVEY.md §5)."""

from .loop import LoopConfig, run_loop
from .objective import (
    CategoricalAccuracy,
    MetricsSet,
    smooth_cross_entropy,
    token_accuracy,
)
from .schedule import noam_schedule
from .trainer import (
    TrainerConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "smooth_cross_entropy",
    "token_accuracy",
    "noam_schedule",
    "MetricsSet",
    "CategoricalAccuracy",
    "TrainerConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "LoopConfig",
    "run_loop",
]
