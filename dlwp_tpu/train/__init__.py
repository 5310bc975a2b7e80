"""Training loop, optimization, callbacks, and checkpointing."""

from dlwp_tpu.train.trainer import Trainer, TrainConfig, EarlyStoppingMin, History
from dlwp_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
from dlwp_tpu.train.callbacks import (
    LearningRateTracker,
    BatchHistory,
    RunHistory,
    JsonlRun,
)

__all__ = [
    "Trainer",
    "TrainConfig",
    "EarlyStoppingMin",
    "History",
    "save_checkpoint",
    "restore_checkpoint",
    "LearningRateTracker",
    "BatchHistory",
    "RunHistory",
    "JsonlRun",
]
