"""Training loop, optimization, callbacks, and checkpointing."""

from dlwp_tpu.train.trainer import Trainer, TrainConfig, EarlyStoppingMin, History
from dlwp_tpu.train.checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "Trainer",
    "TrainConfig",
    "EarlyStoppingMin",
    "History",
    "save_checkpoint",
    "restore_checkpoint",
]
