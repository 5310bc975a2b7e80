"""Training callbacks (reference ``DLWP/custom.py:32-96``).

Callbacks are callables ``cb(epoch, metrics, params)`` invoked by
``Trainer.fit`` after each epoch (plus a per-batch hook on BatchHistory).
Equivalents:

- :class:`LearningRateTracker` -- Adam/SGD effective-LR printers
  (AdamLearningRateTracker/SGDLearningRateTracker, custom.py:32-51);
- :class:`BatchHistory` -- per-batch loss record (custom.py:54-68);
- :class:`RunHistory` -- epoch metrics mirrored to an experiment logger
  (custom.py:71-91, which logged to AzureML's ``run.log``); any object with
  a ``log(key, value)`` method works (MLflow, wandb adapters, a file).
- Early stopping lives in :class:`dlwp_tpu.train.trainer.EarlyStoppingMin`.
"""

from __future__ import annotations

import json
from typing import Any


class LearningRateTracker:
    """Print the effective learning rate each epoch.

    For schedules, pass the optax schedule fn; for Adam with decay the
    bias-corrected effective rate is reported (reference custom.py:32-41).
    """

    def __init__(self, base_lr: float, schedule=None, beta_1=0.9, beta_2=0.999,
                 decay: float = 0.0, kind: str = "adam",
                 steps_per_epoch: int = 1):
        self.base_lr = base_lr
        self.schedule = schedule
        self.beta_1, self.beta_2 = beta_1, beta_2
        self.decay = decay
        self.kind = kind
        self.steps_per_epoch = steps_per_epoch

    def effective_lr(self, epoch: int) -> float:
        t = (epoch + 1) * self.steps_per_epoch
        if self.schedule is not None:
            return float(self.schedule(t))
        lr = self.base_lr / (1.0 + self.decay * t)
        if self.kind == "adam":
            lr = lr * (1.0 - self.beta_2**t) ** 0.5 / (1.0 - self.beta_1**t)
        return float(lr)

    def __call__(self, epoch: int, metrics: dict, params: Any) -> None:
        print(f"  effective learning rate: {self.effective_lr(epoch):.3e}")


class BatchHistory:
    """Record per-batch losses. Register via ``Trainer.fit`` callbacks for
    the epoch boundary and attach to the trainer's metrics stream."""

    def __init__(self):
        self.batch_losses: list[list[float]] = []
        self._current: list[float] = []

    def on_batch(self, loss: float) -> None:
        self._current.append(float(loss))

    def __call__(self, epoch: int, metrics: dict, params: Any) -> None:
        self.batch_losses.append(self._current)
        self._current = []


class RunHistory:
    """Mirror epoch metrics to an experiment logger.

    ``run`` is any object with ``log(key, value)`` (the reference used the
    AzureML Run, custom.py:86-91). :class:`JsonlRun` is a file-backed
    default.
    """

    def __init__(self, run):
        self.run = run

    def __call__(self, epoch: int, metrics: dict, params: Any) -> None:
        for k, v in metrics.items():
            self.run.log(k, v)


class JsonlRun:
    """Minimal experiment logger writing JSON lines."""

    def __init__(self, path: str):
        self.path = path

    def log(self, key: str, value) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"key": key, "value": float(value)}) + "\n")
