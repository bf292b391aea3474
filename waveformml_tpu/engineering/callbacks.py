"""Training callbacks (ref: src/engineering/LitCallbacks.py).

``EarlyStopping``: monitor val_loss with patience (ref :10-29).
``LoggingCallback``: per-val-epoch confusion-matrix figures, hp_metric logging
of the best loss, and on_test_end rendering (test confusion, ROC,
``evaluator.dump()``) (ref :37-73).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import numpy as np


class EarlyStopping:
    def __init__(self, monitor: str = "val_loss", patience: int = 5,
                 mode: str = "min", min_delta: float = 0.0):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.stopped = False

    def update(self, metrics: Dict[str, float]) -> bool:
        """Returns True if training should stop."""
        value = metrics.get(self.monitor)
        if value is None:
            return False
        improved = (self.best is None or
                    (self.mode == "min" and value < self.best - self.min_delta) or
                    (self.mode == "max" and value > self.best + self.min_delta))
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self.stopped = True
        return self.stopped

    def state_dict(self):
        return {"best": self.best, "bad_epochs": self.bad_epochs,
                "stopped": self.stopped}

    def load_state_dict(self, d):
        self.best, self.bad_epochs, self.stopped = d["best"], d["bad_epochs"], d["stopped"]


class LoggingCallback:
    """Figure/hp-metric logging hooks (ref: LitCallbacks.py:37-73)."""

    def __init__(self, class_names=None):
        self.log = logging.getLogger(__name__)
        self.class_names = class_names
        self.best_loss: Optional[float] = None

    def on_validation_end(self, trainer, metrics: Dict[str, float], epoch: int) -> None:
        vl = metrics.get("val_loss")
        if vl is not None and (self.best_loss is None or vl < self.best_loss):
            self.best_loss = vl
        if "confusion" in trainer.last_val_arrays and trainer.logger:
            self._log_confusion(trainer.logger, trainer.last_val_arrays["confusion"],
                                f"val_confusion_matrix", epoch)

    def on_train_end(self, trainer) -> None:
        if self.best_loss is not None and trainer.logger:
            trainer.logger.log_scalar("hp_metric", self.best_loss, 0)

    def on_test_end(self, trainer, metrics: Dict[str, float]) -> None:
        if "confusion" in trainer.last_test_arrays and trainer.logger:
            self._log_confusion(trainer.logger, trainer.last_test_arrays["confusion"],
                                "test_confusion_matrix", 0)
        task = trainer.task
        if getattr(task, "evaluator", None) is not None:
            if getattr(task.evaluator, "logger", None) is None and trainer.logger:
                task.evaluator.logger = trainer.logger
            task.evaluator.dump()

    def _log_confusion(self, logger, confusion: np.ndarray, tag: str, step: int) -> None:
        try:
            from waveformml_tpu.utils.plot import plot_confusion_matrix

            fig = plot_confusion_matrix(np.asarray(confusion), self.class_names)
            logger.log_figure(tag, fig, step)
        except Exception as e:  # plotting must never kill training
            self.log.warning("confusion figure logging failed: %s", e)
