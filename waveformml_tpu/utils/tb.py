"""TensorBoard logging helpers.

Writer side: versioned run dirs (ref: main.py:144-165) via tensorboardX.
Reader side: ``TBHelper`` reads scalars back from tfevents files
(ref: src/utils/TensorBoardUtils.py:12-39) — used by the occlusion-study and
best-trial scripts.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np


class TBLogger:
    """Thin wrapper over tensorboardX SummaryWriter with figure support."""

    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter

        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.writer = SummaryWriter(log_dir)

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        self.writer.add_scalar(tag, float(value), step)

    def log_scalars(self, values: Dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.log_scalar(k, v, step)

    def log_figure(self, tag: str, figure, step: int = 0, close: bool = True) -> None:
        self.writer.add_figure(tag, figure, step, close=close)

    def log_histogram(self, tag: str, values, step: int = 0) -> None:
        self.writer.add_histogram(tag, np.asarray(values), step)

    def log_hparams(self, hparams: Dict[str, Any], metrics: Dict[str, float]) -> None:
        flat = {k: v for k, v in hparams.items()
                if isinstance(v, (int, float, str, bool))}
        try:
            self.writer.add_hparams(flat, metrics)
        except Exception:
            for k, v in metrics.items():
                self.log_scalar(k, v, 0)

    def flush(self) -> None:
        self.writer.flush()

    def close(self) -> None:
        self.writer.close()


class TBHelper:
    """Read scalars back from a tfevents file (ref: TensorBoardUtils.py:12-39)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._acc = None

    def set_path(self, path: str) -> None:
        self.path = path
        self._acc = None

    def _accumulator(self):
        if self._acc is None:
            from tensorboard.backend.event_processing.event_accumulator import (
                EventAccumulator)
            self._acc = EventAccumulator(self.path)
            self._acc.Reload()
        return self._acc

    def get_scalars(self, name: str) -> List[Any]:
        acc = self._accumulator()
        if name not in acc.Tags().get("scalars", []):
            return []
        return list(acc.Scalars(name))

    def get_scalar_names(self) -> List[str]:
        return list(self._accumulator().Tags().get("scalars", []))

    def get_best_value(self, name: str, mode: str = "min") -> Optional[float]:
        scalars = self.get_scalars(name)
        if not scalars:
            return None
        vals = [s.value for s in scalars]
        return min(vals) if mode == "min" else max(vals)


def find_tfevents(log_dir: str) -> List[str]:
    out = []
    for root, _, files in os.walk(log_dir):
        out.extend(os.path.join(root, f) for f in files if "tfevents" in f)
    return sorted(out)


def run_evaluation(log_folder: str, config, ckpt: str,
                   calgroup: Optional[str] = None) -> Dict[str, float]:
    """Programmatic test-run against an existing log dir + checkpoint
    (ref: TensorBoardUtils.py:43-62 run_evaluation): optional calgroup
    override, logger into the checkpoint's version dir, restore, test."""
    from waveformml_tpu.config import load_config
    from waveformml_tpu.engineering.trainer import Trainer
    from waveformml_tpu.registry import retrieve_class

    if isinstance(config, str):
        config = load_config(config)
    if calgroup:
        if hasattr(config.dataset_config, "calgroup"):
            import logging
            logging.getLogger(__name__).warning(
                "overriding calgroup %s with user supplied calgroup %s",
                config.dataset_config.calgroup, calgroup)
        config.dataset_config["calgroup"] = calgroup
    logger = TBLogger(log_folder)
    task_cls = retrieve_class(config.run_config.run_class)
    task = task_cls(config)
    trainer = Trainer(config, task, logger=logger)
    from main import choose_data_module
    data_module = choose_data_module(config)
    data_module.setup("test")
    first = next(iter(data_module.test_dataloader()))
    trainer.load_checkpoint(ckpt, sample_block=first)
    return trainer.test(data_module)
