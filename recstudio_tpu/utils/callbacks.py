"""Training callbacks: early stopping, last/interval checkpoints.

Mirrors the reference semantics (recstudio/utils/callbacks.py:9-260): best
params are kept as an in-memory copy and written to
``<save_path>/<Model>/<dataset>/<timestamp>.ckpt`` on save.
"""
from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional


class EarlyStopping:
    def __init__(self, model, monitor: str, dataset_name: str = "", save_dir: Optional[str] = None,
                 filename: Optional[str] = None, patience: int = 10, delta: float = 0.0,
                 mode: str = "max"):
        self.model = model
        self.monitor = monitor
        self.patience = patience
        self.delta = delta
        self.mode = mode
        self.counter = 0
        self.best_value = float("-inf") if mode == "max" else float("inf")
        self.best_epoch = -1
        self.best_params = None
        save_dir = save_dir or "./saved/"
        self.save_dir = os.path.join(save_dir, type(model).__name__, dataset_name)
        self.filename = filename or time.strftime("%Y-%m-%d-%H-%M-%S.ckpt")
        self._improved: Callable[[float, float], bool] = (
            (lambda new, best: new > best + delta) if mode == "max"
            else (lambda new, best: new < best - delta))

    def __call__(self, epoch: int, metrics: Dict[str, Any]) -> bool:
        """Returns True when training should stop."""
        value = metrics.get(self.monitor)
        if value is None:
            return False
        value = float(value)
        if self._improved(value, self.best_value):
            self.best_value = value
            self.best_epoch = epoch
            self.best_params = self.model.snapshot()
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                return True
        return False

    def save_checkpoint(self, epoch: int):
        if self.best_params is not None:
            self.model.restore(self.best_params)
        os.makedirs(self.save_dir, exist_ok=True)
        path = os.path.join(self.save_dir, self.filename)
        self.model.save_checkpoint(path, epoch=self.best_epoch,
                                   metric={self.monitor: self.best_value})
        return path


class SaveLastCallback:
    def __init__(self, model, dataset_name: str = "", save_dir: Optional[str] = None,
                 filename: Optional[str] = None):
        self.model = model
        save_dir = save_dir or "./saved/"
        self.save_dir = os.path.join(save_dir, type(model).__name__, dataset_name)
        self.filename = filename or time.strftime("%Y-%m-%d-%H-%M-%S.ckpt")
        self.best_params = None
        self.last_epoch = -1

    def __call__(self, epoch: int, metrics: Dict[str, Any]) -> bool:
        self.last_epoch = epoch
        return False

    def save_checkpoint(self, epoch: int):
        os.makedirs(self.save_dir, exist_ok=True)
        path = os.path.join(self.save_dir, self.filename)
        self.model.save_checkpoint(path, epoch=epoch, metric={})
        return path


class IntervalCallback(SaveLastCallback):
    def __init__(self, model, every_n_epoch: int = 1, **kwargs):
        super().__init__(model, **kwargs)
        self.every_n_epoch = every_n_epoch

    def __call__(self, epoch: int, metrics: Dict[str, Any]) -> bool:
        if (epoch + 1) % self.every_n_epoch == 0:
            os.makedirs(self.save_dir, exist_ok=True)
            path = os.path.join(self.save_dir,
                                f"epoch-{epoch}-{self.filename}")
            self.model.save_checkpoint(path, epoch=epoch, metric={})
        return False
