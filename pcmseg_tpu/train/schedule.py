"""Host-side training control: ReduceLROnPlateau and early stopping.

These are the stateful, data-dependent decisions that belong on the host
(they cross the jit boundary once per epoch, not per step).

``ReduceLROnPlateau`` matches torch.optim.lr_scheduler.ReduceLROnPlateau
semantics with the reference's settings (SCHEDULER_CONFIG,
test/config_example.py:108-116 and utils/trainer.py:131-137): mode='min',
factor=0.5, patience=10, threshold=1e-4 (relative), cooldown=0, min_lr.
Torch's exact rule: a metric is an improvement iff
``metric < best * (1 - threshold)`` (rel mode, min); patience counts epochs
since the last improvement, and the LR drops when ``bad_epochs > patience``.

``EarlyStopping`` matches the reference's counters: stop after ``patience``
epochs without improvement (patience 15 in the CV trainer
train_bph_optimized.py:253,360-363; 20 in BaseTrainer utils/trainer.py:304).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class ReduceLROnPlateau:
    lr: float
    mode: str = "min"
    factor: float = 0.5
    patience: int = 10
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    cooldown: int = 0
    min_lr: float = 0.0

    best: Optional[float] = None
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return metric < self.best * (1.0 - self.threshold)
            return metric < self.best - self.threshold
        else:
            if self.threshold_mode == "rel":
                return metric > self.best * (1.0 + self.threshold)
            return metric > self.best + self.threshold

    def step(self, metric: float) -> float:
        """Record an epoch metric; returns the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0

        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    # -- (de)serialization for checkpoint resume -----------------------------
    def state_dict(self) -> Dict:
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, d: Dict) -> None:
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
        self.cooldown_counter = d["cooldown_counter"]

    @classmethod
    def from_config(cls, config) -> "ReduceLROnPlateau":
        return cls(
            lr=config.learning_rate,
            mode=config.plateau_mode,
            factor=config.plateau_factor,
            patience=config.plateau_patience,
            threshold=config.plateau_threshold,
            cooldown=config.plateau_cooldown,
            min_lr=config.min_lr,
        )


@dataclass
class EarlyStopping:
    patience: int = 15
    mode: str = "min"
    min_delta: float = 0.0

    best: Optional[float] = None
    num_bad_epochs: int = 0
    should_stop: bool = False

    def step(self, metric: float) -> bool:
        """Record an epoch metric; returns True when training should stop."""
        improved = self.best is None or (
            metric < self.best - self.min_delta
            if self.mode == "min"
            else metric > self.best + self.min_delta
        )
        if improved:
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        self.should_stop = self.num_bad_epochs >= self.patience
        return self.should_stop

    def state_dict(self) -> Dict:
        return {
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "should_stop": self.should_stop,
        }

    def load_state_dict(self, d: Dict) -> None:
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
        self.should_stop = d["should_stop"]
