"""LR schedulers matching the reference's SpeechBrain semantics.

Reference wiring: NoamScheduler(lr_initial=1.0, n_warmup_steps=25000,
model_size=768) at convae.yaml:253-256 (annealed per optimizer update,
speechbrain_convae_train.py:255); ReduceLROnPlateau(factor=0.5, patience=2,
dont_halve_until_epoch=2) at gender_classifier.yaml:145-148 (stepped per
epoch on valid loss, gender_classifier_train.py:205); the Adam->SGD
two-stage switch after ``stage_one_epochs`` (speechbrain_train.py:256-273)
lives in the trainer, which swaps the optax optimizer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


class NoamScheduler:
    """lr = lr_initial * model_size^-0.5 * min(n^-0.5, n * warmup^-1.5).

    SpeechBrain 0.5 normalizes so the peak matches lr_initial at the end of
    warmup: the factor is scaled by warmup^0.5 * model_size^0.5 ... the
    reference implementation computes
        lr = lr_initial * (model_size^-0.5) * min(step^-0.5, step*warmup^-1.5)
    and tracks ``n_steps`` and ``current_lr`` (logged in train_log.txt).
    Stateful host-side object; the returned lr feeds optax via
    inject_hyperparams.
    """

    def __init__(self, lr_initial: float = 1.0, n_warmup_steps: int = 25000, model_size: int = 768):
        self.lr_initial = lr_initial
        self.n_warmup_steps = n_warmup_steps
        self.normalize = model_size ** (-0.5)
        self.n_steps = 0
        self.current_lr = lr_initial
        self.losses: list[float] = []

    def __call__(self) -> float:
        """Advance one optimizer update; return the new lr."""
        self.n_steps += 1
        lr = self.lr_initial * self._lr_factor(self.n_steps)
        self.current_lr = lr
        return lr

    def _lr_factor(self, step: int) -> float:
        return self.normalize * min(step ** (-0.5), step * self.n_warmup_steps ** (-1.5))

    def lr_at(self, step: int) -> float:
        return self.lr_initial * self._lr_factor(max(step, 1))

    def state_dict(self):
        return {"n_steps": self.n_steps, "current_lr": self.current_lr}

    def load_state_dict(self, d):
        self.n_steps = int(d["n_steps"])
        self.current_lr = float(d["current_lr"])


class ReduceLROnPlateau:
    """Halve (factor) the lr when valid loss stops improving.

    SpeechBrain semantics (gender_classifier.yaml:145-148): keep the best
    loss seen; if no improvement for ``patience`` consecutive epochs and
    ``epoch >= dont_halve_until_epoch``, multiply lr by ``factor``.
    """

    def __init__(self, lr_initial: float = 1e-3, factor: float = 0.5, patience: int = 2,
                 dont_halve_until_epoch: int = 2, lr_min: float = 1e-8):
        self.lr = lr_initial
        self.factor = factor
        self.patience = patience
        self.dont_halve_until_epoch = dont_halve_until_epoch
        self.lr_min = lr_min
        self.best_loss = math.inf
        self.bad_epochs = 0

    def __call__(self, epoch: int, loss: float) -> tuple[float, float]:
        """Returns (old_lr, new_lr)."""
        old_lr = self.lr
        if loss < self.best_loss:
            self.best_loss = loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        if epoch >= self.dont_halve_until_epoch and self.bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.lr_min)
            self.bad_epochs = 0
        return old_lr, self.lr

    def state_dict(self):
        return {
            "lr": self.lr,
            "best_loss": self.best_loss,
            "bad_epochs": self.bad_epochs,
        }

    def load_state_dict(self, d):
        self.lr = float(d["lr"])
        self.best_loss = float(d["best_loss"])
        self.bad_epochs = int(d["bad_epochs"])
