"""Brain-style training engine: epoch/stage loop with hooks.

Replaces sb.core.Brain's fit/evaluate skeleton (the recipe superclass at
gender_classifier_train.py:58 and speechbrain_convae_train.py:41):
stage hooks (on_stage_start/on_stage_end/on_fit_start/on_evaluate_start),
per-epoch train + valid loops, average-loss tracking, time-based interval
checkpointing, and checkpoint recovery. The compute itself lives in jitted
functions owned by subclasses (see train/state.py); this class is the thin
host-side shell.
"""

from __future__ import annotations

import enum
import time
from typing import Any, Iterable

from .checkpoint import Checkpointer
from .profiler import StepTimer, TraceProfiler
from ..parallel.mesh import is_main_process


class Stage(enum.Enum):
    TRAIN = enum.auto()
    VALID = enum.auto()
    TEST = enum.auto()


class Brain:
    def __init__(
        self,
        hparams: dict | None = None,
        checkpointer: Checkpointer | None = None,
        ckpt_interval_minutes: float | None = None,
    ):
        self.hparams = dict(hparams or {})
        self.checkpointer = checkpointer
        self.ckpt_interval_minutes = ckpt_interval_minutes
        self.step = 0
        self.train_stats: dict = {}
        self.step_timer = StepTimer()
        profile_dir = self.hparams.get("profile_dir")
        self.profiler = (
            TraceProfiler(
                profile_dir,
                int(self.hparams.get("profile_start_step", 10)),
                int(self.hparams.get("profile_num_steps", 10)),
            )
            if profile_dir
            else None
        )

    # -- subclass responsibilities -------------------------------------------

    def fit_batch(self, batch, epoch: int) -> float:
        raise NotImplementedError

    def evaluate_batch(self, batch, stage: Stage) -> float:
        raise NotImplementedError

    def on_fit_start(self):
        """Called once before training (optimizer re-init on stage-2 resume —
        speechbrain_convae_train.py:380-402)."""

    def on_stage_start(self, stage: Stage, epoch: int | None = None):
        pass

    def on_stage_end(self, stage: Stage, stage_loss: float, epoch: int | None = None):
        pass

    def on_evaluate_start(self, max_key: str | None = None, min_key: str | None = None):
        """Checkpoint averaging happens here in the recipes
        (speechbrain_convae_train.py:404-416)."""

    # -- loops ------------------------------------------------------------------

    def fit(
        self,
        epoch_counter,
        train_set: Iterable,
        valid_set: Iterable | None = None,
        progressbar: bool = False,
    ):
        self.on_fit_start()
        for epoch in epoch_counter:
            # TRAIN
            self.on_stage_start(Stage.TRAIN, epoch)
            if hasattr(train_set, "set_epoch"):
                train_set.set_epoch(epoch)
            total, count = 0.0, 0
            self.step = 0
            t0 = time.time()
            for batch in train_set:
                self.step += 1
                if self.profiler is not None:
                    self.profiler.maybe_start(self.step)
                self.step_timer.start()
                loss = float(self.fit_batch(batch, epoch))
                self.step_timer.stop()
                if self.profiler is not None:
                    self.profiler.maybe_stop(self.step)
                total += loss
                count += 1
                if (
                    self.checkpointer is not None
                    and self.ckpt_interval_minutes
                    and is_main_process()
                ):
                    self.checkpointer.maybe_save_interval(
                        {"epoch": epoch, "intra_epoch": True},
                        self.ckpt_interval_minutes,
                    )
            train_loss = total / max(count, 1)
            self.train_stats = {"loss": train_loss}
            self.on_stage_end(Stage.TRAIN, train_loss, epoch)

            # VALID
            if valid_set is not None:
                self.on_stage_start(Stage.VALID, epoch)
                total, count = 0.0, 0
                for batch in valid_set:
                    total += float(self.evaluate_batch(batch, Stage.VALID))
                    count += 1
                self.on_stage_end(Stage.VALID, total / max(count, 1), epoch)

    def evaluate(
        self,
        test_set: Iterable,
        max_key: str | None = None,
        min_key: str | None = None,
    ) -> float:
        self.on_evaluate_start(max_key=max_key, min_key=min_key)
        self.on_stage_start(Stage.TEST, None)
        total, count = 0.0, 0
        for batch in test_set:
            total += float(self.evaluate_batch(batch, Stage.TEST))
            count += 1
        avg = total / max(count, 1)
        self.on_stage_end(Stage.TEST, avg, None)
        return avg
