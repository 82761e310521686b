"""Tracing / profiling hooks.

The reference has NO profiling (SURVEY.md §5: TensorBoard appears twice,
both inert). This adds the TPU-native story: ``jax.profiler`` trace capture
around a training-step window plus lightweight host-side step timing with
percentile summaries.

Usage (wired into Brain.fit via hparams):
    profile_dir: /path/to/tensorboard   # enables a trace of steps 10..20
    profile_start_step: 10
    profile_num_steps: 10
"""

from __future__ import annotations

import time

import numpy as np


class StepTimer:
    """Host-side per-step wall-time aggregator."""

    def __init__(self):
        self.durations: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.durations.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> dict:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "steps": len(d),
            "mean_ms": float(d.mean() * 1e3),
            "p50_ms": float(np.percentile(d, 50) * 1e3),
            "p90_ms": float(np.percentile(d, 90) * 1e3),
            "max_ms": float(d.max() * 1e3),
        }


class TraceProfiler:
    """jax.profiler trace capture over a step window."""

    def __init__(self, logdir: str, start_step: int = 10, num_steps: int = 10):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False
        self._done = False

    def maybe_start(self, step: int):
        if not self._done and not self._active and step >= self.start_step:
            import jax

            jax.profiler.start_trace(self.logdir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_step:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True
