"""Readers for reference (SpeechBrain-format) torch checkpoint artifacts.

The reference ships run artifacts under results/ and model_checkpoints/
(SURVEY.md §2.8): per-recoverable torch-pickled files like
``normalizer.ckpt`` ({count, glob_mean, glob_std, spk_dict_*}),
``noam_scheduler.ckpt`` ({losses, n_steps, normalize}), ``counter.ckpt``
(plain int text), plus model state_dicts. These loaders convert them into
this framework's state objects so reference runs can be resumed/compared.
torch (CPU) is required only here and in tests — never in the compute path.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _torch_load(path: str) -> Any:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_normalizer_ckpt(path: str):
    """SpeechBrain InputNormalization ckpt -> NormalizerState."""
    import jax.numpy as jnp

    from ..ops.normalization import NormalizerState

    d = _torch_load(path)
    return NormalizerState(
        count=jnp.asarray(float(d["count"]), jnp.float32),
        glob_mean=jnp.asarray(np.asarray(d["glob_mean"], np.float32)),
        glob_std=jnp.asarray(np.asarray(d["glob_std"], np.float32)),
    )


def load_noam_ckpt(path: str, scheduler=None):
    """SpeechBrain NoamScheduler ckpt -> (n_steps, losses); optionally
    hydrates one of our NoamScheduler objects."""
    d = _torch_load(path)
    n_steps = int(d.get("n_steps", 0))
    if scheduler is not None:
        scheduler.n_steps = n_steps
        scheduler.current_lr = scheduler.lr_at(max(n_steps, 1))
        scheduler.losses = list(d.get("losses", []))
    return d


def load_counter_ckpt(path: str) -> int:
    """EpochCounter ckpt is plain text int."""
    with open(path) as f:
        return int(f.read().strip())


def load_state_dict_ckpt(path: str) -> dict:
    """A torch state_dict ckpt -> {key: numpy array} for port_weights."""
    d = _torch_load(path)
    if hasattr(d, "state_dict"):
        d = d.state_dict()
    out = {}
    for k, v in d.items():
        out[k] = np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else v
    return out
