"""Streaming global input normalization (functional, checkpointable).

Reference: ``speechbrain.processing.features.InputNormalization`` with
``norm_type: global, update_until_epoch: 4`` (convae.yaml:269-271,
gender_classifier.yaml:93-95), applied at speechbrain_convae_train.py:60 and
gender_classifier_train.py:114.

SpeechBrain 0.5 semantics (global mode):
  * per utterance, compute mean/std over the *valid* frames (relative
    lengths mask), std floored at eps;
  * during training while ``epoch < update_until_epoch``, fold each
    utterance's stats into running stats with weight 1/(count+1) — i.e. the
    running stats are the arithmetic mean of all per-utterance means/stds
    seen so far;
  * normalize the whole batch with the (just-updated) running stats:
    ``(x - glob_mean) / glob_std``.

TPU-first: state is an explicit pytree threaded through the jitted train
step (no mutable module state); the sequential per-utterance update has the
closed form ``new = (count*old + sum(utt_stats)) / (count + B)``, so one
masked reduction per batch replaces the reference's Python loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NormalizerState(NamedTuple):
    """Running global statistics. Registered as a checkpoint recoverable
    (reference: ``normalizer`` in convae.yaml:258-264)."""

    count: jax.Array      # scalar f32 — number of utterances folded in
    glob_mean: jax.Array  # (D,)
    glob_std: jax.Array   # (D,)


class InputNormalizer:
    """Global mean/variance normalizer with epoch-gated stat freezing."""

    def __init__(self, dim: int = 80, update_until_epoch: int = 4, eps: float = 1e-10,
                 mean_norm: bool = True, std_norm: bool = True):
        self.dim = dim
        self.update_until_epoch = update_until_epoch
        self.eps = eps
        self.mean_norm = mean_norm
        self.std_norm = std_norm

    def init_state(self) -> NormalizerState:
        return NormalizerState(
            count=jnp.zeros((), jnp.float32),
            glob_mean=jnp.zeros((self.dim,), jnp.float32),
            glob_std=jnp.ones((self.dim,), jnp.float32),
        )

    def _utterance_stats(self, x: jax.Array, lengths: jax.Array | None):
        """Masked per-utterance mean/std: (B, T, D) -> ((B, D), (B, D))."""
        b, t, d = x.shape
        if lengths is None:
            mean = jnp.mean(x, axis=1)
            # torch.std default: unbiased
            std = jnp.sqrt(jnp.var(x, axis=1, ddof=1))
        else:
            n = jnp.round(lengths * t).astype(x.dtype)
            idx = jnp.arange(t, dtype=x.dtype)[None, :]
            mask = (idx < n[:, None]).astype(x.dtype)[:, :, None]
            n_c = jnp.maximum(n, 2.0)[:, None]
            mean = jnp.sum(x * mask, axis=1) / n_c
            var = jnp.sum(mask * (x - mean[:, None, :]) ** 2, axis=1) / (n_c - 1.0)
            std = jnp.sqrt(jnp.maximum(var, 0.0))
        std = jnp.maximum(std, self.eps)
        return mean, std

    def __call__(
        self,
        state: NormalizerState,
        x: jax.Array,
        lengths: jax.Array | None = None,
        epoch: jax.Array | int = 0,
        training: bool = False,
    ) -> tuple[jax.Array, NormalizerState]:
        """Normalize (B, T, D); returns (normalized, new_state).

        When ``training`` and ``epoch < update_until_epoch``, running stats
        are updated before being applied (reference behavior: stats of the
        current batch already influence its own normalization).
        """
        mean, std = self._utterance_stats(x, lengths)
        b = x.shape[0]
        if training:
            gate = (jnp.asarray(epoch, jnp.float32) < self.update_until_epoch).astype(jnp.float32)
            n_new = jnp.asarray(b, jnp.float32) * gate
            denom = jnp.maximum(state.count + n_new, 1.0)
            new_mean = (state.count * state.glob_mean + gate * jnp.sum(mean, axis=0)) / denom
            new_std = (state.count * state.glob_std + gate * jnp.sum(std, axis=0)) / denom
            # before any update, glob stats are the identity transform
            first = (state.count + n_new) > 0
            new_mean = jnp.where(first, new_mean, state.glob_mean)
            new_std = jnp.where(first, new_std, state.glob_std)
            new_state = NormalizerState(state.count + n_new, new_mean, new_std)
        else:
            new_state = state
        out = x
        if self.mean_norm:
            out = out - new_state.glob_mean
        if self.std_norm:
            out = out / jnp.maximum(new_state.glob_std, self.eps)
        return out, new_state
