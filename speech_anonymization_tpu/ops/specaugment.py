"""Feature-domain SpecAugment as pure XLA ops.

Reference: speechbrain.lobes.augment.SpecAugment at convae.yaml:273-287
(time_warp window 5 bicubic, 2 freq masks width<=30, 2 time masks
width<=40, replace_with_zero=False i.e. replace with the mean), applied in
the anonymizer forward when hparams.augmentation is set
(speechbrain_convae_train.py:65-67).

Static-shape design: masks are built as boolean index comparisons (no
dynamic slicing); the time warp resizes the two segments around a random
centre with jax.image (cubic), matching SpeechBrain's two-segment
interpolation warp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _random_masks(key, batch: int, size: int, n_masks: int, max_width: int):
    k_w, k_s = jax.random.split(key)
    widths = jax.random.randint(k_w, (batch, n_masks), 0, max_width + 1)
    starts = jax.random.randint(k_s, (batch, n_masks), 0, jnp.maximum(size - widths, 1))
    idx = jnp.arange(size)[None, None, :]
    in_mask = (idx >= starts[..., None]) & (idx < (starts + widths)[..., None])
    return jnp.any(in_mask, axis=1)  # (B, size)


def time_warp(key, feats: jax.Array, window: int = 5) -> jax.Array:
    """Two-segment time warp: centre c shifts by w ~ U[-window, window].

    Segment [0, c) stretches to [0, c+w) and [c, T) to [c+w, T), keeping
    total length T. Implemented jit-safely as a piecewise-linear fractional
    index remap + linear interpolation (SpeechBrain resizes the two
    segments with bicubic; the warp distances are <= ``window`` frames, so
    the interpolation-order difference is negligible and documented).
    """
    b, t, d = feats.shape
    if t <= 2 * window + 2:
        return feats
    k_c, k_w = jax.random.split(key)
    c = jax.random.randint(k_c, (), window + 1, t - window - 1).astype(jnp.float32)
    w = jax.random.randint(k_w, (), -window, window + 1).astype(jnp.float32)
    i = jnp.arange(t, dtype=jnp.float32)
    src = jnp.where(
        i < c + w,
        i * c / jnp.maximum(c + w, 1.0),
        c + (i - (c + w)) * (t - c) / jnp.maximum(t - c - w, 1.0),
    )
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, t - 1)
    i1 = jnp.clip(i0 + 1, 0, t - 1)
    frac = (src - i0.astype(jnp.float32))[None, :, None]
    return feats[:, i0] * (1.0 - frac) + feats[:, i1] * frac


class SpecAugment:
    def __init__(
        self,
        time_warp: bool = True,
        time_warp_window: int = 5,
        freq_mask: bool = True,
        n_freq_mask: int = 2,
        freq_mask_width: int = 30,
        time_mask: bool = True,
        n_time_mask: int = 2,
        time_mask_width: int = 40,
        replace_with_zero: bool = False,
        **_,
    ):
        self.do_time_warp = time_warp
        self.time_warp_window = time_warp_window
        self.do_freq_mask = freq_mask
        self.n_freq_mask = n_freq_mask
        self.freq_mask_width = freq_mask_width
        self.do_time_mask = time_mask
        self.n_time_mask = n_time_mask
        self.time_mask_width = time_mask_width
        self.replace_with_zero = replace_with_zero

    def __call__(self, key: jax.Array, feats: jax.Array) -> jax.Array:
        b, t, d = feats.shape
        k_warp, k_f, k_t = jax.random.split(key, 3)
        if self.do_time_warp:
            feats = time_warp(k_warp, feats, self.time_warp_window)
        fill = 0.0 if self.replace_with_zero else jnp.mean(feats, axis=(1, 2), keepdims=True)
        if self.do_freq_mask:
            fmask = _random_masks(k_f, b, d, self.n_freq_mask, self.freq_mask_width)
            feats = jnp.where(fmask[:, None, :], fill, feats)
        if self.do_time_mask:
            tmask = _random_masks(k_t, b, t, self.n_time_mask, self.time_mask_width)
            feats = jnp.where(tmask[:, :, None], fill, feats)
        return feats
