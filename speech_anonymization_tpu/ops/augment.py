"""Waveform-domain augmentations as pure jittable ops.

Reference components (gender_classifier.yaml:72-84):
  * EnvCorrupt(noise_prob=1, snr 0..15 dB, babble/reverb off) — additive
    noise at a random SNR. The reference samples OpenRIR noise files; with
    no corpus available this implementation synthesizes filtered noise on
    device (and accepts a noise bank array when a corpus exists).
  * TimeDomainSpecAugment(speeds=[95,100,105]) — SpeechBrain's time-domain
    recipe: random speed perturbation + frequency dropout + chunk dropout.

All ops keep STATIC shapes (padded waveforms + relative lengths): speed
changes re-stretch the signal in place via fractional-index gathers and
scale the relative lengths instead of reallocating (SURVEY.md §5
long-context: bucketing + masking everywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _length_mask(n_samples: int, lens: jax.Array, batch: int) -> jax.Array:
    idx = jnp.arange(n_samples)[None, :]
    return (idx < jnp.round(lens * n_samples)[:, None]).astype(jnp.float32)


def add_noise(
    key: jax.Array,
    wavs: jax.Array,
    lens: jax.Array,
    snr_low: float = 0.0,
    snr_high: float = 15.0,
    noise_bank: jax.Array | None = None,
) -> jax.Array:
    """Additive noise at a per-utterance random SNR in [snr_low, snr_high] dB.

    ``noise_bank``: optional (N, L') array of real noise clips; a random
    clip is tiled/cropped per utterance. Defaults to white noise.
    """
    b, t = wavs.shape
    k_snr, k_pick, k_noise = jax.random.split(key, 3)
    mask = _length_mask(t, lens, b)
    snr = jax.random.uniform(k_snr, (b, 1), minval=snr_low, maxval=snr_high)
    if noise_bank is not None:
        idx = jax.random.randint(k_pick, (b,), 0, noise_bank.shape[0])
        clips = noise_bank[idx]
        reps = -(-t // clips.shape[1])
        noise = jnp.tile(clips, (1, reps))[:, :t]
    else:
        noise = jax.random.normal(k_noise, (b, t))
    sig_pow = jnp.sum((wavs * mask) ** 2, axis=1, keepdims=True) / jnp.maximum(
        jnp.sum(mask, axis=1, keepdims=True), 1.0
    )
    noise_pow = jnp.sum((noise * mask) ** 2, axis=1, keepdims=True) / jnp.maximum(
        jnp.sum(mask, axis=1, keepdims=True), 1.0
    )
    target_noise_pow = sig_pow / (10.0 ** (snr / 10.0))
    scale = jnp.sqrt(target_noise_pow / jnp.maximum(noise_pow, 1e-14))
    return wavs + scale * noise * mask


def speed_perturb(
    key: jax.Array,
    wavs: jax.Array,
    lens: jax.Array,
    speeds=(95, 100, 105),
) -> tuple[jax.Array, jax.Array]:
    """Random per-utterance speed change by resampling (static shapes).

    speed s% maps output[i] = input[i * s/100] (linear interp); the valid
    length scales by 100/s, clamped to the padded buffer. Returns
    (wavs, new_lens).
    """
    b, t = wavs.shape
    speeds_arr = jnp.asarray(speeds, jnp.float32) / 100.0
    pick = jax.random.randint(key, (b,), 0, len(speeds))
    rate = speeds_arr[pick]  # (B,)
    pos = jnp.arange(t, dtype=jnp.float32)[None, :] * rate[:, None]
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    i1 = jnp.clip(i0 + 1, 0, t - 1)
    frac = pos - i0.astype(jnp.float32)
    g0 = jnp.take_along_axis(wavs, i0, axis=1)
    g1 = jnp.take_along_axis(wavs, i1, axis=1)
    out = g0 * (1.0 - frac) + g1 * frac
    new_lens = jnp.minimum(lens / rate, 1.0)
    mask = _length_mask(t, new_lens, b)
    return out * mask, new_lens


def drop_chunk(
    key: jax.Array,
    wavs: jax.Array,
    lens: jax.Array,
    drop_count_high: int = 3,
    drop_length_low: int = 1000,
    drop_length_high: int = 2000,
) -> jax.Array:
    """Zero out up to ``drop_count_high`` random chunks per utterance."""
    b, t = wavs.shape
    keys = jax.random.split(key, 3)
    count = jax.random.randint(keys[0], (b, 1), 0, drop_count_high + 1)
    starts = jax.random.randint(keys[1], (b, drop_count_high), 0, jnp.maximum(t - drop_length_high, 1))
    length = jax.random.randint(keys[2], (b, drop_count_high), drop_length_low, drop_length_high)
    idx = jnp.arange(t)[None, None, :]
    active = (jnp.arange(drop_count_high)[None, :, None] < count[:, :, None]).astype(jnp.bool_)
    in_chunk = (idx >= starts[:, :, None]) & (idx < (starts + length)[:, :, None]) & active
    dropped = jnp.any(in_chunk, axis=1)
    return jnp.where(dropped, 0.0, wavs)


def drop_freq(
    key: jax.Array,
    wavs: jax.Array,
    drop_count_high: int = 2,
    band_width: float = 0.05,
    filter_len: int = 101,
) -> jax.Array:
    """Notch-filter random frequency bands (SpeechBrain drop_freq analogue).

    Builds a per-utterance FIR notch (delta minus a windowed band-pass) and
    convolves — one dense conv, XLA-friendly.
    """
    b, t = wavs.shape
    k_count, k_freq = jax.random.split(key)
    half = filter_len // 2
    n = jnp.arange(filter_len, dtype=jnp.float32) - half
    window = jnp.hamming(filter_len)

    count = jax.random.randint(k_count, (b,), 0, drop_count_high + 1)
    centers = jax.random.uniform(k_freq, (b, drop_count_high), minval=0.05, maxval=0.45)

    def notch_kernel(center):
        f1, f2 = center - band_width / 2, center + band_width / 2
        lp = 2 * f1 * jnp.sinc(2 * f1 * n)
        hp_inv = 2 * f2 * jnp.sinc(2 * f2 * n)
        band = (hp_inv - lp) * window
        delta = jnp.where(n == 0, 1.0, 0.0)
        return delta - band

    def combined(centers_i, count_i):
        kern = jnp.where(n == 0, 1.0, 0.0)
        for j in range(drop_count_high):
            kj = notch_kernel(centers_i[j])
            kern = jnp.where(j < count_i, jnp.convolve(kern, kj, mode="same"), kern)
        return kern

    kernels = jax.vmap(combined)(centers, count)  # (B, filter_len)
    padded = jnp.pad(wavs, ((0, 0), (half, half)))
    out = _batched_fir(padded, kernels, filter_len)
    return out[:, :t]


def _batched_fir(padded: jax.Array, kernels: jax.Array, filter_len: int) -> jax.Array:
    """Per-utterance FIR via grouped conv: (B, T+pad) * (B, K) -> (B, T)."""
    b = padded.shape[0]
    lhs = padded[None, :, :]                      # (1, B, T+pad) as N,C,W
    rhs = kernels[:, None, :]                     # (B, 1, K) as O,I,W with groups=B
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=b,
    )
    return out[0]


class EnvCorrupt:
    """Additive-noise corruption (gender_classifier.yaml:72-78)."""

    def __init__(self, noise_snr_low=0.0, noise_snr_high=15.0, noise_bank=None, **_):
        self.snr_low = noise_snr_low
        self.snr_high = noise_snr_high
        self.noise_bank = noise_bank

    def __call__(self, key, wavs, lens):
        return add_noise(key, wavs, lens, self.snr_low, self.snr_high, self.noise_bank)


class TimeDomainSpecAugment:
    """speed perturb -> drop_freq -> drop_chunk (gender_classifier.yaml:82-84)."""

    def __init__(self, sample_rate=16000, speeds=(95, 100, 105), **_):
        self.speeds = tuple(speeds)

    def __call__(self, key, wavs, lens):
        k1, k2, k3 = jax.random.split(key, 3)
        wavs, lens = speed_perturb(k1, wavs, lens, self.speeds)
        wavs = drop_freq(k2, wavs)
        wavs = drop_chunk(k3, wavs, lens)
        return wavs, lens
