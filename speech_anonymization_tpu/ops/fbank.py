"""GEMM-native log-mel filterbank frontend.

Replaces the reference's ``speechbrain.lobes.features.Fbank`` frontend
(instantiated at gender_classifier.yaml:87-90 and convae.yaml:289-292 in the
reference repo with sample_rate=16000, n_fft=400, n_mels=80; applied at
gender_classifier_train.py:113 and speechbrain_convae_train.py:58).

The reference computes, per SpeechBrain 0.5 semantics:
  1. STFT: 25 ms Hamming window, 10 ms hop, n_fft=400, center padding
     (zeros), one-sided, unnormalized (torch.stft semantics).
  2. power spectrum |X|^2  (``spectral_magnitude(stft, power=1)``).
  3. 80 triangular mel filters, HTK mel scale, f_min=0..f_max=8000,
     symmetric-band triangles (SpeechBrain's own construction, NOT librosa).
  4. dB conversion: 10*log10(clamp(x, 1e-10)) followed by a *batch-global*
     top_db=80 floor (x_db >= x_db.max() - 80).

TPU-first design: an FFT is the wrong tool for n_fft=400 on a systolic
array. Instead the whole frontend is three GEMMs that the MXU eats whole:

    frames (B*T, 400)  @  [W*cos | W*sin] (400, 2*201)   -> real, imag
    (real^2 + imag^2)  @  mel_fb (201, 80)               -> mel power
    log/clamp (fused elementwise epilogue by XLA)

The window is folded into the DFT matrices so framing feeds the MXU
directly. Framing itself is pure reshape/slice/concat (no gather): the
signal is decomposed into hop-sized phases and each frame is a static
concatenation of adjacent phase rows, which XLA compiles to layout ops.

A fused Pallas kernel for the full pipeline lives in
``ops/pallas/fbank_kernel.py``; this module is the XLA reference path and
the fallback on CPU.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _to_mel(hz: np.ndarray | float) -> np.ndarray:
    """HTK mel scale used by the reference Filterbank."""
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def _to_hz(mel: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank_matrix(
    n_fft: int = 400,
    n_mels: int = 80,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: float = 8000.0,
) -> np.ndarray:
    """(n_fft//2+1, n_mels) triangular mel filterbank, reference semantics.

    SpeechBrain 0.5 builds symmetric triangles: for filter i with centre
    ``hz[i+1]`` and band ``hz[i+1]-hz[i]`` (uniform in mel),
    ``max(0, min(slope+1, -slope+1))`` with ``slope=(f-centre)/band``.
    Frequency axis is ``linspace(0, sample_rate//2, n_fft//2+1)``.
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_to_mel(f_min), _to_mel(f_max), n_mels + 2)
    hz = _to_hz(mel_pts)
    band = (hz[1:] - hz[:-1])[:-1]          # (n_mels,)
    f_central = hz[1:-1]                    # (n_mels,)
    slope = (all_freqs[:, None] - f_central[None, :]) / band[None, :]
    left = slope + 1.0
    right = -slope + 1.0
    fbank = np.maximum(0.0, np.minimum(left, right))
    return fbank.astype(np.float32)


def dft_matrices(n_fft: int = 400, win_length: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT matrices (win_length, n_fft//2+1) for cos and -sin.

    The periodic Hamming window (torch.hamming_window default) is folded in,
    so ``frames @ C`` and ``frames @ S`` give the real/imag parts of the
    one-sided unnormalized STFT.
    """
    if win_length is None:
        win_length = n_fft
    n_bins = n_fft // 2 + 1
    k = np.arange(win_length, dtype=np.float64)
    f = np.arange(n_bins, dtype=np.float64)
    # periodic hamming: 0.54 - 0.46*cos(2*pi*n/N)
    window = 0.54 - 0.46 * np.cos(2.0 * np.pi * k / win_length)
    angle = 2.0 * np.pi * np.outer(k, f) / n_fft
    cos_m = (window[:, None] * np.cos(angle)).astype(np.float32)
    sin_m = (window[:, None] * -np.sin(angle)).astype(np.float32)
    return cos_m, sin_m


def num_frames(n_samples: int, hop_length: int = 160, center: bool = True, win_length: int = 400) -> int:
    """Frame count matching torch.stft."""
    if center:
        return 1 + n_samples // hop_length
    return 1 + (n_samples - win_length) // hop_length


def frame_signal(
    wav: jax.Array,
    win_length: int = 400,
    hop_length: int = 160,
    center: bool = True,
) -> jax.Array:
    """Frame (B, L) waveforms into (B, T, win_length) with zero pad.

    Gather-free: the padded signal is reshaped into hop-sized phases and
    each frame is a concat of ``ceil(win/hop)+1`` adjacent rows, then a
    static column slice. All ops are reshapes/slices, free on TPU.
    """
    batch, n_samples = wav.shape
    pad_left = win_length // 2 if center else 0
    t_out = num_frames(n_samples, hop_length, center, win_length)
    # rows of hop samples each frame spans (frame start is row-aligned)
    rows_per_frame = -(-win_length // hop_length)  # ceil
    # total padded length so every frame's rows exist
    needed = (t_out - 1) * hop_length + rows_per_frame * hop_length
    total = -(-(pad_left + n_samples) // hop_length) * hop_length
    total = max(total, needed)
    pad_right = total - pad_left - n_samples
    x = jnp.pad(wav, ((0, 0), (pad_left, pad_right)))
    rows = x.reshape(batch, total // hop_length, hop_length)
    pieces = [
        jax.lax.slice_in_dim(rows, r, r + t_out, axis=1) for r in range(rows_per_frame)
    ]
    frames = jnp.concatenate(pieces, axis=-1)[:, :, :win_length]
    return frames


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    """Matches the reference Fbank defaults (convae.yaml:93-95)."""

    sample_rate: int = 16000
    n_fft: int = 400
    n_mels: int = 80
    win_length: int = 400          # 25 ms
    hop_length: int = 160          # 10 ms
    f_min: float = 0.0
    f_max: float = 8000.0
    log_mel: bool = True
    amin: float = 1e-10
    top_db: float = 80.0
    center: bool = True
    # 'batch' reproduces the reference's batch-global top_db floor
    # (SpeechBrain _amplitude_to_DB uses x_db.max() over the whole batch);
    # 'none' disables the floor (deterministic w.r.t. batch composition).
    top_db_mode: str = "batch"
    dtype: jnp.dtype = jnp.float32


class Fbank:
    """Stateless callable computing log-mel features, (B, L) -> (B, T, n_mels).

    Drop-in equivalent of the reference's ``hparams.compute_features``
    (speechbrain_convae_train.py:58, gender_classifier_train.py:113).
    """

    def __init__(self, config: FbankConfig = FbankConfig(), use_pallas: bool | None = None):
        self.config = config
        cos_m, sin_m = dft_matrices(config.n_fft, config.win_length)
        # concatenate so the DFT is a single (win, 2*bins) GEMM
        dft_np = np.concatenate([cos_m, sin_m], axis=1)
        mel_np = mel_filterbank_matrix(
            config.n_fft, config.n_mels, config.sample_rate, config.f_min, config.f_max
        )
        self._dft = jnp.asarray(dft_np, dtype=config.dtype)
        self._mel = jnp.asarray(mel_np, dtype=config.dtype)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self._use_pallas = use_pallas
        if use_pallas:
            from .pallas.fbank_kernel import prepare_operands

            self._dft_padded, self._mel_padded = prepare_operands(dft_np, mel_np)

    @property
    def n_bins(self) -> int:
        return self.config.n_fft // 2 + 1

    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            return self(wav[None])[0]
        cfg = self.config
        frames = frame_signal(wav, cfg.win_length, cfg.hop_length, cfg.center)
        if self._use_pallas:
            from .pallas.fbank_kernel import fused_fbank

            mel = fused_fbank(frames, self._dft_padded, self._mel_padded, cfg.n_mels)
        else:
            mel = self._mel_power(frames)
        if not cfg.log_mel:
            return mel
        x_db = 10.0 * jnp.log10(jnp.maximum(mel, cfg.amin))
        if cfg.top_db is not None and cfg.top_db_mode == "batch":
            x_db = jnp.maximum(x_db, jnp.max(x_db) - cfg.top_db)
        return x_db

    def _mel_power(self, frames: jax.Array) -> jax.Array:
        n_bins = self.n_bins
        spec = jax.lax.dot_general(
            frames,
            self._dft,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        real = spec[..., :n_bins]
        imag = spec[..., n_bins:]
        power = real * real + imag * imag
        mel = jax.lax.dot_general(
            power,
            self._mel,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return mel
