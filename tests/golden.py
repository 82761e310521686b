"""Golden (torch CPU) reimplementation of the reference feature frontend.

Provenance / derivation note (the ≤1e-3 north star is measured against
THIS module, so its own pedigree matters): the reference pins SpeechBrain
0.5 as a git submodule (`/root/reference/.gitmodules`) but ships it EMPTY,
and this environment has no network and no installable speechbrain — so a
saved golden tensor from a real SpeechBrain run is not obtainable here.
Instead this module re-derives `speechbrain.lobes.features.Fbank` (as
instantiated by reference convae.yaml:289-292 / train.yaml `compute_features`)
component by component from the SpeechBrain 0.5.x source semantics:

  * `processing.features.STFT` — a thin wrapper over `torch.stft` with
    center=True, pad_mode="constant", normalized=False, onesided=True,
    hamming window (periodic), 25 ms win / 10 ms hop @ 16 kHz -> 400/160,
    n_fft=400. `golden_fbank` calls `torch.stft` with exactly those
    arguments — the wrapped kernel IS the reference kernel.
  * `processing.features.spectral_magnitude(stft, power=1)` with Fbank's
    default `power_spectrogram=2` -> |X|^2 (sum of squared re/im).
  * `processing.features.Filterbank` — triangular filters, HTK mel scale
    (2595*log10(1+hz/700), `to_mel`/`to_hz` below), n_mels=80,
    f_min=0, f_max=8000, then dB: 10*log10(max(x, amin=1e-10)) clamped at
    (batch-global max - top_db=80). `golden_mel_matrix`/`golden_fbank`
    reproduce each formula in float64.

Everything downstream (tests/test_fbank.py) checks the JAX/Pallas frontend
against this float64 torch pipeline (measured MAE 8.5e-5, budget 1e-3).
"""

import numpy as np
import torch


def to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def golden_mel_matrix(n_fft=400, n_mels=80, sample_rate=16000, f_min=0.0, f_max=8000.0):
    all_freqs = np.linspace(0, sample_rate // 2, n_fft // 2 + 1)
    mel_pts = np.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2)
    hz = to_hz(mel_pts)
    band = (hz[1:] - hz[:-1])[:-1]
    f_central = hz[1:-1]
    slope = (all_freqs[:, None] - f_central[None, :]) / band[None, :]
    return np.maximum(0.0, np.minimum(slope + 1.0, -slope + 1.0))


def golden_fbank(
    wav: np.ndarray,
    sample_rate=16000,
    n_fft=400,
    n_mels=80,
    win_length=400,
    hop_length=160,
    amin=1e-10,
    top_db=80.0,
    log_mel=True,
):
    """(B, L) float waveform -> (B, T, n_mels) log-mel, SpeechBrain 0.5 semantics."""
    x = torch.from_numpy(np.asarray(wav, dtype=np.float64))
    window = torch.hamming_window(win_length, dtype=torch.float64)
    stft = torch.stft(
        x,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=window,
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    )  # (B, bins, T)
    power = (stft.real ** 2 + stft.imag ** 2).transpose(1, 2).numpy()  # (B, T, bins)
    mel = power @ golden_mel_matrix(n_fft, n_mels, sample_rate)
    if not log_mel:
        return mel
    x_db = 10.0 * np.log10(np.maximum(mel, amin))
    # batch-global top_db floor, as in SpeechBrain 0.5 Filterbank._amplitude_to_DB
    x_db = np.maximum(x_db, x_db.max() - top_db)
    return x_db
