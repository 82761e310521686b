"""Golden (torch CPU) reimplementation of the reference feature frontend.

The reference's SpeechBrain 0.5 submodule is empty, so this module encodes
its Fbank semantics (STFT -> |X|^2 -> triangular mel -> dB with batch-global
top_db floor) directly on top of ``torch.stft``, which is the exact kernel
SpeechBrain 0.5 wraps (speechbrain.processing.features.STFT). Used only by
tests to check the JAX/Pallas frontend for bit-comparability
(BASELINE.md: mel MAE <= 1e-3).
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
