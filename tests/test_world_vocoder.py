"""WORLD-class vocoder tests (native/world_vocoder.cc).

Covers VERDICT round-1 item #6: pitch-shift accuracy of the resynthesized
contour, spectral-envelope preservation under the shift, and WORLD-style
re-rendering of unvoiced/aperiodic content (which TD-PSOLA only passed
through). Reference behavior: gender_classifier_train_pitch_norm.py:253-258
(pw.wav2world -> (voiced - mean) + 500, clipped at 0 -> pw.synthesize).
"""

import numpy as np
import pytest

from speech_anonymization_tpu.data.audio import _native_lib
from speech_anonymization_tpu.data.pitch import (
    pitch_normalize,
    track_f0,
    world_analyze,
    world_synthesize,
)

pytestmark = pytest.mark.skipif(_native_lib() is None, reason="native lib not built")

SR = 16000


def make_vowel(f0=200.0, seconds=1.0, sr=SR, noise=0.002, seed=0):
    """Harmonic sum shaped by a two-formant envelope (700 / 1400 Hz)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = np.zeros_like(t)

    def env(f):
        return (
            1.0 * np.exp(-0.5 * ((f - 700.0) / 150.0) ** 2)
            + 0.7 * np.exp(-0.5 * ((f - 1400.0) / 220.0) ** 2)
            + 0.02
        )

    k = 1
    while k * f0 < 4000.0:
        x += env(k * f0) * np.cos(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
        k += 1
    x = 0.25 * x / np.abs(x).max()
    return (x + noise * rng.standard_normal(len(x))).astype(np.float32)


def log_envelope(wav, lo_hz=300.0, hi_hz=3500.0):
    """Smoothed log power spectrum of the middle of the signal (formant shape)."""
    n = len(wav)
    seg = wav[n // 4 : 3 * n // 4].astype(np.float64)
    seg = seg * np.hanning(len(seg))
    p = np.abs(np.fft.rfft(seg)) ** 2 + 1e-12
    freqs = np.fft.rfftfreq(len(seg), 1.0 / SR)
    # smoothing must exceed the (shifted) harmonic spacing or the measure
    # compares combs, not envelopes — 450 Hz covers f0 up to ~400 Hz
    width = max(int(450.0 * len(seg) / SR), 1)
    kern = np.ones(width) / width
    sm = np.convolve(p, kern, mode="same")
    band = (freqs >= lo_hz) & (freqs <= hi_hz)
    return freqs[band], np.log(sm[band])


def test_world_pitch_shift_hits_target_contour():
    wav = make_vowel(f0=200.0)
    out = pitch_normalize(wav, SR, target_f0=300.0, method="world")
    assert out.shape == wav.shape
    f0, _ = track_f0(out, SR)
    voiced = f0[f0 > 0]
    assert voiced.size > 20
    # VERDICT #6 'Done' criterion: shifted contour mean within ±5% of target
    assert abs(voiced.mean() - 300.0) / 300.0 < 0.05


def test_world_pitch_shift_500hz_by_period_peak():
    # 500 Hz is outside the F0 tracker's 70-400 Hz band, so verify the
    # reference's actual target via the autocorrelation period of a voiced
    # segment of the output directly.
    wav = make_vowel(f0=220.0)
    out = pitch_normalize(wav, SR, target_f0=500.0, method="world")
    seg = out[len(out) // 3 : len(out) // 3 + 1600].astype(np.float64)
    seg = seg - seg.mean()
    ac = np.correlate(seg, seg, "full")[len(seg) - 1 :]
    lags = np.arange(int(SR / 650), int(SR / 350))  # search 350..650 Hz
    best = lags[np.argmax(ac[lags])]
    f0_est = SR / best
    assert abs(f0_est - 500.0) / 500.0 < 0.07


def test_world_shift_preserves_spectral_envelope():
    wav = make_vowel(f0=200.0)
    out = pitch_normalize(wav, SR, target_f0=300.0, method="world")
    _, e_in = log_envelope(wav)
    _, e_out = log_envelope(out)
    # formant structure (700/1400 Hz bumps) must survive the pitch shift
    corr = np.corrcoef(e_in, e_out)[0, 1]
    assert corr > 0.85, f"envelope correlation {corr:.3f}"


def test_world_roundtrip_energy_and_envelope():
    wav = make_vowel(f0=180.0)
    f0, sp, ap, hop = world_analyze(wav, SR)
    assert (f0 > 0).sum() > 20
    # voiced frames should be judged mostly periodic in the formant band
    voiced_rows = f0 > 0
    low_band = sp.shape[1] // 8  # ~0-1 kHz for 16 kHz / nfft 1024
    assert np.median(ap[voiced_rows][:, :low_band]) < 0.5
    out = world_synthesize(f0, sp, ap, hop, SR, n_out=len(wav))
    rms_in = float(np.sqrt((wav.astype(np.float64) ** 2).mean()))
    rms_out = float(np.sqrt((out.astype(np.float64) ** 2).mean()))
    assert 0.4 < rms_out / rms_in < 2.5, f"RMS ratio {rms_out / rms_in:.2f}"
    _, e_in = log_envelope(wav)
    _, e_out = log_envelope(out)
    assert np.corrcoef(e_in, e_out)[0, 1] > 0.9


def test_world_rerenders_unvoiced_content():
    # unlike TD-PSOLA (passthrough), WORLD synthesis re-renders unvoiced
    # regions from the noise excitation — output is fresh noise with a
    # similar level, not a copy.
    rng = np.random.default_rng(3)
    noise = (0.05 * rng.standard_normal(SR // 2)).astype(np.float32)
    f0, sp, ap, hop = world_analyze(noise, SR)
    assert (f0 == 0).mean() > 0.9  # tracked as unvoiced
    assert np.median(ap) > 0.9     # and as aperiodic
    out = world_synthesize(f0, sp, ap, hop, SR, n_out=len(noise))
    rms_in = float(np.sqrt((noise.astype(np.float64) ** 2).mean()))
    body = out[1000:-1000].astype(np.float64)
    rms_out = float(np.sqrt((body**2).mean()))
    assert 0.3 < rms_out / rms_in < 3.0, f"RMS ratio {rms_out / rms_in:.2f}"
    # fresh noise, not the input copied through
    assert not np.allclose(out[: len(noise)], noise, atol=1e-4)


def test_world_fully_unvoiced_pitch_normalize_passthrough():
    # the reference would divide by zero on mean([]); we pass through
    rng = np.random.default_rng(4)
    noise = (0.05 * rng.standard_normal(SR // 4)).astype(np.float32)
    out = pitch_normalize(noise, SR, 500.0, method="world")
    assert out.shape == noise.shape


def test_psola_method_still_available():
    wav = make_vowel(f0=200.0)
    out = pitch_normalize(wav, SR, target_f0=300.0, method="psola")
    f0, _ = track_f0(out, SR)
    voiced = f0[f0 > 0]
    assert voiced.size > 20
    assert abs(voiced.mean() - 300.0) / 300.0 < 0.08
