"""Native C++ extension tests: audio IO and world_lite pitch ops."""

import os
import subprocess

import numpy as np
import pytest

import speech_anonymization_tpu.data.audio as audio_mod
from speech_anonymization_tpu.data.audio import read_audio, write_wav
from speech_anonymization_tpu.data.pitch import (
    _pitch_normalize_numpy,
    _track_f0_numpy,
    pitch_normalize,
    track_f0,
)

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native", "libsatpu_audio.so")


def _ensure_native():
    if not os.path.exists(NATIVE):
        subprocess.run(["make", "-C", os.path.dirname(NATIVE)], check=True)


def _tone(f0=120.0, sr=16000, seconds=1.0, harmonics=4):
    t = np.arange(int(sr * seconds)) / sr
    wav = sum((0.4 / h) * np.sin(2 * np.pi * f0 * h * t) for h in range(1, harmonics + 1))
    return wav.astype(np.float32)


def test_native_wav_reader_matches_python(tmp_path):
    _ensure_native()
    wav = _tone()
    p = str(tmp_path / "t.wav")
    write_wav(p, wav)
    native = read_audio(p)  # dispatches to the native lib when built
    py, sr = audio_mod._read_wav_numpy(p)
    np.testing.assert_allclose(native, py, atol=1e-6)


def test_f0_tracking_accuracy():
    _ensure_native()
    for true_f0 in (110.0, 220.0):
        f0, hop = track_f0(_tone(true_f0), 16000)
        voiced = f0[f0 > 0]
        assert voiced.size > 10
        assert abs(np.median(voiced) - true_f0) < 6.0, (true_f0, np.median(voiced))


def test_pitch_normalize_shifts_mean_f0():
    _ensure_native()
    wav = _tone(120.0, seconds=1.2)
    out = pitch_normalize(wav, 16000, target_f0=300.0)
    assert out.shape == wav.shape
    f0, _ = track_f0(out, 16000)
    voiced = f0[f0 > 0]
    assert voiced.size > 10
    # PSOLA re-spacing should land near the target
    assert abs(np.median(voiced) - 300.0) < 40.0, np.median(voiced)


def test_numpy_fallback_agrees_on_f0():
    wav = _tone(150.0)
    f0_np, _ = _track_f0_numpy(wav, 16000)
    voiced = f0_np[f0_np > 0]
    assert abs(np.median(voiced) - 150.0) < 8.0


def test_numpy_fallback_pitch_normalize_runs():
    wav = _tone(120.0, seconds=0.5)
    out = _pitch_normalize_numpy(wav, 16000, 250.0)
    assert out.shape == wav.shape
    assert np.isfinite(out).all()


def test_unvoiced_passthrough():
    _ensure_native()
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(8000) * 0.05).astype(np.float32)
    out = pitch_normalize(noise, 16000, 500.0)
    assert out.shape == noise.shape
    assert np.isfinite(out).all()
