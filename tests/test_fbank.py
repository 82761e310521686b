"""Frontend bit-comparability tests (BASELINE.md: mel MAE <= 1e-3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_anonymization_tpu.ops.fbank import Fbank, FbankConfig, frame_signal, num_frames
from tests.golden import golden_fbank


def _rand_wav(batch=2, n=16000 * 2 + 1234, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, n)) * 0.1).astype(np.float32)


def test_frame_count_matches_torch_stft():
    for n in [16000, 16001, 16159, 16160, 12345, 400, 800]:
        wav = _rand_wav(1, n)
        frames = frame_signal(jnp.asarray(wav))
        assert frames.shape[1] == num_frames(n) == 1 + n // 160


def test_framing_matches_manual():
    wav = _rand_wav(1, 4321)
    frames = np.asarray(frame_signal(jnp.asarray(wav)))
    padded = np.pad(wav[0], (200, 600))
    for t in [0, 1, 5, frames.shape[1] - 1]:
        np.testing.assert_allclose(frames[0, t], padded[160 * t : 160 * t + 400], atol=0)


@pytest.mark.parametrize("n", [16000, 35999])
def test_logmel_matches_golden(n):
    wav = _rand_wav(2, n, seed=3)
    ours = np.asarray(Fbank(use_pallas=False)(jnp.asarray(wav)))
    ref = golden_fbank(wav)
    assert ours.shape == ref.shape
    mae = np.abs(ours - ref).mean()
    assert mae <= 1e-3, f"mel MAE {mae} exceeds 1e-3"


def test_logmel_pallas_interpret_matches_xla():
    """Pallas kernel (interpret mode on CPU) == XLA reference path."""
    from speech_anonymization_tpu.ops.pallas.fbank_kernel import fused_fbank, prepare_operands
    from speech_anonymization_tpu.ops.fbank import dft_matrices, mel_filterbank_matrix

    wav = jnp.asarray(_rand_wav(1, 16000, seed=7))
    frames = frame_signal(wav)
    cos_m, sin_m = dft_matrices()
    dft = np.concatenate([cos_m, sin_m], axis=1)
    mel_m = mel_filterbank_matrix()
    dft_p, mel_p = prepare_operands(dft, mel_m)
    mel_pallas = np.asarray(fused_fbank(frames, dft_p, mel_p, 80, interpret=True))

    fb = Fbank(use_pallas=False)
    mel_xla = np.asarray(fb._mel_power(frames))
    np.testing.assert_allclose(mel_pallas, mel_xla, rtol=1e-4, atol=1e-4)


def test_fbank_jittable():
    fb = Fbank(use_pallas=False)
    f = jax.jit(fb)
    wav = jnp.asarray(_rand_wav(2, 16000))
    out = f(wav)
    assert out.shape == (2, 101, 80)
    assert np.isfinite(np.asarray(out)).all()


def test_sine_peak_in_correct_mel_bin():
    """A 1 kHz tone must put its energy near the 1 kHz mel bin."""
    sr = 16000
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * 1000.0 * t)[None].astype(np.float32)
    out = np.asarray(Fbank(use_pallas=False)(jnp.asarray(wav)))
    mean_spec = out.mean(axis=1)[0]
    peak_bin = int(mean_spec.argmax())
    # bin centre freqs
    from tests.golden import to_hz, to_mel

    centres = to_hz(np.linspace(to_mel(0), to_mel(8000), 82))[1:-1]
    assert abs(centres[peak_bin] - 1000.0) < 120.0
