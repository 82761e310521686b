"""Augmentation op tests (waveform + feature domain)."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.ops.augment import (
    EnvCorrupt,
    TimeDomainSpecAugment,
    add_noise,
    drop_chunk,
    drop_freq,
    speed_perturb,
)
from speech_anonymization_tpu.ops.specaugment import SpecAugment

KEY = jax.random.PRNGKey(0)


def _wavs(b=3, t=8000, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1)
    lens = jnp.asarray([1.0, 0.8, 0.6], jnp.float32)[:b]
    return w, lens


def test_add_noise_snr_range():
    wavs, lens = _wavs()
    noisy = add_noise(KEY, wavs, lens, snr_low=10.0, snr_high=10.0)
    noise = np.asarray(noisy - wavs)
    mask = np.arange(8000)[None] < (np.asarray(lens) * 8000)[:, None]
    for i in range(3):
        sp = (np.asarray(wavs)[i][mask[i]] ** 2).mean()
        npow = (noise[i][mask[i]] ** 2).mean()
        snr = 10 * np.log10(sp / npow)
        assert abs(snr - 10.0) < 0.5
    # padding region untouched
    assert np.allclose(noise[2][mask[2] == False], 0.0)  # noqa: E712


def test_speed_perturb_shapes_and_lengths():
    wavs, lens = _wavs()
    out, new_lens = speed_perturb(KEY, wavs, lens, speeds=(95, 100, 105))
    assert out.shape == wavs.shape
    ratio = np.asarray(new_lens / lens)
    assert ((np.isclose(ratio, 100 / 95, atol=1e-3)) | (np.isclose(ratio, 1.0, atol=1e-3))
            | (np.isclose(ratio, 100 / 105, atol=1e-3)) | np.isclose(np.asarray(new_lens), 1.0)).all()


def test_drop_chunk_zeroes_regions():
    wavs, lens = _wavs()
    out = drop_chunk(KEY, jnp.ones_like(wavs), lens, drop_count_high=3)
    arr = np.asarray(out)
    assert ((arr == 0) | (arr == 1)).all()


def test_drop_freq_preserves_shape_and_energy_scale():
    wavs, lens = _wavs()
    out = drop_freq(KEY, wavs)
    assert out.shape == wavs.shape
    assert np.isfinite(np.asarray(out)).all()
    # a notch filter shouldn't amplify wildly
    assert np.abs(np.asarray(out)).max() < 10 * np.abs(np.asarray(wavs)).max()


def test_time_domain_specaugment_jits():
    wavs, lens = _wavs()
    aug = TimeDomainSpecAugment()
    f = jax.jit(lambda k, w, l: aug(k, w, l))
    out, new_lens = f(KEY, wavs, lens)
    assert out.shape == wavs.shape


def test_specaugment_masks_and_jits():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 100, 80)).astype(np.float32) + 5.0)
    aug = SpecAugment()
    f = jax.jit(lambda k, x: aug(k, x))
    out = np.asarray(f(KEY, feats))
    assert out.shape == (2, 100, 80)
    # replace_with_zero=False -> masked cells equal the batch-item mean, so
    # some rows/cols become (near) constant; check variance dropped somewhere
    assert (np.abs(out - np.asarray(feats)) > 1e-6).any()


def test_env_corrupt_wrapper():
    wavs, lens = _wavs()
    ec = EnvCorrupt(noise_snr_low=0, noise_snr_high=15)
    out = jax.jit(lambda k, w, l: ec(k, w, l))(KEY, wavs, lens)
    assert out.shape == wavs.shape
