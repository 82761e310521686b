"""MI privacy-loss tests (ClusterMI / GroupSamplingMI / MILoss)."""

import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.losses import ClusterMI, GroupSamplingMI, MILoss, cosine_distance_matrix


def _data(separated: bool, n=40, d=16, seed=0):
    rng = np.random.default_rng(seed)
    y = np.asarray([i % 2 for i in range(n)])
    x = rng.standard_normal((n, d)).astype(np.float32)
    if separated:
        x[y == 0, :4] += 6.0
        x[y == 1, 4:8] += 6.0
    return jnp.asarray(x), jnp.asarray(y)


def test_cosine_distance_matrix_matches_manual():
    x, _ = _data(False, n=10)
    d = np.asarray(cosine_distance_matrix(x))
    xn = np.asarray(x) / np.linalg.norm(np.asarray(x), axis=1, keepdims=True)
    manual = 1.0 - xn @ xn.T
    np.testing.assert_allclose(d, manual, atol=5e-4)  # f32 rsqrt noise
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-6)


def test_cluster_mi_separated_vs_random():
    mi_est = ClusterMI(n_classes=2, k=3)
    x_sep, y = _data(True)
    x_rand, _ = _data(False, seed=1)
    mi_sep = float(mi_est(x_sep, y))
    mi_rand = float(mi_est(x_rand, y))
    # separable classes carry ~1 bit; random ~0
    assert mi_sep > 0.5, mi_sep
    assert mi_rand < 0.3, mi_rand


def test_group_sampling_mi_returns_stats():
    x, y = _data(True)
    gs = GroupSamplingMI(n_samples=10, n_classes=2, n_iterations=8)
    mi, mean, std = gs(x, np.asarray(y), np.asarray(y), seed=0)
    assert mi.shape == (8,)
    assert float(mean) > 0.3
    assert float(std) >= 0.0


def test_mi_loss_returns_scalar_mean():
    x, y = _data(True)
    loss = MILoss()(x, np.asarray(y), np.asarray(y), batch_size=10)
    assert np.ndim(np.asarray(loss)) == 0
    assert np.isfinite(float(loss))
