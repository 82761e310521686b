"""Mutual-information privacy estimators, vectorized for XLA.

Reference: utils/ClusterMI.py (Kraskov/Ross k-NN MI between continuous X and
discrete y, in bits), utils/GroupSamplingMI.py (100 random class-balanced
subsample iterations), utils/mi_loss.py (facade wired as
``loss_mutual_information``, convae.yaml:85, weight 0.0 in every config).

TPU redesign (SURVEY.md §2.3 notes):
  * the reference's rotation-trick pairwise-distance python loop
    (utils/ClusterMI.py:40-64) becomes ONE (N, N) cosine-distance matrix —
    a single normalized GEMM on the MXU;
  * the 100 sequential subsample MI evaluations (utils/GroupSamplingMI.py:
    53-57, pandas groupby + np.random.choice + tqdm) become a host-side
    index draw + one vmapped MI over the (n_iter, M, D) gather;
  * known latent bug fixed: the reference's MILoss returns the *list* of
    per-iteration MIs (SURVEY.md §2.3); here it returns the mean.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def cosine_distance_matrix(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(N, D) -> (N, N) pairwise cosine distances 1 - cos(x_i, x_j).

    Equivalent to the reference's ``_pairwise_dists(x, cosine_distance_2d)``
    (utils/ClusterMI.py:12-65) without the N/2-rotation python loop.
    """
    norms = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    xn = x / jnp.maximum(norms, eps)
    sim = jnp.clip(xn @ xn.T, -1.0, 1.0)
    d = 1.0 - sim
    # exact zero diagonal, as dist(x, x) = 0 in the reference matrix
    return d - jnp.diag(jnp.diag(d))


class ClusterMI:
    """k-NN MI estimator between continuous X (N, D) and labels y (N,).

    MI = digamma(N) - <digamma(N_c)>_c + digamma(k) - <digamma(m_i)>_i,
    in bits (utils/ClusterMI.py:88-121). Anchor distance is the k-th
    same-class neighbor (self included at d=0, so top-(k+1) smallest).
    """

    def __init__(self, n_classes: int = 2, k: int = 3):
        assert n_classes >= 2
        self.k = k
        self.n_classes = n_classes

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return self._mutual_information(x, y)

    def _mutual_information(self, x: jax.Array, y: jax.Array) -> jax.Array:
        digamma = jax.scipy.special.digamma
        n = x.shape[0]
        y = y.astype(jnp.int32)
        n_dig = digamma(jnp.asarray(float(n)))

        counts = jnp.asarray(
            [jnp.sum(y == c) for c in range(self.n_classes)], jnp.float32
        )
        avg_nx = jnp.sum(counts / n * digamma(counts))

        dists = cosine_distance_matrix(x)
        same = y[None, :] == y[:, None]
        big = 10e6
        dists_same = jnp.where(same, dists, big)
        # k+1 smallest same-class distances (self at 0 included)
        neg_topk = -jax.lax.top_k(-dists_same, self.k + 1)[0]
        anchor = neg_topk[:, -1]
        m_i = jnp.sum(dists <= anchor[:, None], axis=1) - 1
        avg_mi = jnp.mean(digamma(jnp.maximum(m_i.astype(jnp.float32), 1.0)))

        mi = n_dig - avg_nx + digamma(jnp.asarray(float(self.k))) - avg_mi
        return mi / math.log(2.0)


class GroupSamplingMI(ClusterMI):
    """MI over repeated class-balanced subsamples (utils/GroupSamplingMI.py).

    Index sampling happens host-side (numpy RNG — group sizes are
    data-dependent and cannot be traced); the n_iterations MI evaluations
    run as one vmapped device computation instead of a sequential loop.
    Returns (per_iteration_mi, mean, std).
    """

    def __init__(self, n_samples: int = 1, n_classes: int = 2, n_iterations: int = 100, k: int = 3):
        super().__init__(n_classes, k)
        self.n_samples = n_samples
        self.n_iterations = n_iterations

    def __call__(self, x: jax.Array, y, groups, seed: int = 0):
        groups = np.asarray(groups)
        per_group = {g: np.flatnonzero(groups == g) for g in np.unique(groups)}
        sample_size = min(self.n_samples, min(len(v) for v in per_group.values()))
        rng = np.random.default_rng(seed)
        idx = np.stack(
            [
                np.concatenate(
                    [rng.choice(v, sample_size, replace=False) for v in per_group.values()]
                )
                for _ in range(self.n_iterations)
            ]
        )  # (n_iter, n_groups * sample_size)
        x_it = jnp.asarray(x)[jnp.asarray(idx)]
        y_it = jnp.asarray(y)[jnp.asarray(idx)]
        mi = jax.vmap(self._mutual_information)(x_it, y_it)
        return mi, jnp.mean(mi), jnp.std(mi, ddof=1)


class MILoss:
    """Facade matching utils/mi_loss.py:8-17 (``loss_mutual_information``).

    Expects a class-balanced minibatch. Returns the MEAN over iterations
    (the reference returned the raw list — documented latent bug, fixed).
    """

    def __call__(self, x, y, batch_groups, batch_size: int, n_classes: int = 2,
                 samples_set_per_batch: int = 1, seed: int = 0):
        flat_x = jnp.reshape(jnp.asarray(x), (jnp.asarray(x).shape[0], -1))
        gs = GroupSamplingMI(
            n_samples=batch_size // samples_set_per_batch, n_classes=n_classes
        )
        _, mean, _ = gs(flat_x, y, batch_groups, seed=seed)
        return mean
