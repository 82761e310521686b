"""Value-parity of MI and CTC losses vs the ACTUAL reference code
(VERDICT r1 #7): run /root/reference/utils/ClusterMI.py (torch, CPU) and
torch.nn.functional.ctc_loss on fixed inputs and assert the JAX versions
match.
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from speech_anonymization_tpu.losses import ctc_loss
from speech_anonymization_tpu.losses.mi import ClusterMI, cosine_distance_matrix

REF_CLUSTER_MI = "/root/reference/utils/ClusterMI.py"
needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_CLUSTER_MI), reason="reference code not available"
)


def _load_reference_cluster_mi():
    spec = importlib.util.spec_from_file_location("ref_cluster_mi", REF_CLUSTER_MI)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_ref
@pytest.mark.parametrize("seed,n,d", [(0, 24, 16), (1, 30, 8), (2, 16, 4)])
def test_cluster_mi_matches_reference(seed, n, d):
    """The vectorized (N, N)-GEMM rewrite must be value-identical to the
    reference's rotation-trick implementation."""
    ref = _load_reference_cluster_mi()
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, size=n).astype(np.int64)
    # class-dependent clusters so MI is non-trivial
    x = (rng.standard_normal((n, d)) + 2.0 * y[:, None]).astype(np.float32)

    ref_mi = ref.ClusterMI(n_classes=2, k=3)
    expected = float(ref_mi(torch.as_tensor(x), torch.as_tensor(y)))
    got = float(ClusterMI(n_classes=2, k=3)(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


@needs_ref
def test_cluster_mi_tie_semantics_match_reference():
    """Duplicated points create exact distance ties — the case VERDICT
    flagged as subtly different between rotation-dedup and a full matrix."""
    ref = _load_reference_cluster_mi()
    rng = np.random.default_rng(3)
    base = rng.standard_normal((6, 8)).astype(np.float32)
    x = np.concatenate([base, base, base + 0.5], axis=0)  # 18 rows, many ties
    y = np.asarray([0, 0, 0, 1, 1, 1] * 3, np.int64)

    expected = float(ref.ClusterMI(n_classes=2, k=3)(torch.as_tensor(x), torch.as_tensor(y)))
    got = float(ClusterMI(n_classes=2, k=3)(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


@needs_ref
def test_pairwise_distance_matrix_matches_reference():
    ref = _load_reference_cluster_mi()
    rng = np.random.default_rng(4)
    for n in (8, 9):  # even (half-rotation special case) and odd
        x = rng.standard_normal((n, 5)).astype(np.float32)
        expected = ref._pairwise_dists(torch.as_tensor(x), ref.cosine_distance_2d).numpy()
        got = np.asarray(cosine_distance_matrix(jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.parametrize("reduction", ["batchmean", "mean", "sum"])
def test_ctc_loss_matches_torch(reduction):
    """optax-backed ctc_loss == torch.nn.functional.ctc_loss (the kernel the
    reference's sb.nnet.losses.ctc_loss wraps), incl. relative-length
    semantics and blank_index."""
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    b, t, v, u = 4, 20, 8, 6
    logp = np.log(rng.dirichlet(np.ones(v), size=(b, t))).astype(np.float32)
    in_n = np.asarray([20, 17, 14, 20])
    tg_n = np.asarray([6, 4, 3, 5])
    targets = rng.integers(1, v, size=(b, u)).astype(np.int32)

    torch_red = {"batchmean": "sum", "mean": "mean", "sum": "sum"}[reduction]
    expected = F.ctc_loss(
        torch.as_tensor(logp).transpose(0, 1),  # (T, B, V)
        torch.as_tensor(targets.astype(np.int64)),
        torch.as_tensor(in_n), torch.as_tensor(tg_n),
        blank=0, reduction=torch_red, zero_infinity=True,
    )
    expected = float(expected) / (b if reduction == "batchmean" else 1)

    got = float(
        ctc_loss(
            jnp.asarray(logp), jnp.asarray(targets),
            jnp.asarray(in_n / t, np.float32), jnp.asarray(tg_n / u, np.float32),
            blank_index=0, reduction=reduction,
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-5)
