"""Certified-approx top-k (decoding/topk.py): the shortlist+certificate
path must return exactly lax.top_k's VALUES (tie indices may permute; on
CPU approx_max_k is itself exact, so indices match too)."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.decoding.topk import fast_top_k


def test_certificate_path_matches_lax_top_k():
    for seed in range(5):
        x = jax.random.normal(jax.random.PRNGKey(seed), (4, 3000)) * (1 + seed)
        v1, i1 = jax.lax.top_k(x, 17)
        v2, i2 = jax.jit(lambda x: fast_top_k(x, 17, force=True))(x)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        xa = np.asarray(x)
        np.testing.assert_array_equal(
            np.take_along_axis(xa, np.asarray(i2), 1), np.asarray(v2)
        )


def test_small_inputs_take_exact_path():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    v1, i1 = jax.lax.top_k(x, 8)
    v2, i2 = fast_top_k(x, 8, force=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
