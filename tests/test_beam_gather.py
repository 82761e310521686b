"""Pallas beam-gather kernel: exactness vs jnp.take (interpret mode on CPU;
the Mosaic compile is exercised on-chip by scripts/bench_decode.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.models.transformer import beam_reorder_cache, make_kv_cache
from speech_anonymization_tpu.ops.pallas.beam_gather import beam_gather_rows


def test_beam_gather_matches_take_interpret():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((3, 12, 8, 128)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, 12, size=(12,)).astype(np.int32))
    out = beam_gather_rows(a, src, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(jnp.take(a, src, axis=1)))


def test_beam_gather_bf16_exact_interpret():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((2, 8, 16, 256)).astype(np.float32)).astype(jnp.bfloat16)
    src = jnp.asarray([3, 3, 0, 7, 1, 1, 1, 2], jnp.int32)  # duplicates allowed
    out = beam_gather_rows(a, src, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(a[:, src]))


def test_beam_reorder_cache_semantics():
    # block-diagonal parenting: row b*K+i takes cache of row b*K+parent[b,i]
    b, k, layers, u = 2, 3, 2, 4
    cache = make_kv_cache(b * k, u, layers, nhead=2, d_head=64)
    rng = np.random.default_rng(2)
    cache["k"] = jnp.asarray(rng.standard_normal(cache["k"].shape).astype(np.float32))
    cache["v"] = jnp.asarray(rng.standard_normal(cache["v"].shape).astype(np.float32))
    cache["tokens"] = jnp.asarray(rng.integers(0, 9, cache["tokens"].shape).astype(np.int32))
    parent = jnp.asarray([[2, 0, 0], [1, 2, 0]], jnp.int32)
    out = beam_reorder_cache(cache, parent)
    src = np.asarray([2, 0, 0, 4, 5, 3])
    np.testing.assert_array_equal(np.asarray(out["k"]), np.asarray(cache["k"])[:, src])
    np.testing.assert_array_equal(np.asarray(out["v"]), np.asarray(cache["v"])[:, src])
    np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(cache["tokens"])[src])
