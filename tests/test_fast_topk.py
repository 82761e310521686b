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


def test_counted_variant_reports_flag():
    from speech_anonymization_tpu.decoding.topk import fast_top_k_counted

    x = jax.random.normal(jax.random.PRNGKey(3), (4, 2000))
    v, i, fb = jax.jit(lambda x: fast_top_k_counted(x, 17, force=True))(x)
    v_ref, _ = jax.lax.top_k(x, 17)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    assert np.asarray(fb).shape == ()
    assert int(np.asarray(fb)) in (0, 1)


def test_beam_search_return_stats_plumbing():
    """return_stats must add a stats dict with the per-decode certified
    top-k fallback count without changing hypotheses."""
    import jax.numpy as jnp
    from speech_anonymization_tpu.decoding import BeamSearchConfig, beam_search
    from speech_anonymization_tpu.decoding.beam_search import hyps_to_lists

    b, t, v = 2, 6, 12
    enc = jax.random.normal(jax.random.PRNGKey(0), (b, t, 8))
    lens = jnp.ones((b,))
    logits = jax.random.normal(jax.random.PRNGKey(1), (b * 3, v))

    def att_step(flat_tokens, step):
        return jnp.tile(logits[: flat_tokens.shape[0]], (1, 1))

    cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.0)
    plain = beam_search(att_step, enc, lens, None, cfg, max_steps=5)
    with_stats = beam_search(att_step, enc, lens, None, cfg, max_steps=5,
                             return_stats=True)
    assert len(with_stats) == 4
    stats = with_stats[3]
    assert stats["steps"] == 5
    assert int(np.asarray(stats["topk_fallbacks"])) == 0  # CPU: exact route
    assert hyps_to_lists(*plain[:2]) == hyps_to_lists(*with_stats[:2])
