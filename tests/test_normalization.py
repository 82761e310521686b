"""InputNormalization semantics tests (reference: SpeechBrain 0.5
InputNormalization global mode — see ops/normalization.py docstring)."""

import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.ops.normalization import InputNormalizer
from speech_anonymization_tpu.train.checkpoint import Checkpointer, PytreeRecoverable


def _batch(b=4, t=20, d=8, seed=0, scale=3.0, shift=5.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * scale + shift)


def test_running_stats_are_mean_of_utterance_stats():
    norm = InputNormalizer(dim=8, update_until_epoch=4)
    state = norm.init_state()
    x = _batch()
    out, state = norm(state, x, None, epoch=0, training=True)
    # closed form: arithmetic mean of per-utterance means/stds
    expect_mean = np.asarray(x).mean(axis=1).mean(axis=0)
    np.testing.assert_allclose(np.asarray(state.glob_mean), expect_mean, rtol=1e-5)
    expect_std = np.asarray(x).std(axis=1, ddof=1).mean(axis=0)
    np.testing.assert_allclose(np.asarray(state.glob_std), expect_std, rtol=1e-4)
    assert float(state.count) == 4.0
    # normalization applied with the just-updated stats
    np.testing.assert_allclose(
        np.asarray(out), (np.asarray(x) - expect_mean) / expect_std, rtol=1e-4
    )


def test_sequential_batches_match_single_big_batch():
    norm = InputNormalizer(dim=8)
    s1 = norm.init_state()
    xa, xb = _batch(seed=1), _batch(seed=2)
    _, s1 = norm(s1, xa, None, 0, training=True)
    _, s1 = norm(s1, xb, None, 0, training=True)
    s2 = norm.init_state()
    _, s2 = norm(s2, jnp.concatenate([xa, xb]), None, 0, training=True)
    np.testing.assert_allclose(np.asarray(s1.glob_mean), np.asarray(s2.glob_mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.glob_std), np.asarray(s2.glob_std), rtol=1e-5)


def test_epoch_gate_freezes_stats():
    norm = InputNormalizer(dim=8, update_until_epoch=2)
    state = norm.init_state()
    _, state = norm(state, _batch(seed=3), None, epoch=0, training=True)
    frozen = state
    _, state = norm(state, _batch(seed=4, shift=50.0), None, epoch=2, training=True)
    np.testing.assert_allclose(np.asarray(state.glob_mean), np.asarray(frozen.glob_mean))
    assert float(state.count) == float(frozen.count)


def test_eval_mode_never_updates():
    norm = InputNormalizer(dim=8)
    state = norm.init_state()
    _, state2 = norm(state, _batch(seed=5), None, epoch=0, training=False)
    assert float(state2.count) == 0.0
    # identity transform before any stats exist
    out, _ = norm(state, _batch(seed=6), None, 0, training=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_batch(seed=6)), rtol=1e-6)


def test_masked_lengths_ignore_padding():
    norm = InputNormalizer(dim=8)
    state = norm.init_state()
    x = _batch(b=2, t=20)
    x = x.at[:, 10:].set(999.0)  # padding garbage
    lens = jnp.asarray([0.5, 0.5])
    _, state = norm(state, x, lens, 0, training=True)
    expect = np.asarray(x)[:, :10].mean(axis=1).mean(axis=0)
    np.testing.assert_allclose(np.asarray(state.glob_mean), expect, rtol=1e-4)


def test_interval_checkpointing(tmp_path):
    holder = {"v": jnp.ones(3)}
    ck = Checkpointer(
        str(tmp_path), {"model": PytreeRecoverable(lambda: holder["v"], holder.update)}
    )
    ck._last_save_time -= 3600  # pretend an hour passed
    saved = ck.maybe_save_interval({"epoch": 1}, interval_minutes=5)
    assert saved is not None
    assert ck.maybe_save_interval({"epoch": 1}, interval_minutes=5) is None  # too soon
