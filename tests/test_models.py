"""Model shape/contract tests (the reference had only a notebook shape
smoke test — SURVEY.md §4; this is the systematic replacement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_anonymization_tpu.models import (
    ConvAutoencoder,
    ConvReconstruction,
    CycleGANGenerator,
    DummyFullyConnectedAutoencoder,
    FullyConnectedAutoencoder,
    Xvector,
    XvectorClassifier,
)
from speech_anonymization_tpu.ops.grl import grad_reverse


KEY = jax.random.PRNGKey(0)


def _init_apply(model, feats, **kw):
    variables = model.init({"params": KEY, "dummy": KEY}, feats, **kw)
    out = model.apply(variables, feats, **kw, rngs={"dummy": KEY})
    return variables, out


def test_grad_reverse_identity_forward_negates_backward():
    x = jnp.arange(6.0).reshape(2, 3)
    assert jnp.allclose(grad_reverse(x, 1.0), x)
    g = jax.grad(lambda v: jnp.sum(grad_reverse(v, 1.0) ** 2))(x)
    g_plain = jax.grad(lambda v: jnp.sum(v ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), -np.asarray(g_plain))
    g2 = jax.grad(lambda v: jnp.sum(grad_reverse(v, 0.5)))(x)
    np.testing.assert_allclose(np.asarray(g2), -0.5 * np.ones_like(g2))


def test_fcae_shapes():
    feats = jnp.ones((3, 50, 80))
    model = FullyConnectedAutoencoder()
    _, (recon, sex) = _init_apply(model, feats)
    assert recon.shape == (3, 50, 80)
    assert sex.shape == (3, 2)
    np.testing.assert_allclose(np.exp(np.asarray(sex)).sum(-1), 1.0, rtol=1e-5)


def test_convae_shapes_and_time_padding_rule():
    # trainer pads T to a multiple of 36 (speechbrain_convae_train.py:62-63)
    feats = jnp.ones((2, 36, 80))
    model = ConvAutoencoder()
    _, (recon, sex) = _init_apply(model, feats)
    assert recon.shape == (2, 36, 80)
    assert sex.shape == (2, 2)


def test_convreconstruction_shapes():
    feats = jnp.ones((2, 36, 80))
    model = ConvReconstruction()
    _, recon = _init_apply(model, feats)
    assert recon.shape == (2, 36, 80)


def test_cyclegan_generator_shapes():
    feats = jnp.ones((2, 32, 80))  # T, F divisible by 4
    model = CycleGANGenerator()
    _, (recon, sex) = _init_apply(model, feats)
    assert recon.shape == (2, 32, 80)
    assert sex.shape == (2, 2)


def test_dummy_fcae():
    feats = jnp.ones((2, 20, 80))
    model = DummyFullyConnectedAutoencoder()
    _, (recon, sex) = _init_apply(model, feats)
    assert recon.shape == (2, 20, 80)
    assert sex.shape == (2, 2)


def test_xvector_pipeline():
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((4, 120, 80)), jnp.float32)
    lengths = jnp.asarray([1.0, 0.8, 0.5, 1.0])
    emb_model = Xvector()
    v = emb_model.init(KEY, feats, lengths)
    emb = emb_model.apply(v, feats, lengths)
    assert emb.shape == (4, 128)
    clf = XvectorClassifier()
    vc = clf.init(KEY, emb)
    out = clf.apply(vc, emb)
    assert out.shape == (4, 2)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-5)


def test_grl_flows_through_fcae():
    """Adversarial sign: grads w.r.t. encoder params from the sex loss must
    be REVERSED relative to a no-GRL classifier (the defining property)."""
    feats = jnp.asarray(np.random.default_rng(1).standard_normal((4, 10, 80)), jnp.float32)
    labels = jnp.asarray([0, 1, 0, 1])
    model = FullyConnectedAutoencoder()
    variables = model.init(KEY, feats)

    def sex_loss(params, scale):
        m = FullyConnectedAutoencoder(grl_scale=scale)
        _, sex = m.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, feats)
        picked = jnp.take_along_axis(sex, labels[:, None], axis=-1)
        return -jnp.mean(picked)

    g_pos = jax.grad(sex_loss)(variables["params"], 1.0)
    g_neg = jax.grad(sex_loss)(variables["params"], -1.0)
    # encoder grads flip sign exactly with the GRL scale
    enc_pos = g_pos["Dense_0"]["kernel"]
    enc_neg = g_neg["Dense_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(enc_pos), -np.asarray(enc_neg), rtol=1e-5)
    # classifier-side grads are NOT reversed (GRL sits between)
    clf_pos = g_pos["sex_classifier"]["Dense_0"]["kernel"]
    clf_neg = g_neg["sex_classifier"]["Dense_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(clf_pos), np.asarray(clf_neg), rtol=1e-5)
    assert float(jnp.abs(enc_pos).sum()) > 0


def test_batchnorm_stats_update_in_train_mode():
    feats = jnp.asarray(np.random.default_rng(2).standard_normal((4, 36, 80)), jnp.float32)
    model = ConvAutoencoder()
    variables = model.init(KEY, feats, train=False)
    out, mutated = model.apply(variables, feats, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
