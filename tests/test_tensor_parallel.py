"""Tensor-parallel ASR sharding over a ('data','model') mesh.

Optional capability beyond the reference's DP-only story: attention heads
and FFN hidden dims shard over 'model'; a dp x tp grad step must match the
unsharded step numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.models.asr import ASRModel
from speech_anonymization_tpu.parallel import make_mesh
from speech_anonymization_tpu.parallel.mesh import data_sharding
from speech_anonymization_tpu.parallel.sharding_rules import asr_param_specs, shard_asr_params
from speech_anonymization_tpu.losses import kldiv_loss

SMALL = dict(d_model=32, nhead=4, num_encoder_layers=2, num_decoder_layers=1,
             d_ffn=64, output_neurons=48)


def _setup():
    model = ASRModel(**SMALL)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (8, 24, 80))
    tokens = jnp.ones((8, 6), jnp.int32)
    lens = jnp.ones((8,))
    variables = model.init(key, feats[:1], tokens[:1], lens[:1])
    return model, variables, feats, tokens, lens


def test_specs_shard_attention_and_ffn():
    model, variables, *_ = _setup()
    specs = asr_param_specs(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    joined = {"/".join(str(getattr(p, "key", p)) for p in path): spec for path, spec in flat}
    assert any("q/kernel" in k and spec == jax.sharding.PartitionSpec(None, "model", None)
               for k, spec in joined.items())
    assert any("FeedForward" in k and "Dense_0/kernel" in k
               and spec == jax.sharding.PartitionSpec(None, "model")
               for k, spec in joined.items())
    # decoder layers name their FFN 'ff' (setup) — must be sharded too
    assert any("/ff/" in f"/{k}/" and "Dense_0/kernel" in k
               and spec == jax.sharding.PartitionSpec(None, "model")
               for k, spec in joined.items())
    # embeddings and norms stay replicated
    assert any("embed" in k.lower() and spec == jax.sharding.PartitionSpec()
               for k, spec in joined.items())


def test_tp_grad_matches_unsharded():
    model, variables, feats, tokens, lens = _setup()
    params = variables["params"]
    targets = jnp.ones((8, 6), jnp.int32)

    def loss_fn(p, f):
        enc, dec, p_ctc, p_seq = model.apply({"params": p}, f, tokens, lens)
        return kldiv_loss(p_seq, targets, None)

    grad = jax.jit(jax.grad(loss_fn))
    g_ref = grad(params, feats)

    mesh = make_mesh(shape=(4, 2), axis_names=("data", "model"))
    params_tp = shard_asr_params(params, mesh)
    feats_dp = jax.device_put(feats, data_sharding(mesh))
    g_tp = grad(params_tp, feats_dp)

    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # params actually sharded over 'model'
    ffn_kernels = [
        leaf for path, leaf in jax.tree_util.tree_flatten_with_path(params_tp)[0]
        if "FeedForward" in "/".join(str(getattr(p, "key", p)) for p in path)
        and "Dense_0/kernel" in "/".join(str(getattr(p, "key", p)) for p in path)
    ]
    assert ffn_kernels
    spec = ffn_kernels[0].sharding.spec
    assert "model" in str(spec)
