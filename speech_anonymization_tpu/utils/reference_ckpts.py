"""Mapping specs + loaders for the reference's SHIPPED torch checkpoints.

The reference repo ships real trained weights under results/ (SURVEY.md
§2.8). These are the ones a user switching frameworks would want to carry
over, and the only route to BASELINE.md parity without retraining:

  * FC-AE anonymizer ``model.ckpt`` state dicts with keys
    ``0.encoder.{0,2,4}`` / ``0.decoder.{0,2,4}`` (per-frame Linear stack,
    models/FullyConnected.py:127-142) plus one of three sex-classifier
    variants:
      - HEAD ``FullyConnSexClassifier`` (``0.sex_classifier.initial/
        norm/classify`` — results/5_5_fc/8886/save/*/model.ckpt),
      - ``DummyFullyConnSexClassifier`` (``fc1``/``fc2``, 1024->512->2 —
        results/fullyconn_normalize_recon1.0_*/8886/save/*/model.ckpt),
      - a historical 40->20->2 MLP not present in HEAD code
        (results/fullyconn_updatedsexclassifier_*).
    The encoder/decoder port always applies; the classifier port applies
    only for the HEAD variant (recon/anonymize paths never need it).
  * Gender-classifier MLP head ``classifier.ckpt`` (SpeechBrain
    ``Classifier`` — models/external_gender_classifiers.py:118-183; shipped
    at results/gender_classifier/1230/save/CKPT+2022-04-18+01-00-10+00/
    (512-d) and .../trained_external_classifier_ckpt/ (128-d, the one the
    evaluator_inference.yaml stack actually symlinks)).
    ``embedding_model.ckpt`` is a dangling symlink in the reference — the
    x-vector trunk cannot be ported and must be (re)trained here.
  * ``normalizer.ckpt`` — handled by sb_compat.load_normalizer_ckpt.

Conscious deviation (documented, CLAUDE.md): the reference
FullyConnSexClassifier normalizes its input with ``input.reshape(B, C, T)``
(models/FullyConnected.py:93-95) — a *reshape*, not a transpose, which
scrambles the (T, 20) frame block across BatchNorm channels in a
T-dependent way. This port assumes the semantically-intended per-channel
normalization (our flax module normalizes the last axis), so classifier
outputs match a layout-correct torch model, not the scrambled reference
forward.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .port_weights import merge_params, port_state_dict
from .sb_compat import load_state_dict_ckpt

# -- FC-AE anonymizer (models/FullyConnected.py:118-159) -----------------------

FCAE_ENC_DEC_SPEC = {
    "Dense_0": ("linear", "0.encoder.0"),
    "Dense_1": ("linear", "0.encoder.2"),
    "Dense_2": ("linear", "0.encoder.4"),
    "Dense_3": ("linear", "0.decoder.0"),
    "Dense_4": ("linear", "0.decoder.2"),
    "Dense_5": ("linear", "0.decoder.4"),
}

# HEAD FullyConnSexClassifier (models/FullyConnected.py:65-104):
# norm=BN(20) on the bottleneck, initial = Linear(20,40)/ReLU/Linear(40,40),
# stats pooling, classify = Linear(80,40)/BN/ReLU/Linear(40,40)/ReLU/
# Linear(40,20)/BN/Linear(20,2).
FCAE_CLASSIFIER_SPEC = {
    "sex_classifier/BatchNorm_0": ("batchnorm", "0.sex_classifier.norm"),
    "sex_classifier/Dense_0": ("linear", "0.sex_classifier.initial.0"),
    "sex_classifier/Dense_1": ("linear", "0.sex_classifier.initial.2"),
    "sex_classifier/Dense_2": ("linear", "0.sex_classifier.classify.0"),
    "sex_classifier/BatchNorm_1": ("batchnorm", "0.sex_classifier.classify.1"),
    "sex_classifier/Dense_3": ("linear", "0.sex_classifier.classify.3"),
    "sex_classifier/Dense_4": ("linear", "0.sex_classifier.classify.5"),
    "sex_classifier/BatchNorm_2": ("batchnorm", "0.sex_classifier.classify.6"),
    "sex_classifier/Dense_5": ("linear", "0.sex_classifier.classify.7"),
}


def load_reference_fcae(model_ckpt: str):
    """Port a shipped FC-AE ``model.ckpt`` into FullyConnectedAutoencoder.

    Returns ``(model, variables, ported_classifier)``. ``variables`` has the
    ported params merged over a fresh init; ``ported_classifier`` is False
    when the checkpoint's sex-classifier is a non-HEAD variant (its flax
    params stay at init — the recon/anonymize path is unaffected).
    """
    from ..models.autoencoders import FullyConnectedAutoencoder

    sd = load_state_dict_ckpt(model_ckpt)
    model = FullyConnectedAutoencoder()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32)
    )

    spec = dict(FCAE_ENC_DEC_SPEC)
    has_head_classifier = "0.sex_classifier.classify.7.weight" in sd
    if has_head_classifier:
        spec.update(FCAE_CLASSIFIER_SPEC)
    params_patch, stats_patch = port_state_dict(sd, spec, strict=True)
    new_vars = {
        "params": merge_params(dict(variables["params"]), params_patch),
        "batch_stats": merge_params(dict(variables.get("batch_stats", {})), stats_patch),
    }
    return model, new_vars, has_head_classifier


# -- Gender-classifier MLP head (SpeechBrain Classifier) ------------------------

XVECTOR_CLASSIFIER_SPEC = {
    "BatchNorm_0": ("batchnorm", "norm.norm"),
    "Dense_0": ("linear", "DNN.block_0.linear.w"),
    "BatchNorm_1": ("batchnorm", "DNN.block_0.norm.norm"),
    "Dense_1": ("linear", "out.w"),
}


def load_reference_classifier_head(classifier_ckpt: str):
    """Port a shipped ``classifier.ckpt`` into XvectorClassifier.

    Infers ``lin_neurons`` from the checkpoint (512 for the 1230 main run,
    128 for the evaluator_inference stack). Returns ``(model, variables)``.
    """
    from ..models.xvector import XvectorClassifier

    sd = load_state_dict_ckpt(classifier_ckpt)
    lin_neurons = int(sd["DNN.block_0.linear.w.weight"].shape[0])
    emb_dim = int(sd["DNN.block_0.linear.w.weight"].shape[1])
    out_neurons = int(sd["out.w.weight"].shape[0])
    model = XvectorClassifier(
        lin_blocks=1, lin_neurons=lin_neurons, out_neurons=out_neurons
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, emb_dim), jnp.float32)
    )
    params_patch, stats_patch = port_state_dict(sd, XVECTOR_CLASSIFIER_SPEC, strict=True)
    new_vars = {
        "params": merge_params(dict(variables["params"]), params_patch),
        "batch_stats": merge_params(dict(variables.get("batch_stats", {})), stats_patch),
    }
    return model, new_vars


def find_best_ckpt_dir(save_dir: str) -> str:
    """Latest CKPT+* dir under a reference ``save/`` directory."""
    dirs = sorted(d for d in os.listdir(save_dir) if d.startswith("CKPT+"))
    if not dirs:
        raise FileNotFoundError(f"no CKPT+* under {save_dir}")
    return os.path.join(save_dir, dirs[-1])
