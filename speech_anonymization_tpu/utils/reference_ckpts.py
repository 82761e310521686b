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


# -- SpeechBrain TransformerASR / TransformerLM (HF asr.ckpt / lm.ckpt) ---------
#
# The reference's Pretrainer fetches these from HuggingFace
# (convae.yaml:306-317); they are NOT shipped in the repo, but the state-dict
# LAYOUT is fixed by SpeechBrain 0.5's module structure
# (transformer.yaml:128-173 pins the architecture: ConvolutionFrontEnd
# 3x1-layer blocks + TransformerASR 768d/8h/12enc/6dec/ffn3072/GELU/
# normalize_before False + seq_lin/ctc_lin, saved as
# torch.nn.ModuleList([CNN, Transformer, seq_lin, ctc_lin]) -> key prefixes
# "0."-"3." — transformer.yaml:186-187; the LM is a bare TransformerLM ->
# no prefix). The specs below are validated against freshly-initialized
# torch replicas in SB key layout with <=1e-4 forward parity
# (tests/test_reference_asr_port.py), so the day someone supplies the real
# HF ckpts they load without guesswork. Target flax modules run in
# ``sb_compat`` mode (final enc/dec norms, exact GELU, SB conv padding,
# SB LM output head — models/transformer.py).


def _first_key(sd, *names):
    for n in names:
        if n in sd:
            return n
    raise KeyError(f"none of {names} in checkpoint (keys like {list(sd)[:4]}...)")


def _port_mha(params, flax_path, sd, prefix, nhead):
    """torch nn.MultiheadAttention (packed in_proj) -> q/k/v/out DenseGeneral.

    SB's MultiheadAttention wraps torch's as ``.att``; in_proj_weight is
    (3D, D) stacked [q; k; v]. flax q/k/v kernels are (D, H, Dh), biases
    (H, Dh); out kernel (H, Dh, D).
    """
    import numpy as np

    w = _np2(sd[prefix + ".att.in_proj_weight"])
    bias = _np2(sd[prefix + ".att.in_proj_bias"])
    d = w.shape[1]
    dh = d // nhead
    for i, name in enumerate(("q", "k", "v")):
        _set(params, f"{flax_path}/{name}/kernel",
             w[i * d:(i + 1) * d].T.reshape(d, nhead, dh))
        _set(params, f"{flax_path}/{name}/bias",
             bias[i * d:(i + 1) * d].reshape(nhead, dh))
    wo = _np2(sd[prefix + ".att.out_proj.weight"])
    _set(params, f"{flax_path}/out/kernel", wo.T.reshape(nhead, dh, d))
    _set(params, f"{flax_path}/out/bias", _np2(sd[prefix + ".att.out_proj.bias"]))


def _np2(t):
    import numpy as np

    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree, path, value):
    node = tree
    keys = path.split("/")
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _port_linear(params, flax_path, sd, prefix):
    _set(params, f"{flax_path}/kernel", _np2(sd[prefix + ".weight"]).T)
    if prefix + ".bias" in sd:
        _set(params, f"{flax_path}/bias", _np2(sd[prefix + ".bias"]))


def _port_layernorm(params, flax_path, sd, prefix):
    _set(params, f"{flax_path}/scale", _np2(sd[prefix + ".weight"]))
    _set(params, f"{flax_path}/bias", _np2(sd[prefix + ".bias"]))


def _port_encoder_stack(params, sd, tprefix, flax_prefix, layer_name, n_layers, nhead):
    """Shared encoder-layer porting (ASR encoder and LM use one layout)."""
    for i in range(n_layers):
        lt = f"{tprefix}.layers.{i}"
        lf = f"{flax_prefix}{layer_name}{i}"
        _port_mha(params, f"{lf}/attn", sd, f"{lt}.self_att", nhead)
        _port_linear(params, f"{lf}/FeedForward_0/Dense_0", sd, f"{lt}.pos_ffn.ffn.0")
        _port_linear(params, f"{lf}/FeedForward_0/Dense_1", sd, f"{lt}.pos_ffn.ffn.3")
        _port_layernorm(params, f"{lf}/LayerNorm_0", sd, f"{lt}.norm1.norm")
        _port_layernorm(params, f"{lf}/LayerNorm_1", sd, f"{lt}.norm2.norm")


def port_sb_asr_state_dict(sd, nhead=8, num_encoder_layers=12,
                           num_decoder_layers=6) -> dict:
    """HF ``asr.ckpt`` state dict -> ASRModel(sb_compat=True) params patch."""
    from .port_weights import conv2d_from_torch

    p: dict = {}
    # CNN = ModuleList slot 0: 3 ConvBlocks, 1 layer each
    for b in range(3):
        t = f"0.convblock_{b}.convs"
        conv = conv2d_from_torch(
            sd[f"{t}.conv_0.conv.weight"], sd.get(f"{t}.conv_0.conv.bias")
        )
        for k, v in conv.items():
            _set(p, f"cnn/conv_{b}/{k}", v)
        _port_layernorm(p, f"cnn/norm_{b}", sd, f"{t}.norm_0.norm")
    # Transformer = slot 1
    _port_linear(p, "transformer/input_proj", sd, "1.custom_src_module.layers.0.w")
    emb_key = _first_key(
        sd, "1.custom_tgt_module.layers.0.emb.Embedding.weight",
        "1.custom_tgt_module.layers.0.emb.weight",
    )
    _set(p, "transformer/embed/embedding", _np2(sd[emb_key]))
    _port_encoder_stack(p, sd, "1.encoder", "transformer/", "enc_", num_encoder_layers, nhead)
    _port_layernorm(p, "transformer/enc_norm", sd, "1.encoder.norm.norm")
    for i in range(num_decoder_layers):
        lt = f"1.decoder.layers.{i}"
        lf = f"transformer/dec_{i}"
        _port_mha(p, f"{lf}/self_attn", sd, f"{lt}.self_attn", nhead)
        # SB 0.5 spells the decoder cross-attention "mutihead_attn"
        # (Transformer.py's TransformerDecoderLayer); accept the corrected
        # spelling too in case of a patched checkpoint
        cross = (f"{lt}.mutihead_attn" if f"{lt}.mutihead_attn.att.in_proj_weight" in sd
                 else f"{lt}.multihead_attn")
        _port_mha(p, f"{lf}/cross_attn", sd, cross, nhead)
        _port_linear(p, f"{lf}/ff/Dense_0", sd, f"{lt}.pos_ffn.ffn.0")
        _port_linear(p, f"{lf}/ff/Dense_1", sd, f"{lt}.pos_ffn.ffn.3")
        _port_layernorm(p, f"{lf}/ln1", sd, f"{lt}.norm1.norm")
        _port_layernorm(p, f"{lf}/ln2", sd, f"{lt}.norm2.norm")
        _port_layernorm(p, f"{lf}/ln3", sd, f"{lt}.norm3.norm")
    _port_layernorm(p, "transformer/dec_norm", sd, "1.decoder.norm.norm")
    # seq_lin = slot 2, ctc_lin = slot 3 (transformer.yaml:186-187 order)
    _port_linear(p, "heads/seq_lin", sd, "2.w")
    _port_linear(p, "heads/ctc_lin", sd, "3.w")
    return p


def port_sb_lm_state_dict(sd, nhead=12, num_layers=12) -> dict:
    """HF ``lm.ckpt`` state dict -> TransformerLM(sb_compat=True) params."""
    p: dict = {}
    emb_key = _first_key(
        sd, "custom_src_module.emb.Embedding.weight", "custom_src_module.emb.weight"
    )
    _set(p, "embed/embedding", _np2(sd[emb_key]))
    _port_encoder_stack(p, sd, "encoder", "", "layer_", num_layers, nhead)
    _port_layernorm(p, "norm", sd, "encoder.norm.norm")
    _port_linear(p, "out_a", sd, "output_proj.layers.0.w")
    _port_layernorm(p, "out_ln", sd, "output_proj.layers.1.norm")
    _port_linear(p, "out_b", sd, "output_proj.layers.2.w")
    return p


def load_reference_asr(asr_ckpt: str, d_model=768, nhead=8,
                       num_encoder_layers=12, num_decoder_layers=6,
                       d_ffn=3072, output_neurons=5000):
    """Port an HF ``asr.ckpt`` (speechbrain/asr-transformer-transformerlm-
    librispeech layout) into ASRModel(sb_compat=True).

    Returns (model, variables). Forward parity vs a torch replica of the
    SB layout is proven in tests/test_reference_asr_port.py.
    """
    from ..models.asr import ASRModel

    sd = load_state_dict_ckpt(asr_ckpt)
    model = ASRModel(
        d_model=d_model, nhead=nhead, num_encoder_layers=num_encoder_layers,
        num_decoder_layers=num_decoder_layers, d_ffn=d_ffn,
        output_neurons=output_neurons, sb_compat=True,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1,), jnp.float32),
    )
    patch = port_sb_asr_state_dict(
        sd, nhead=nhead, num_encoder_layers=num_encoder_layers,
        num_decoder_layers=num_decoder_layers,
    )
    return model, {"params": merge_params(dict(variables["params"]), patch)}


def load_reference_lm(lm_ckpt: str, d_model=768, nhead=12, num_layers=12,
                      d_ffn=3072, vocab=5000):
    """Port an HF ``lm.ckpt`` into TransformerLM(sb_compat=True)."""
    from ..models.transformer import TransformerLM

    sd = load_state_dict_ckpt(lm_ckpt)
    model = TransformerLM(
        vocab=vocab, d_model=d_model, nhead=nhead, num_layers=num_layers,
        d_ffn=d_ffn, sb_compat=True,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3), jnp.int32))
    patch = port_sb_lm_state_dict(sd, nhead=nhead, num_layers=num_layers)
    return model, {"params": merge_params(dict(variables["params"]), patch)}
