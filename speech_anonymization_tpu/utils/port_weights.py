"""torch -> JAX weight porting.

The reference's evaluation stack loads pretrained torch checkpoints
(asr.ckpt / lm.ckpt / normalizer.ckpt via Pretrainer, convae.yaml:306-317;
x-vector evaluator ckpts via evaluator_inference.yaml:63-71). To reuse such
checkpoints here, torch tensors must be re-laid-out for flax modules
(channels-last convs, transposed dense kernels). This module provides:

  * layout converters for Linear / Conv1d / Conv2d / ConvTranspose1d /
    BatchNorm / Embedding / InstanceNorm tensors;
  * ``port_state_dict``: drives a {flax_param_path: (torch_key, kind)}
    mapping spec over a loaded ``state_dict`` (a plain dict of numpy/torch
    tensors — torch.load(...) output), producing a params pytree patch.

Layout rules:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out)
  torch Conv1d  weight (out, in, k)    -> flax Conv kernel (k, in, out)
  torch Conv2d  weight (out, in, kh, kw) -> (kh, kw, in, out)
  torch ConvTranspose1d (in, out, k)   -> flax ConvTranspose (k, in, out)
                                          with a kernel FLIP (lax.conv_transpose
                                          correlates, torch convolves)
  BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats

Vocabulary interop: ported ASR/LM checkpoints have output layers tied to
the ORIGINAL sentencepiece vocabulary — decoding them with a retrained
UnigramTokenizer vocab produces mismatched token ids. Load the matching
``tokenizer.ckpt``/``.model`` file via
``UnigramTokenizer.load_sentencepiece`` (data/tokenizer.py), which adopts
the sentencepiece id space verbatim.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def linear_from_torch(weight, bias=None) -> dict:
    out = {"kernel": _np(weight).T}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def conv1d_from_torch(weight, bias=None) -> dict:
    out = {"kernel": np.transpose(_np(weight), (2, 1, 0))}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def conv2d_from_torch(weight, bias=None) -> dict:
    out = {"kernel": np.transpose(_np(weight), (2, 3, 1, 0))}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def conv_transpose1d_from_torch(weight, bias=None) -> dict:
    # torch: (in, out, k), convolution semantics; flax ConvTranspose:
    # (k, in, out) correlation -> flip the spatial axis
    w = np.transpose(_np(weight), (2, 0, 1))[::-1].copy()
    out = {"kernel": w}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def batchnorm_from_torch(weight, bias, running_mean, running_var) -> tuple[dict, dict]:
    """-> (params {scale, bias}, batch_stats {mean, var})."""
    return (
        {"scale": _np(weight), "bias": _np(bias)},
        {"mean": _np(running_mean), "var": _np(running_var)},
    )


def instancenorm_from_torch(weight, bias) -> dict:
    return {"scale": _np(weight), "bias": _np(bias)}


def embedding_from_torch(weight) -> dict:
    return {"embedding": _np(weight)}


_KIND_FNS = {
    "linear": linear_from_torch,
    "conv1d": conv1d_from_torch,
    "conv2d": conv2d_from_torch,
    "conv_transpose1d": conv_transpose1d_from_torch,
    "instancenorm": instancenorm_from_torch,
    "embedding": embedding_from_torch,
}


def _set_path(tree: dict, path: str, value: Any):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def port_state_dict(
    state_dict: Mapping[str, Any], spec: Mapping[str, tuple], strict: bool = True
) -> tuple[dict, dict]:
    """Apply a mapping spec. Returns (params_patch, batch_stats_patch).

    spec entries: flax_path -> ("kind", torch_key_prefix). For
    kind='batchnorm' the torch prefix must expose .weight/.bias/
    .running_mean/.running_var; other kinds .weight/.bias.
    """
    params: dict = {}
    stats: dict = {}
    for flax_path, (kind, prefix) in spec.items():
        try:
            if kind == "batchnorm":
                p, s = batchnorm_from_torch(
                    state_dict[prefix + ".weight"],
                    state_dict[prefix + ".bias"],
                    state_dict[prefix + ".running_mean"],
                    state_dict[prefix + ".running_var"],
                )
                for k, v in p.items():
                    _set_path(params, f"{flax_path}/{k}", v)
                for k, v in s.items():
                    _set_path(stats, f"{flax_path}/{k}", v)
            else:
                fn = _KIND_FNS[kind]
                weight = state_dict[prefix + ".weight"]
                bias = state_dict.get(prefix + ".bias")
                if kind == "embedding":
                    converted = fn(weight)
                else:
                    converted = fn(weight, bias)
                for k, v in converted.items():
                    _set_path(params, f"{flax_path}/{k}", v)
        except KeyError:
            if strict:
                raise
    return params, stats


def merge_params(base: dict, patch: dict) -> dict:
    """Deep-merge a patch into a params pytree (returns a new dict)."""
    out = dict(base)
    for k, v in patch.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
