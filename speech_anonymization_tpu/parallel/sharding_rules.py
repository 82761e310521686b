"""Parameter-sharding rules: optional tensor parallelism for the ASR.

The reference's only parallelism is DDP (SURVEY.md §2.6); its 768-d ASR
fits one chip, so TP is OPTIONAL here — but the framework exposes it so the
transformer can scale over a ('data', 'model') mesh: attention heads and
FFN hidden dims shard over 'model' (Megatron-style column->row pairing),
everything else replicates. XLA inserts the activation all-reduces.

Usage:
    mesh = make_mesh(shape=(dp, tp), axis_names=('data', 'model'))
    params = shard_asr_params(params, mesh)   # device_put with rules
    batch sharded over 'data' as usual; jit propagates shardings.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    ndim = getattr(leaf, "ndim", 0)
    # attention projections: q/k/v kernels (d_model, H, d_head) split heads;
    # out kernel (H, d_head, d_model) is the row-parallel partner
    wrapped = f"/{joined}/"
    # FFN modules appear as 'FeedForward_0' (compact encoder layers) or
    # 'ff' (setup-named decoder layers)
    is_ffn = "FeedForward" in joined or "/ff/" in wrapped
    if joined.endswith("kernel"):
        if any(f"/{a}/" in wrapped for a in ("q", "k", "v")) and ndim == 3:
            return P(None, "model", None)
        if "/out/" in wrapped and ndim == 3:
            return P("model", None, None)
        # FFN: first Dense column-parallel, second row-parallel
        if is_ffn and "Dense_0" in joined and ndim == 2:
            return P(None, "model")
        if is_ffn and "Dense_1" in joined and ndim == 2:
            return P("model", None)
    if joined.endswith("bias") and is_ffn and "Dense_0" in joined:
        return P("model")
    return P()  # replicate


def asr_param_specs(params) -> dict:
    """Pytree of PartitionSpecs matching ``params``."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_asr_params(params, mesh: Mesh):
    """device_put the param tree with the TP rules over ``mesh``."""
    specs = asr_param_specs(params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
