"""Device mesh + sharding helpers — the distributed backend.

Replaces the reference's torch.distributed/NCCL DDP layer
(``ddp_init_group`` at speechbrain_convae_train.py:524,
``run_on_main``/``if_main_process`` host gating at
speechbrain_convae_train.py:314,534 — SURVEY.md §2.6).

TPU-native equivalent: single-program multi-data JAX. One 1-D ``Mesh`` over
all chips; batches sharded with ``NamedSharding(P('data'))``; parameters
replicated; the gradient all-reduce is inserted by XLA when the jitted loss
averages over the sharded batch axis — riding ICI within a slice and DCN
across slices with identical code. No hand-written collectives.

Scaling beyond data parallelism (not needed for parity — the models are
tiny, SURVEY.md §2.6): the mesh helpers accept extra named axes so the ASR
transformer can shard its 768-d matmuls over a 'model' axis if ever wanted.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data",),
    shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh. Default: 1-D 'data' mesh over all devices.

    ``shape`` allows e.g. ('data', 'model') meshes; product must equal the
    device count.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every array leaf of a batch pytree with its batch dim sharded.

    Per-host input pipelines replace the reference's DistributedSampler
    (SURVEY.md §5 'distributed backend').
    """
    sharding = data_sharding(mesh, axis)

    def _place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(_place, batch)


def is_main_process() -> bool:
    """Replaces sb.utils.distributed.if_main_process
    (speechbrain_convae_train.py:314)."""
    return jax.process_index() == 0


def run_on_main(fn: Callable, *args, **kwargs):
    """Run a host-side side effect on process 0 only, then barrier.

    Replaces sb.utils.distributed.run_on_main (gender_classifier_train.py:321).
    """
    result = None
    if is_main_process():
        result = fn(*args, **kwargs)
    if jax.process_count() > 1:
        # cheap collective barrier so other hosts wait for rank-0 prep
        x = jax.numpy.zeros(())
        jax.block_until_ready(
            jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
                jax.numpy.zeros((jax.local_device_count(),))
            )
        )
        del x
    return result
