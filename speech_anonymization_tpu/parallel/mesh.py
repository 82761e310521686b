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

Multi-HOST: each host process calls :func:`initialize_distributed` once at
startup (the ``jax.distributed.initialize()`` equivalent of the reference's
``ddp_init_group``); after that ``jax.devices()`` spans every host's chips,
:func:`make_mesh` builds a global mesh, :func:`shard_batch` assembles the
global batch from per-host input-pipeline shards, and
:func:`global_barrier` synchronizes all processes via an all-device psum.

Validation boundary: the multi-PROCESS code paths here are validated by
inspection and single-process unit tests only (barrier device span,
shard_batch assembly on a virtual 8-device mesh). No test in this repo
runs more than one JAX process — the build environment allows a single
JAX process at a time — so e.g. a ``process_index`` shard-ordering bug in
:func:`shard_batch` would not be caught by the suite. Run a 2-process CPU
smoke test before relying on multi-host training in a new environment.

Scaling beyond data parallelism (not needed for parity — the models are
tiny, SURVEY.md §2.6): the mesh helpers accept extra named axes so the ASR
transformer can shard its 768-d matmuls over a 'model' axis if ever wanted.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_distributed_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host entry point — call once per host BEFORE any other JAX API
    touches devices. Replaces the reference's ``ddp_init_group(run_opts)``
    (speechbrain_convae_train.py:524); where torch needed MASTER_ADDR /
    RANK / WORLD_SIZE, JAX needs a coordinator plus process id/count.

    Configuration, in precedence order:

    1. explicit arguments;
    2. ``SATPU_COORDINATOR`` / ``SATPU_NUM_PROCESSES`` / ``SATPU_PROCESS_ID``
       environment variables (the recipe CLIs pick these up without flags);
    3. nothing — on Cloud TPU pods ``jax.distributed.initialize()`` can
       auto-detect everything from the TPU runtime, but we only call it when
       the env announces a multi-process run (``SATPU_MULTIHOST=1``), so
       single-host runs (the common case here) never pay the handshake.

    Returns True when ``jax.distributed.initialize`` was called.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get("SATPU_COORDINATOR")
    env_np = os.environ.get("SATPU_NUM_PROCESSES")
    env_pid = os.environ.get("SATPU_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    auto = os.environ.get("SATPU_MULTIHOST") == "1"
    if coordinator_address is None and num_processes is None and not auto:
        return False  # single host: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = True
    return True


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data",),
    shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh. Default: 1-D 'data' mesh over all devices —
    after :func:`initialize_distributed` that means all devices of ALL
    hosts (``jax.devices()`` is global in multi-controller JAX).

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
    (SURVEY.md §5 'distributed backend'): single-host, the whole batch is
    local and ``device_put`` scatters it across the mesh; multi-host, each
    process holds only ITS pipeline's slice of the global batch and the
    leaves are assembled into global arrays with
    ``jax.make_array_from_process_local_data`` (global batch size = sum of
    per-host batch sizes; hosts must supply equal-shaped shards in process
    order, which the bucketed loader guarantees by construction).
    """
    sharding = data_sharding(mesh, axis)
    multiprocess = jax.process_count() > 1

    def _place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            if multiprocess:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)
                )
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(_place, batch)


def is_main_process() -> bool:
    """Replaces sb.utils.distributed.if_main_process
    (speechbrain_convae_train.py:314)."""
    return jax.process_index() == 0


def _barrier_mesh() -> Mesh:
    """1-D mesh over ALL devices of ALL processes (not just local ones) —
    exposed separately so tests can assert the barrier's collective really
    spans ``jax.device_count()``."""
    return Mesh(np.asarray(jax.devices()), ("all",))


def global_barrier() -> None:
    """True cross-process barrier: an all-reduce over every device in the
    job. The jitted sum of a P('all')-sharded array to a replicated scalar
    forces XLA to insert a psum spanning all chips — local AND remote — so
    no process can pass until every process has dispatched it. (A local
    ``pmap`` psum would only synchronize this host's devices.)

    Completion is forced by a host transfer, not ``block_until_ready``
    (unreliable under the axon tunnel — BENCHMARKS.md round 2).
    """
    mesh = _barrier_mesh()
    sharding = NamedSharding(mesh, P("all"))
    n_local = jax.local_device_count()
    local = np.zeros((n_local,), np.float32)
    if jax.process_count() > 1:
        arr = jax.make_array_from_process_local_data(sharding, local)
    else:
        arr = jax.device_put(np.zeros((mesh.devices.size,), np.float32), sharding)
    out = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(arr)
    np.asarray(out)


def run_on_main(fn: Callable, *args, **kwargs):
    """Run a host-side side effect on process 0 only, then barrier so other
    processes cannot race past rank-0 prep (data download, manifest
    generation, checkpoint averaging).

    Replaces sb.utils.distributed.run_on_main (gender_classifier_train.py:321).
    """
    result = None
    if is_main_process():
        result = fn(*args, **kwargs)
    if jax.process_count() > 1:
        global_barrier()
    return result
