"""Pallas TPU kernel: beam-search KV-cache reorder as a streaming row gather.

Beam search must re-parent every decoder KV cache each step: row ``n`` of
the new cache is row ``src[n]`` of the old one (``src`` comes from the
step's top-k parents and is only known on-device). XLA lowers both the
row-gather and the one-hot-matmul formulations of this to far-below-peak
HBM code on v5e (measured round 2, scripts/profile_reorder.py: gather
~120 GB/s, block-diagonal one-hot einsum ~250 GB/s, Pallas copy pipelines
~310-320 GB/s — the practical mixed read+write ceiling), and at beam 66
the reorder dominates the whole decode step (BENCHMARKS.md round 2).

Since the copy itself runs at the memory ceiling, the remaining lever is
moving FEWER bytes: at decode step ``t`` only positions ``<= t`` of the
cache are live (readers mask by step; position ``t+1`` is overwritten by
the next step's write before it is ever read). The DMA kernel therefore
takes ``step`` as a scalar-prefetch operand and copies only
``ceil((step+1)/CU)`` position-chunks per row — a dynamic trip count on
the scalar core, which a blocked pallas_call pipeline cannot express.
Averaged over a 64-step decode that is ~45% of the full-cache traffic.

Mechanics: the scalar core issues one strided HBM->HBM DMA per
(row, position-chunk) — the cache never bounces through VMEM — kept
``_DEPTH`` deep in flight to hide descriptor issue latency. Every row has
the SAME chunk count at a given step, so slot reuse is uniform: copy
``i`` waits copy ``i - _DEPTH`` (same semaphore slot, same byte count).

``_gather_rows_vmem`` is a conventional scalar-prefetch copy pipeline
(HBM->VMEM->HBM, Mosaic double-buffers); used in interpret mode, where
make_async_copy on HBM refs isn't simulated.

Replaces the reorder step of the reference's S2STransformerBeamSearch
(SpeechBrain `permute_mem`, convae.yaml:226-240 decode config), which on
torch/GPU is a simple ``index_select``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEPTH = 16  # in-flight DMAs; bounds semaphore scratch, hides issue latency
# positions per chunk. 24-position chunks (bigger contiguous fragments
# for the random-row access) were tried and measured SLOWER end-to-end:
# the up-to-cu-1 positions copied past `step` cost more than the larger
# fragments saved (4.7 vs 4.0 ms/step at the bench shape).
_CU = 8


def _chunk(u: int) -> int:
    return _CU


def _dma_kernel(src_ref, step_ref, in_ref, out_ref, sems, *, cu):
    n = pl.program_id(0)
    num_rows = pl.num_programs(0)
    nc = (step_ref[0] + cu) // cu  # chunks covering positions <= step

    def copy(idx):
        row = idx // nc
        c = idx % nc
        return pltpu.make_async_copy(
            in_ref.at[:, src_ref[row], pl.ds(c * cu, cu)],
            out_ref.at[:, row, pl.ds(c * cu, cu)],
            sems.at[idx % _DEPTH],
        )

    def body(c, _):
        idx = n * nc + c

        @pl.when(idx >= _DEPTH)
        def _():
            copy(idx - _DEPTH).wait()

        copy(idx).start()
        return 0

    jax.lax.fori_loop(0, nc, body, 0)

    # drain the tail so every write lands before the kernel returns
    @pl.when(n == num_rows - 1)
    def _():
        total = num_rows * nc

        def drain(i, _):
            copy(i).wait()
            return 0

        jax.lax.fori_loop(jnp.maximum(total - _DEPTH, 0), total, drain, 0)


@jax.jit
def _gather_rows_dma(a, src, step):
    l, n, u, m = a.shape
    return pl.pallas_call(
        functools.partial(_dma_kernel, cu=_chunk(u)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_DEPTH,))],
        ),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * a.size * a.dtype.itemsize,
            transcendentals=0,
        ),
    )(src, step, a)


def _copy_kernel(src_ref, step_ref, in_ref, out_ref):
    del src_ref, step_ref  # consumed by the index_map / unused
    out_ref[...] = in_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_rows_vmem(a, src, step, interpret=False):
    l, n, u, m = a.shape
    # keep in+out double buffers within ~12 MB of VMEM
    lc = l
    while 4 * lc * u * m * a.dtype.itemsize > 12 * 2**20 and lc % 2 == 0:
        lc //= 2
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, l // lc),
            in_specs=[
                pl.BlockSpec((lc, 1, u, m), lambda i, j, src, step: (j, src[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((lc, 1, u, m), lambda i, j, src, step: (j, i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * a.size * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(src, step, a)


def beam_gather_rows(
    a: jax.Array,
    src: jax.Array,
    step: jax.Array | int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``a[:, src]`` for a stacked KV cache, as streaming HBM->HBM DMAs.

    a: (L, N, U, M) cache (all L layers, N beam rows); src: (N,) int32
    source-row ids (duplicates allowed — beams sharing a parent); step:
    current decode step — only positions ``<= step`` are copied (the rest
    of the output is UNDEFINED and must be masked or overwritten by the
    caller, which beam-search decode steps already guarantee). ``None``
    copies every position. Exact for any dtype (pure copy). U must be a
    multiple of 8 (make_kv_cache pads). Falls back to ``jnp.take``
    off-TPU.
    """
    if a.ndim != 4:
        raise ValueError(f"expected (L, N, U, M) cache, got {a.shape}")
    if a.shape[2] % _CU:
        raise ValueError(f"U={a.shape[2]} must be a multiple of {_CU}")
    if step is None:
        step = a.shape[2] - 1
    step = jnp.asarray(step, jnp.int32).reshape((1,))
    src = src.astype(jnp.int32)
    if interpret:
        return _gather_rows_vmem(a, src, step, interpret=True)
    if jax.default_backend() != "tpu":
        return jnp.take(a, src, axis=1)
    return _gather_rows_dma(a, src, step)
