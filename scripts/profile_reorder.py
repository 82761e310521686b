"""Microbench beam-reorder strategies for the decode KV caches.

The round-1 design gathered 24 per-layer (N, U, H, D) buffers each step —
measured 82 ms/step at the bench shape. Candidates to fix it:
  A. per-layer gathers (current)           — 24 gathers, 200 KB rows
  B. one stacked (N, L2, U, H, D) gather   — 1 gather, 4.8 MB rows
  B' stacked L-leading gather              — 1 gather, 200 KB rows
  C. one-hot matmul permute (bf16)         — MXU instead of DMA
  D. B with bf16 cache                     — half the traffic

  timeout 1750 env PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_reorder.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N, L2, U, H, D = 528, 24, 72, 12, 64  # U padded to _CU like make_kv_cache
STEPS = 64


def timeit(fn, *args, reps=3):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


base = jax.random.normal(jax.random.PRNGKey(0), (N, L2, U, H, D), jnp.float32)
gb = N * L2 * U * H * D * 4 / 1e9
print(f"cache size: {gb:.2f} GB (f32)")


def scan_over(fn, x):
    def step(c, i):
        perm = (jnp.arange(N) + i + 1) % N
        return fn(c, perm), ()

    return jax.lax.scan(step, x, jnp.arange(STEPS))[0]


@jax.jit
def per_layer(x):
    xs = [x[:, i] for i in range(L2)]
    out = scan_over(lambda c, p: [a[p] for a in c], xs)
    return out[0][0, 0, 0, :4]


@jax.jit
def stacked_nlead(x):
    return scan_over(lambda c, p: c[p], x)[0, 0, 0, 0, :4]


@jax.jit
def stacked_llead(x):
    return scan_over(lambda c, p: c[:, p], jnp.swapaxes(x, 0, 1))[0, 0, 0, 0, :4]


@jax.jit
def onehot_bf16(x):
    xb = x.astype(jnp.bfloat16).reshape(N, -1)

    def fn(c, p):
        oh = jax.nn.one_hot(p, N, dtype=jnp.bfloat16)
        return oh @ c

    return scan_over(fn, xb)[0, :4]


@jax.jit
def stacked_nlead_bf16(x):
    return scan_over(lambda c, p: c[p], x.astype(jnp.bfloat16))[0, 0, 0, 0, :4]


def _pallas(kind, dtype, gated=False):
    from speech_anonymization_tpu.ops.pallas import beam_gather as bg

    @jax.jit
    def run(x):
        xb = jnp.swapaxes(x, 0, 1).astype(dtype).reshape(L2, N, U, H * D)

        def step(c, i):
            perm = ((jnp.arange(N) + i + 1) % N).astype(jnp.int32)
            s = jnp.full((1,), i if gated else U - 1, jnp.int32)
            if kind == "dma":
                return bg._gather_rows_dma(c, perm, s), ()
            return bg._gather_rows_vmem(c, perm, s), ()

        return jax.lax.scan(step, xb, jnp.arange(STEPS))[0][0, 0, 0, :4]

    return run


for label, fn, mult in [
    ("C one-hot bf16 matmul    ", onehot_bf16, 0.5),
    ("E pallas VMEM copy bf16  ", _pallas("vmem", jnp.bfloat16), 0.5),
    ("F pallas HBM DMA bf16    ", _pallas("dma", jnp.bfloat16), 0.5),
    ("F' pallas HBM DMA f32    ", _pallas("dma", jnp.float32), 1.0),
    ("G gated DMA bf16 (step=i)", _pallas("dma", jnp.bfloat16, True), 0.5),
    ("G' gated DMA f32 (step=i)", _pallas("dma", jnp.float32, True), 1.0),
]:
    t = timeit(fn, base)
    eff = 2 * gb * mult / (t / STEPS)
    print(f"{label}: {t/STEPS*1e3:7.2f} ms/step  ({eff:6.0f} GB/s r+w eff)", flush=True)
