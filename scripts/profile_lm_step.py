"""Profile the LM single-token decode step on the TPU (round-2 decode work).

Ablates the NEW stacked-cache decode step at the bench shape
(B=8, beam 66 -> N=528 rows, U=65, 64 steps).

NOTE: under the axon tunnel backend, jax.block_until_ready does NOT block —
every timing forces a host transfer of a small slice via np.asarray.

  timeout 1750 env PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_lm_step.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.models.transformer import (
    TransformerLM,
    beam_reorder_cache,
    make_kv_cache,
)

B, K = 8, 66
N = B * K
U = 65
STEPS = 64
V = 5000

lm = TransformerLM(vocab=V)
params = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
print(f"devices: {jax.devices()}")
tok0 = jnp.ones((N,), jnp.int32)


def timeit(fn, *args, reps=3):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def scan_decode(reorder: bool, dtype):
    def run(params, tok0):
        cache0 = make_kv_cache(N, U, lm.num_layers, lm.nhead,
                               lm.d_model // lm.nhead, dtype=dtype)

        def step(carry, i):
            cache, tok = carry
            logits, cache = lm.apply(params, tok, cache, i,
                                     method=TransformerLM.decode_step)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            if reorder:
                parent = ((jnp.arange(K)[None, :] + i) % K) * jnp.ones((B, 1), jnp.int32)
                cache = beam_reorder_cache(cache, parent.astype(jnp.int32))
            return (cache, tok), ()

        (_, tok), _ = jax.lax.scan(step, (cache0, tok0), jnp.arange(STEPS))
        return tok

    return jax.jit(run)


for label, reorder, dtype in [
    ("bf16, no reorder", False, jnp.bfloat16),
    ("bf16, + one-hot reorder", True, jnp.bfloat16),
    ("f32,  no reorder", False, jnp.float32),
    ("f32,  + one-hot reorder", True, jnp.float32),
]:
    f = scan_decode(reorder, dtype)
    t = timeit(f, params, tok0)
    print(f"{label:26s}: {t*1e3:8.1f} ms total  {t/STEPS*1e3:6.2f} ms/step", flush=True)
