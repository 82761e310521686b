"""Sanity-check timing methodology under the axon tunnel backend."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.models.transformer import TransformerLM, make_kv_cache

N, U, STEPS, V = 528, 65, 64, 5000
lm = TransformerLM(vocab=V)
params = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
tok0 = jnp.ones((N,), jnp.int32)


def run(params, tok0):
    cache0 = make_kv_cache(N, U, lm.num_layers, lm.nhead, lm.d_model // lm.nhead)

    def step(carry, i):
        cache, tok = carry
        logits, cache = lm.apply(params, tok, cache, i, method=TransformerLM.decode_step)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return (cache, tok), logits[:, 0]

    (_, tok), traj = jax.lax.scan(step, (cache0, tok0), jnp.arange(STEPS))
    return tok, traj


f = jax.jit(run)
out = f(params, tok0)
jax.block_until_ready(out)

# method A: block_until_ready
t0 = time.perf_counter()
out = f(params, tok0)
jax.block_until_ready(out)
tA = time.perf_counter() - t0

# method B: full host transfer
t0 = time.perf_counter()
out = f(params, tok0)
a = np.asarray(out[1])
tB = time.perf_counter() - t0

print(f"block_until_ready: {tA*1e3:.1f} ms   np.asarray: {tB*1e3:.1f} ms")
print("traj sample:", a[:2, :3])
