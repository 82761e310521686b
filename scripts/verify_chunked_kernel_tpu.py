"""On-chip exactness check for the CHUNKED attention-step kernel (the
long-cache path, U beyond the whole-row VMEM bound):

  timeout 1750 env PYTHONPATH=/root/.axon_site:/root/repo \
      python scripts/verify_chunked_kernel_tpu.py
"""
import jax, jax.numpy as jnp, numpy as np, math
from speech_anonymization_tpu.ops.pallas.attention_step import (
    cached_attention_step, max_u_whole_row,
)

def ref_step(q, kh_new, vh_new, mask, ck, cv, step, layer, nhead):
    n, m = q.shape
    d = m // nhead
    u = ck.shape[2]
    kb = ck[layer].reshape(n, u, nhead, d).astype(jnp.float32)
    vb = cv[layer].reshape(n, u, nhead, d).astype(jnp.float32)
    kb = kb.at[:, step].set(kh_new.reshape(n, nhead, d))
    vb = vb.at[:, step].set(vh_new.reshape(n, nhead, d))
    qh = q.reshape(n, 1, nhead, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kb) / math.sqrt(d)
    pos = jnp.arange(u)[None, None, None, :]
    valid = (pos <= step) & (mask[:, None, None, :] != 0)
    scores = jnp.where(valid, scores, -1e30)
    w = jax.nn.softmax(scores, -1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vb)
    return out.reshape(n, m)

rng = np.random.default_rng(0)
L, N, M, H = 2, 16, 768, 12
U = 448
assert U > max_u_whole_row(M, 2)
for step in (0, 170, 440):
    for layer in (0, 1):
        ck = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
        cv = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        kh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        vh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        mask = jnp.asarray((rng.random((N, U)) > 0.2).astype(np.int8)).at[:, step].set(1)
        got, nck, ncv = cached_attention_step(q, kh, vh, mask, ck, cv, step, layer, H)
        np.testing.assert_array_equal(
            np.asarray(nck[layer, :, step]), np.asarray(kh.astype(jnp.bfloat16)))
        np.testing.assert_array_equal(
            np.asarray(ncv[layer, :, step]), np.asarray(vh.astype(jnp.bfloat16)))
        other = (layer + 1) % L
        np.testing.assert_array_equal(
            np.asarray(nck[other, :, :max(step, 1)]),
            np.asarray(ck[other, :, :max(step, 1)]))
        want = ref_step(q.astype(jnp.bfloat16).astype(jnp.float32),
                        kh.astype(jnp.bfloat16).astype(jnp.float32),
                        vh.astype(jnp.bfloat16).astype(jnp.float32),
                        mask, ck, cv, step, layer, H)
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / float(jnp.max(jnp.abs(want)))
        print(f"step={step} layer={layer}: max abs err {err:.3e} rel {rel:.3e}", flush=True)
        assert rel < 2e-2, "mismatch"
print("CHUNKED KERNEL OK")
