"""On-chip exactness check for the fused attention-step kernel (run on the
real TPU; the CPU suite covers interpret mode):

  timeout 1750 env PYTHONPATH=/root/.axon_site:/root/repo python scripts/verify_attention_kernel_tpu.py
"""
import jax, jax.numpy as jnp, numpy as np, math
from speech_anonymization_tpu.ops.pallas.attention_step import cached_attention_step

def ref_step(q, kh_new, vh_new, mask, ck, cv, step, layer, nhead):
    # pure-jnp reference mirroring MultiHeadAttention.step semantics
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
L, N, U, M, H = 3, 64, 24, 768, 12
for step in (0, 5, 22, 23):
    for layer in (0, 2):
        ck = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
        cv = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        kh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        vh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        mask = jnp.asarray((rng.random((N, U)) > 0.2).astype(np.int8)).at[:, step].set(1)
        got, nck, ncv = cached_attention_step(q, kh, vh, mask, ck, cv, step, layer, H)
        # writeback check: position `step` of `layer` holds the fresh kh/vh
        np.testing.assert_array_equal(
            np.asarray(nck[layer, :, step]), np.asarray(kh.astype(jnp.bfloat16)))
        np.testing.assert_array_equal(
            np.asarray(ncv[layer, :, step]), np.asarray(vh.astype(jnp.bfloat16)))
        # untouched layer stays identical at positions < step
        other = (layer + 1) % ck.shape[0]
        np.testing.assert_array_equal(
            np.asarray(nck[other, :, :max(step,1)]), np.asarray(ck[other, :, :max(step,1)]))
        want = ref_step(q.astype(jnp.bfloat16).astype(jnp.float32),
                        kh.astype(jnp.bfloat16).astype(jnp.float32),
                        vh.astype(jnp.bfloat16).astype(jnp.float32),
                        mask, ck, cv, step, layer, H)
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / float(jnp.max(jnp.abs(want)))
        print(f"step={step} layer={layer}: max abs err {err:.3e} rel {rel:.3e}")
        assert rel < 2e-2, "mismatch"
print("KERNEL OK")
