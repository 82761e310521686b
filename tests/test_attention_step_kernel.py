"""Fused cached-attention kernel (ops/pallas/attention_step.py) vs the
pure-jnp reference math, in interpret mode (the Mosaic compile and the
on-chip exactness run in scripts — see BENCHMARKS.md round 2)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.ops.pallas.attention_step import cached_attention_step


def _ref(q, kh_new, vh_new, mask, ck, cv, step, layer, nhead):
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
    return jnp.einsum("bhqk,bkhd->bqhd", w, vb).reshape(n, m)


def test_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    L, N, U, M, H = 3, 16, 16, 256, 4
    for step, layer in [(0, 0), (7, 1), (15, 2)]:
        ck = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
        cv = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        kh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        vh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        mask = jnp.asarray((rng.random((N, U)) > 0.2).astype(np.int8)).at[:, step].set(1)
        got, nck, ncv = cached_attention_step(
            q, kh, vh, mask, ck, cv, step, layer, H, interpret=True
        )
        want = _ref(
            q.astype(jnp.bfloat16).astype(jnp.float32),
            kh.astype(jnp.bfloat16).astype(jnp.float32),
            vh.astype(jnp.bfloat16).astype(jnp.float32),
            mask, ck, cv, step, layer, H,
        )
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / float(jnp.max(jnp.abs(want)))
        assert rel < 2e-2, (step, layer, rel)  # bf16-product rounding only

        # writeback: position `step` of `layer` holds the fresh kh/vh
        np.testing.assert_array_equal(
            np.asarray(nck[layer, :, step]), np.asarray(kh.astype(jnp.bfloat16))
        )
        np.testing.assert_array_equal(
            np.asarray(ncv[layer, :, step]), np.asarray(vh.astype(jnp.bfloat16))
        )
        # other layers untouched; same layer intact at positions < 8-block
        other = (layer + 1) % L
        np.testing.assert_array_equal(np.asarray(nck[other]), np.asarray(ck[other]))
        t8 = (step // 8) * 8
        np.testing.assert_array_equal(
            np.asarray(nck[layer, :, :t8]), np.asarray(ck[layer, :, :t8])
        )
