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


def test_chunked_kernel_matches_reference_interpret():
    """U beyond the whole-row VMEM bound takes the chunked online-softmax
    kernel — same math, streamed in double-buffered chunks."""
    from speech_anonymization_tpu.ops.pallas.attention_step import (
        max_u_whole_row,
    )

    rng = np.random.default_rng(1)
    L, N, M, H = 2, 8, 768, 8
    U = 448  # > max_u_whole_row(768, 2) = 426 -> chunked path
    assert U > max_u_whole_row(M, 2)
    for step in (0, 3, 170, 440):
        ck = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
        cv = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        kh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        vh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
        mask = jnp.asarray((rng.random((N, U)) > 0.2).astype(np.int8)).at[:, step].set(1)
        got, nck, ncv = cached_attention_step(
            q, kh, vh, mask, ck, cv, step, 1, H, interpret=True
        )
        want = _ref(
            q.astype(jnp.bfloat16).astype(jnp.float32),
            kh.astype(jnp.bfloat16).astype(jnp.float32),
            vh.astype(jnp.bfloat16).astype(jnp.float32),
            mask, ck, cv, step, 1, H,
        )
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / float(jnp.max(jnp.abs(want)))
        assert rel < 2e-2, (step, rel)
        np.testing.assert_array_equal(
            np.asarray(nck[1, :, step]), np.asarray(kh.astype(jnp.bfloat16))
        )
        np.testing.assert_array_equal(
            np.asarray(ncv[1, :, step]), np.asarray(vh.astype(jnp.bfloat16))
        )
        # untouched layer stays bit-identical
        np.testing.assert_array_equal(np.asarray(nck[0]), np.asarray(ck[0]))


def test_chunked_kernel_masked_fresh_token_interpret():
    """The optimistic fresh-token seed must be exactly removed when the
    pad-mask bit at `step` is 0 (the whole-row kernel masks it directly)."""
    rng = np.random.default_rng(2)
    L, N, M, H, U = 1, 8, 768, 8, 448
    step = 200
    ck = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((L, N, U, M)).astype(np.float32)).astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
    kh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
    vh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
    mask = jnp.ones((N, U), jnp.int8).at[:, step].set(0)  # fresh token masked
    got, _, _ = cached_attention_step(
        q, kh, vh, mask, ck, cv, step, 0, H, interpret=True
    )
    want = _ref(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kh.astype(jnp.bfloat16).astype(jnp.float32),
        vh.astype(jnp.bfloat16).astype(jnp.float32),
        mask, ck, cv, step, 0, H,
    )
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 2e-2, rel


def test_chunked_kernel_int8_interpret():
    from speech_anonymization_tpu.ops.pallas.attention_step import (
        max_u_whole_row,
    )

    rng = np.random.default_rng(3)
    L, N, M, H = 2, 8, 768, 8
    U = 896  # > max_u_whole_row(768, 2) with the bf16-floored itemsize
    assert U > max_u_whole_row(M, 2)
    step = 500
    ckf = rng.standard_normal((L, N, U, M)).astype(np.float32)
    cvf = rng.standard_normal((L, N, U, M)).astype(np.float32)
    k_scale = (np.abs(ckf).max(axis=3) / 127.0 + 1e-9).astype(np.float32)
    v_scale = (np.abs(cvf).max(axis=3) / 127.0 + 1e-9).astype(np.float32)
    ck = jnp.asarray(np.clip(np.round(ckf / k_scale[..., None]), -127, 127).astype(np.int8))
    cv = jnp.asarray(np.clip(np.round(cvf / v_scale[..., None]), -127, 127).astype(np.int8))
    q = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
    kh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
    vh = jnp.asarray(rng.standard_normal((N, M)).astype(np.float32))
    mask = jnp.ones((N, U), jnp.int8)
    res = cached_attention_step(
        q, kh, vh, mask, ck, cv, step, 1, H, interpret=True,
        k_scale=jnp.asarray(k_scale[1]), v_scale=jnp.asarray(v_scale[1]),
    )
    got, nck, ncv, kso, vso = res
    # dequantized reference
    ckd = (ck.astype(np.float32) * k_scale[..., None])
    cvd = (cv.astype(np.float32) * v_scale[..., None])
    want = _ref(
        q.astype(jnp.bfloat16).astype(jnp.float32),
        kh, vh, mask, jnp.asarray(ckd), jnp.asarray(cvd), step, 1, H,
    )
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 3e-2, rel  # int8 quantization + bf16 rounding
    # fresh position quantized + scales exported
    assert np.asarray(kso).shape == (N, 128)
    scale_col = np.asarray(kso)[:, 0]
    deq = np.asarray(nck[1, :, step]).astype(np.float32) * scale_col[:, None]
    np.testing.assert_allclose(deq, np.asarray(kh), atol=np.abs(np.asarray(kh)).max() / 100)
