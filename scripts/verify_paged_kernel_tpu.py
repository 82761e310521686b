"""On-chip exactness check for the PAGED attention-step kernels — the
whole-row variant (page 32) and the chunked online-softmax variant
(page 64, engaged when U exceeds the whole-row VMEM bound) — at
production shapes (d_model 768, 12 heads). Drives the full protocol:
ownership table, parity-slotted active pages, page completion, and a
random beam reorder after every step, against a physically-maintained
ground-truth cache (the same oracle as tests/test_paged_decode.py,
which covers interpret mode; this script exercises the Mosaic compile
and real DMA behavior).

  timeout 1750 env PYTHONPATH=/root/.axon_site:/root/repo \
      python scripts/verify_paged_kernel_tpu.py
"""
import math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.models.transformer import (
    beam_reorder_cache,
    make_kv_cache,
)
from speech_anonymization_tpu.ops.pallas.attention_step import (
    cached_attention_step_paged,
    cached_attention_step_paged_fused,
    max_u_whole_row,
)

DTYPE = {"bfloat16": jnp.bfloat16, "int8": jnp.int8}[
    os.environ.get("PAGED_DTYPE", "bfloat16")
]
MODE = os.environ.get("PAGED_MODE", "both")  # short | long | both


def _ref_attend(q, kh_new, vh_new, kb, vb, step, nhead):
    """Host-side (numpy) oracle — keeps the 40+ MB ground-truth caches off
    the tunnel; only the kernel's own operands/outputs cross it."""
    n, m = q.shape
    d = m // nhead
    u = kb.shape[1]
    kb = kb.reshape(n, u, nhead, d).astype(np.float32).copy()
    vb = vb.reshape(n, u, nhead, d).astype(np.float32).copy()
    kb[:, step] = np.asarray(
        jnp.asarray(kh_new).astype(jnp.bfloat16), np.float32
    ).reshape(n, nhead, d)
    vb[:, step] = vh_new.astype(np.float32).reshape(n, nhead, d)
    qh = np.asarray(
        jnp.asarray(q).astype(jnp.bfloat16), np.float32
    ).reshape(n, 1, nhead, d)
    scores = np.einsum("bqhd,bkhd->bhqk", qh, kb) / math.sqrt(d)
    pos = np.arange(u)[None, None, None, :]
    scores = np.where(pos <= step, scores, -1e30)
    scores -= scores.max(-1, keepdims=True)
    w = np.exp(scores)
    w /= w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", w, vb).reshape(n, m)


def run(long: bool):
    rng = np.random.default_rng(0)
    L, B, K, M, H = 2, 2, 8, 768, 12
    N = B * K
    quant = DTYPE == jnp.int8
    bound = max_u_whole_row(M, max(jnp.dtype(DTYPE).itemsize, 2))
    deep = os.environ.get("PAGED_DEEP", "0") == "1" and long
    if long:
        U = -(-(bound + 1) // 64) * 64  # first chunked-path size: 448
        steps = 70  # one completed 64-page + 6 into the next
        page = 64
        if deep:
            # several completed pages + collapsed parents for the first
            # two pages -> the ownership table coalesces and the chunked
            # kernel's UNIFORM-page broadcast path runs on-chip (each row
            # tile is one utterance's 8 beams at these shapes)
            steps = 3 * page + 6
    else:
        U = 128
        steps = 38  # one completed 32-page + 6 into the next
        page = 32
    assert (U > bound) == long, (U, bound)

    pc = make_kv_cache(N, U, L, H, M // H, dtype=DTYPE, paged=True)
    fused = "kv" in pc  # fused-KV long layout (make_kv_cache default)
    if fused:
        assert pc["kv_act"].shape[3] == 2 * page, (pc["kv_act"].shape, page)
    else:
        assert pc["k_act"].shape[3] == page, (pc["k_act"].shape, page)
    print(f"  [{'long' if long else 'short'}] layout: "
          f"{'FUSED kv' if fused else 'split k/v'}", flush=True)
    mask = jnp.ones((N, U), jnp.int8)
    k_true = np.zeros((L, N, U, M), np.float32)
    v_true = np.zeros((L, N, U, M), np.float32)

    worst = 0.0
    for t in range(steps):
        for l in range(L):
            q = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
            kh = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
            vh = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
            scales = (
                {"k_scale": pc["k_scale"][l], "v_scale": pc["v_scale"][l]}
                if quant else {}
            )
            if fused:
                res = cached_attention_step_paged_fused(
                    q, kh, vh, mask, pc["kv"], pc["kv_act"],
                    pc["table"], pc["act_src"], t, l, H, **scales,
                )
                if quant:
                    out, pc["kv"], pc["kv_act"], kso, vso = res
                else:
                    out, pc["kv"], pc["kv_act"] = res
            else:
                res = cached_attention_step_paged(
                    q, kh, vh, mask, pc["k"], pc["v"], pc["k_act"], pc["v_act"],
                    pc["table"], pc["act_src"], t, l, H, **scales,
                )
                if quant:
                    out, pc["k"], pc["v"], pc["k_act"], pc["v_act"], kso, vso = res
                else:
                    out, pc["k"], pc["v"], pc["k_act"], pc["v_act"] = res
            if quant:
                pc["k_scale"] = pc["k_scale"].at[l, :, t].set(kso[:, 0])
                pc["v_scale"] = pc["v_scale"].at[l, :, t].set(vso[:, 0])

            want = _ref_attend(
                np.asarray(q), np.asarray(kh), np.asarray(vh),
                k_true[l], v_true[l], t, H,
            )
            err = float(np.max(np.abs(np.asarray(out) - want)))
            rel = err / max(float(np.max(np.abs(want))), 1e-9)
            worst = max(worst, rel)
            tol = 4e-2 if quant else 2e-2
            assert rel < tol, (t, l, rel)

            if quant:
                kh_f = np.asarray(kh.astype(jnp.bfloat16), np.float32)
                vh_f = np.asarray(vh.astype(jnp.bfloat16), np.float32)
                ka = np.maximum(np.max(np.abs(kh_f), 1, keepdims=True), 1e-6)
                va = np.maximum(np.max(np.abs(vh_f), 1, keepdims=True), 1e-6)
                kq = np.clip(np.round(kh_f * (127.0 / ka)), -127, 127)
                vq = np.clip(np.round(vh_f * (127.0 / va)), -127, 127)
                kd = kq.astype(jnp.bfloat16) * (ka / 127.0).astype(jnp.bfloat16)
                k_true[l][:, t] = np.asarray(kd, np.float32)
                v_true[l][:, t] = vq * (va / 127.0)
            else:
                k_true[l][:, t] = np.asarray(kh.astype(DTYPE), np.float32)
                v_true[l][:, t] = np.asarray(vh.astype(DTYPE), np.float32)

        if deep and t < 2 * page + 6:
            parent = jnp.zeros((B, K), jnp.int32)
        else:
            parent = jnp.asarray(rng.integers(0, K, size=(B, K)), jnp.int32)
        src = np.asarray(
            (parent + jnp.arange(B)[:, None] * K).reshape(-1), np.int32
        )
        pc = beam_reorder_cache(pc, parent, t)
        k_true = k_true[:, src]
        v_true = v_true[:, src]
        if t % 16 == 15:
            print(f"  [{'long' if long else 'short'}] step {t + 1}/{steps} "
                  f"worst rel {worst:.3e}", flush=True)

    print(f"[{'long' if long else 'short'}] {steps} steps x {L} layers OK, "
          f"U={U} page={page} worst rel err {worst:.3e}", flush=True)


print("devices:", jax.devices(), " dtype:", DTYPE.__name__, flush=True)
if MODE in ("short", "both"):
    run(long=False)
if MODE in ("long", "both"):
    run(long=True)
print("PAGED KERNELS OK")
