"""Whole-LM-step megakernel (ops/pallas/lm_megastep.py) vs the per-layer
reference path.

The megakernel runs every TransformerLM layer of a decode step in one
pallas_call (interpret mode here); the reference is the same
TransformerLM.decode_step WITHOUT ``mega`` — on CPU that is the jnp
paged-fallback path (_make_attends_paged_jnp) with f32 flax matmuls.
The megakernel computes its matmuls in bf16 (the serving numerics), so
comparisons use bf16-level tolerances.

Protocol coverage mirrors tests/test_paged_decode.py: steps that cross a
page boundary (completion -> main-cache writeback), beam reorders between
steps (ownership table + act_src + physically-gathered scales), uniform
(coalesced-ancestor) and mixed ownership tables, int8 and bf16 caches.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_anonymization_tpu.models.transformer import (
    TransformerLM,
    beam_reorder_cache,
)
from speech_anonymization_tpu.ops.pallas.attention_step import _PAGE_LONG

B, K = 2, 8
N = B * K
M = 256
NHEAD = 4
L = 2
FFN = 512  # nf = 2
VOCAB = 97
U = 4 * _PAGE_LONG  # 4 pages


@pytest.fixture(scope="module")
def lm_and_params():
    lm = TransformerLM(vocab=VOCAB, d_model=M, nhead=NHEAD, num_layers=L,
                       d_ffn=FFN, max_len=U + 8)
    variables = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return lm, variables


def _fused_cache(dtype):
    """Hand-built fused-KV paged cache (make_kv_cache only emits the fused
    layout in the chunked VMEM regime, which needs U in the thousands at
    this d_model — the kernel itself only requires page == _PAGE_LONG)."""
    page = _PAGE_LONG
    cache = {
        "kv": jnp.zeros((L, N, 2 * U, M), dtype),
        "kv_act": jnp.zeros((L, N, 2, 2 * page, M), dtype),
        "tokens": jnp.zeros((N, U), jnp.int32),
        "table": jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, U // page)
        ),
        "act_src": jnp.arange(N, dtype=jnp.int32),
    }
    if dtype == jnp.int8:
        cache["k_scale"] = jnp.zeros((L, N, U), jnp.float32)
        cache["v_scale"] = jnp.zeros((L, N, U), jnp.float32)
    return cache


def _codes_close(av, bv, dtype, key):
    if dtype == jnp.int8:
        # independent bf16 vs f32 pipelines to the same quantizer: allow
        # small code diffs on a small fraction of entries
        diff = np.abs(av.astype(np.int32) - bv.astype(np.int32))
        assert diff.max() <= 3, (key, diff.max())
        assert (diff > 1).mean() < 0.02, (key, (diff > 1).mean())
    else:
        np.testing.assert_allclose(av.astype(np.float32),
                                   bv.astype(np.float32),
                                   rtol=0.05, atol=0.05, err_msg=key)


def _cache_allclose(a, b, dtype, step):
    page = _PAGE_LONG
    o = step % page
    par_w, par_r = step % 2, (step + 1) % 2
    for key in a:
        av, bv = np.asarray(a[key]), np.asarray(b[key])
        if key == "kv":
            _codes_close(av, bv, dtype, key)
        elif key == "kv_act":
            # the kernel's granule skip leaves positions past the fresh
            # token as JUNK in the written parity slot (they are always
            # rewritten before being read) — compare only the live region
            # of slot par_w (K half [0, o], V half [page, page + o]) and
            # the untouched slot par_r exactly. On COMPLETION steps the
            # kernel writes the main cache and leaves the parity slot
            # stale entirely (the jnp reference also refreshes the slot,
            # which no reader ever consumes — same contract as the
            # per-layer paged kernel), so par_w is unconstrained then.
            if o < page - 1:
                for lo in (0, page):
                    _codes_close(av[:, :, par_w, lo:lo + o + 1],
                                 bv[:, :, par_w, lo:lo + o + 1], dtype,
                                 f"{key}[par_w, {lo}:{lo + o + 1}]")
            np.testing.assert_array_equal(av[:, :, par_r], bv[:, :, par_r],
                                          err_msg=f"{key}[par_r]")
        elif key in ("k_scale", "v_scale"):
            np.testing.assert_allclose(av, bv, rtol=0.02, atol=1e-6,
                                       err_msg=key)
        else:
            np.testing.assert_array_equal(av, bv, err_msg=key)


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
def test_megastep_matches_reference_with_reorders(lm_and_params, monkeypatch,
                                                  dtype):
    monkeypatch.setenv("SATPU_LM_MEGA_INTERPRET", "1")
    lm, variables = lm_and_params
    mega = lm.prepare_megastep(variables["params"])
    rng = np.random.default_rng(0)
    cache = _fused_cache(dtype)

    # drive the canonical state with the REFERENCE path; at checkpoints,
    # run BOTH paths from the identical state and compare
    check_steps = {2, 5, _PAGE_LONG - 1, _PAGE_LONG, _PAGE_LONG + 1,
                   2 * _PAGE_LONG - 1, 2 * _PAGE_LONG + 3}
    n_steps = 2 * _PAGE_LONG + 5
    tok = jnp.asarray(rng.integers(3, VOCAB, size=(N,)), jnp.int32)
    compared = 0
    for step in range(n_steps):
        ref_logits, ref_cache = lm.apply(
            variables, tok, cache, step, method=TransformerLM.decode_step
        )
        if step in check_steps:
            mega_logits, mega_cache = lm.apply(
                variables, tok, cache, step, mega,
                method=TransformerLM.decode_step,
            )
            ref_lp = jax.nn.log_softmax(ref_logits, -1)
            mega_lp = jax.nn.log_softmax(mega_logits, -1)
            np.testing.assert_allclose(
                np.asarray(mega_lp), np.asarray(ref_lp), rtol=0.1, atol=0.12,
                err_msg=f"step {step}")
            _cache_allclose(mega_cache, ref_cache, dtype, step)
            compared += 1
        cache = ref_cache
        if step % 3 == 2:  # beam reorder (coalescing every other time:
            # parents=0 collapses ownership -> uniform-page tiles)
            if (step // 3) % 2 == 0:
                parent = jnp.zeros((B, K), jnp.int32)
            else:
                parent = jnp.asarray(rng.integers(0, K, (B, K)), jnp.int32)
            cache = beam_reorder_cache(cache, parent, step)
        tok = jnp.asarray(rng.integers(3, VOCAB, size=(N,)), jnp.int32)
    assert compared == len(check_steps)


def test_megastep_gate_falls_back_without_fused_cache(lm_and_params,
                                                      monkeypatch):
    """A non-fused (split or non-paged) cache must take the per-layer path
    even when mega weights are supplied."""
    monkeypatch.setenv("SATPU_LM_MEGA_INTERPRET", "1")
    lm, variables = lm_and_params
    mega = lm.prepare_megastep(variables["params"])
    cache = lm.init_cache(N, 64)  # short cache: no "kv" key
    assert "kv" not in cache
    tok = jnp.full((N,), 7, jnp.int32)
    logits, new_cache = lm.apply(
        variables, tok, cache, 0, mega, method=TransformerLM.decode_step
    )
    ref_logits, _ = lm.apply(
        variables, tok, cache, 0, method=TransformerLM.decode_step
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits))


def test_prepare_megastep_shapes(lm_and_params):
    lm, variables = lm_and_params
    wall, vecs = lm.prepare_megastep(variables["params"])
    nf = FFN // M
    assert wall.shape == (L * (4 + 2 * nf), M, M)
    assert wall.dtype == jnp.bfloat16
    assert vecs.shape == (L, 9 + nf, M)
    # block order: [q, k, v, o, w1_c0, w2_c0, ...] — spot-check q and w2_c1
    p0 = variables["params"]["layer_0"]
    np.testing.assert_allclose(
        np.asarray(wall[0]),
        np.asarray(p0["attn"]["q"]["kernel"].reshape(M, M).astype(jnp.bfloat16)),
    )
    np.testing.assert_allclose(
        np.asarray(wall[4 + 2 * (nf - 1) + 1]),
        np.asarray(
            p0["FeedForward_0"]["Dense_1"]["kernel"][(nf - 1) * M:, :]
            .astype(jnp.bfloat16)
        ),
    )
