"""Paged (lazy-beam-reorder) KV caches must be indistinguishable from the
physically-reordered path.

Three layers of coverage:
  * the Pallas paged kernel's full protocol (ownership table, parity
    slots, page completion, beam reorders between steps) in interpret
    mode against a ground-truth physically-maintained cache;
  * the same for int8 quantized caches;
  * full beam_search decode on CPU (jnp materializing fallback) — paged
    hypotheses and scores must equal the physical-reorder path exactly.

The beam reorder of a paged cache moves no k/v bytes (see
models.transformer.beam_reorder_cache); the reference operation being
replaced is SpeechBrain's permute_mem index_select
(/root/reference/speechbrain_configs/convae.yaml:226-240 decode config).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_anonymization_tpu.decoding import BeamSearchConfig, beam_search
from speech_anonymization_tpu.decoding.beam_search import hyps_to_lists
from speech_anonymization_tpu.models.asr import ASRModel
from speech_anonymization_tpu.models.transformer import (
    beam_reorder_cache,
    make_kv_cache,
)
from speech_anonymization_tpu.ops.pallas.attention_step import (
    _PAGE,
    cached_attention_step_paged,
    cached_attention_step_paged_fused,
)

KEY = jax.random.PRNGKey(0)


def _ref_attend(q, kh_new, vh_new, kb, vb, step, nhead):
    """Reference cached-attention math over EXPLICIT f32 content buffers
    (same bf16 casts as the kernel's score path, f32 accumulation)."""
    n, m = q.shape
    d = m // nhead
    u = kb.shape[1]
    kb = kb.reshape(n, u, nhead, d).astype(jnp.float32)
    vb = vb.reshape(n, u, nhead, d).astype(jnp.float32)
    kb = kb.at[:, step].set(
        kh_new.astype(jnp.bfloat16).astype(jnp.float32).reshape(n, nhead, d)
    )
    vb = vb.at[:, step].set(
        vh_new.astype(jnp.float32).reshape(n, nhead, d)
    )
    qh = q.astype(jnp.bfloat16).astype(jnp.float32).reshape(n, 1, nhead, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kb) / math.sqrt(d)
    pos = jnp.arange(u)[None, None, None, :]
    scores = jnp.where(pos <= step, scores, -1e30)
    w = jax.nn.softmax(scores, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vb).reshape(n, m)


def _random_parent(rng, b, k):
    return jnp.asarray(rng.integers(0, k, size=(b, k)), jnp.int32)


def _kv_views(pc, page):
    """(k_main, v_main, k_act, v_act) numpy views of either cache layout
    (fused long caches store pages as [K-page, V-page])."""
    if "kv" in pc:
        L, N, U2, M = pc["kv"].shape
        U = U2 // 2
        up = U // page
        kvb = np.asarray(pc["kv"]).reshape(L, N, up, 2, page, M)
        akv = np.asarray(pc["kv_act"])
        return (kvb[:, :, :, 0].reshape(L, N, U, M),
                kvb[:, :, :, 1].reshape(L, N, U, M),
                akv[:, :, :, :page], akv[:, :, :, page:])
    return (np.asarray(pc["k"]), np.asarray(pc["v"]),
            np.asarray(pc["k_act"]), np.asarray(pc["v_act"]))


@pytest.mark.parametrize("dtype,long,fused", [
    (jnp.bfloat16, False, False), (jnp.int8, False, False),
    (jnp.bfloat16, True, True), (jnp.int8, True, True),
    # legacy split layout of the chunked kernel (SATPU_FUSED_KV=0)
    (jnp.bfloat16, True, False), (jnp.int8, True, False),
    (jnp.bfloat16, "deep", True), (jnp.int8, "deep", True),
    (jnp.bfloat16, "deep_unif", True), (jnp.int8, "deep_unif", True),
])
def test_paged_kernel_protocol_interpret(dtype, long, fused, monkeypatch):
    """Drive the paged kernel through 2 pages + 6 decode steps with a
    random beam reorder after every step, crossing a page-completion
    boundary, and compare every attention output (and the final
    reconstructable cache content) against a physically-maintained ground
    truth. ``long`` shrinks the whole-row VMEM bound so the same protocol
    runs through the CHUNKED paged kernel (page 64 == DMA grain);
    ``"deep"`` additionally shrinks the page to 16 and forces 2 row
    tiles so the chunk count exceeds the DMA buffer window (nc > nbuf)
    with multiple grid tiles — the steady-state streaming regime of
    long decodes, previously uncovered off-chip. ``"deep_unif"`` makes
    every row tile sit inside ONE utterance (K == tile rows) and
    collapses the beam parents for the first pages, so completed pages
    become tile-UNIFORM and the single-DMA broadcast path runs (the test
    asserts it was eligible)."""
    rng = np.random.default_rng(0)
    L, B, K, M, H = 2, 2, 4, 256, 4
    N = B * K
    collapse_until = 0
    if long:
        # force the chunked path: any U exceeds the whole-row bound
        from speech_anonymization_tpu.ops.pallas import attention_step as ats

        monkeypatch.setattr(ats, "max_u_whole_row", lambda m, i: 8)
        import speech_anonymization_tpu.models.transformer as mt

        page = 64
        steps = page + 10  # one completed page + active
        if long in ("deep", "deep_unif"):
            B, K = (2, 8) if long == "deep_unif" else (4, 4)
            N = B * K
            page = 16
            monkeypatch.setattr(ats, "_PAGE_LONG", page)
            # 2 row tiles of 8: cross-tile prefetch needs nt >= 2
            monkeypatch.setattr(
                ats, "_pick_chunk_paged", lambda n, m, it: (8, page, page, 3)
            )
            steps = 4 * page + 10  # nc exceeds nbuf=3 from step 48 (and hits 5 at 64)
            if long == "deep_unif":
                # all beams re-parent to beam 0 while the first 2+ pages
                # complete -> their table columns coalesce to one owner
                collapse_until = 2 * page + 6
    else:
        page = _PAGE
        steps = 2 * _PAGE + 6
    U = -(-(steps + 1) // page) * page
    if long in ("deep", "deep_unif"):
        # make_kv_cache rounds long caches to 64-multiples regardless of
        # the (patched) page size
        U = -(-U // 64) * 64
    quant = dtype == jnp.int8
    uniform_pages_seen = 0

    monkeypatch.setenv("SATPU_FUSED_KV", "1" if fused else "0")
    pc = make_kv_cache(N, U, L, H, M // H, dtype=dtype, paged=True)
    is_fused = "kv" in pc
    assert is_fused == (bool(long) and fused) and "table" in pc
    if is_fused:
        assert pc["kv"].shape == (L, N, 2 * U, M)
        assert pc["kv_act"].shape[3] == 2 * page
    else:
        assert pc["k"].shape == (L, N, U, M)
        assert pc["k_act"].shape[3] == page
    mask = jnp.ones((N, U), jnp.int8)

    # ground truth: physically-reordered DEQUANTIZED content + raw scales
    k_true = np.zeros((L, N, U, M), np.float32)
    v_true = np.zeros((L, N, U, M), np.float32)

    for t in range(steps):
        if long in ("deep", "deep_unif"):
            # count tile-uniform completed pages the kernel will see at
            # this step (tn = 8 under the monkeypatched _pick_chunk_paged)
            tblr = np.asarray(pc["table"]).reshape(N // 8, 8, U // page)
            p_act = t // page
            uniform_pages_seen += int(
                (tblr[:, :, :p_act] == tblr[:, :1, :p_act]).all(axis=1).sum()
            )
        for l in range(L):
            q = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
            kh = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
            vh = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
            scales = (
                {"k_scale": pc["k_scale"][l], "v_scale": pc["v_scale"][l]}
                if quant else {}
            )
            if is_fused:
                res = cached_attention_step_paged_fused(
                    q, kh, vh, mask, pc["kv"], pc["kv_act"],
                    pc["table"], pc["act_src"], t, l, H, interpret=True,
                    **scales,
                )
                if quant:
                    out, pc["kv"], pc["kv_act"], kso, vso = res
                else:
                    out, pc["kv"], pc["kv_act"] = res
            else:
                res = cached_attention_step_paged(
                    q, kh, vh, mask, pc["k"], pc["v"], pc["k_act"], pc["v_act"],
                    pc["table"], pc["act_src"], t, l, H, interpret=True,
                    **scales,
                )
                if quant:
                    out, pc["k"], pc["v"], pc["k_act"], pc["v_act"], kso, vso = res
                else:
                    out, pc["k"], pc["v"], pc["k_act"], pc["v_act"] = res
            if quant:
                pc["k_scale"] = pc["k_scale"].at[l, :, t].set(kso[:, 0])
                pc["v_scale"] = pc["v_scale"].at[l, :, t].set(vso[:, 0])

            want = _ref_attend(
                q, kh, vh, jnp.asarray(k_true[l]), jnp.asarray(v_true[l]), t, H
            )
            err = float(jnp.max(jnp.abs(out - want)))
            rel = err / max(float(jnp.max(jnp.abs(want))), 1e-9)
            tol = 4e-2 if quant else 2e-2
            assert rel < tol, (t, l, rel)

            # ground truth stores what the cache stores (the kernel's own
            # quant/cast), DEQUANTIZED the way the kernel dequantizes
            if quant:
                # the kernel wrapper casts kh/vh to bf16 before quantizing
                kh_f = np.asarray(kh.astype(jnp.bfloat16), np.float32)
                vh_f = np.asarray(vh.astype(jnp.bfloat16), np.float32)
                ka = np.maximum(np.max(np.abs(kh_f), axis=1, keepdims=True), 1e-6)
                va = np.maximum(np.max(np.abs(vh_f), axis=1, keepdims=True), 1e-6)
                kq = np.clip(np.round(kh_f * (127.0 / ka)), -127, 127)
                vq = np.clip(np.round(vh_f * (127.0 / va)), -127, 127)
                kd = (kq.astype(jnp.bfloat16) * (ka / 127.0).astype(jnp.bfloat16))
                k_true[l][:, t] = np.asarray(kd, np.float32)
                v_true[l][:, t] = vq * (va / 127.0)
            else:
                k_true[l][:, t] = np.asarray(kh.astype(dtype), np.float32)
                v_true[l][:, t] = np.asarray(vh.astype(dtype), np.float32)

        if t < collapse_until:
            parent = jnp.zeros((B, K), jnp.int32)
        else:
            parent = _random_parent(rng, B, K)
        src = np.asarray(
            (parent + jnp.arange(B)[:, None] * K).reshape(-1), np.int32
        )
        pc = beam_reorder_cache(pc, parent, t)
        k_true = k_true[:, src]
        v_true = v_true[:, src]

    if long == "deep_unif":
        # the whole point of this regime: the uniform broadcast path ran
        assert uniform_pages_seen > 50, uniform_pages_seen

    # final state: reconstruct logical content from pages + parity slots
    # and compare every position <= last step against the ground truth
    last = steps - 1
    p_act, o = divmod(last, page)
    tbl = np.asarray(pc["table"])
    asrc = np.asarray(pc["act_src"])
    par = last % 2  # the slot the kernel wrote at the last step
    k_main, v_main, k_act, v_act = _kv_views(pc, page)
    for is_k, main, act, true in (
        (True, k_main, k_act, k_true), (False, v_main, v_act, v_true)
    ):
        if not quant:
            main = main.astype(np.float32)
        got = np.zeros((L, N, last + 1, M), np.float32)
        for n in range(N):
            for p in range(p_act):
                got[:, n, p * page : (p + 1) * page] = main[
                    :, tbl[n, p], p * page : (p + 1) * page
                ]
        for n in range(N):
            got[:, n, p_act * page : last + 1] = act[:, asrc[n], par, : o + 1]
        if quant:
            sc = np.asarray(
                pc["k_scale"] if is_k else pc["v_scale"], np.float32
            )
            if is_k:  # kernel dequantizes k in bf16
                got = np.asarray(
                    got.astype(jnp.bfloat16)
                    * sc[:, :, : last + 1, None].astype(jnp.bfloat16),
                    np.float32,
                )
            else:
                got = got * sc[:, :, : last + 1, None]
        np.testing.assert_allclose(
            got, true[:, :, : last + 1], rtol=2e-2, atol=2e-3
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_beam_search_paged_equals_physical(dtype):
    """Full CPU decode (jnp materializing fallback) across page boundaries:
    paged and physical caches must produce identical hypotheses and
    near-identical scores."""
    model = ASRModel(d_model=32, nhead=4, num_encoder_layers=1,
                     num_decoder_layers=2, d_ffn=64, output_neurons=24)
    feats = jax.random.normal(KEY, (2, 24, 80))
    tokens = jnp.asarray([[1, 5, 6], [1, 7, 3]])
    lens = jnp.asarray([1.0, 0.75])
    variables = model.init(KEY, feats, tokens, lens)
    enc = model.apply(variables, feats, lens, method=ASRModel.encode)
    ctc_logits = model.apply(variables, enc, method=lambda m, e: m.heads.ctc_logits(e))
    p_ctc = jax.nn.log_softmax(ctc_logits, -1)
    cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.4, length_normalization=True)

    outs = {}
    for paged in (False, True):
        att_cached = (
            lambda n, u_max, paged=paged: make_kv_cache(
                n, u_max, 2, 4, 8, dtype=dtype, paged=paged
            ),
            lambda state, prev, step: model.apply(
                variables, prev, enc, state, step, lens,
                method=ASRModel.decode_step_cached,
            ),
            beam_reorder_cache,
        )
        # > _PAGE steps so pages complete and the ownership table carries
        outs[paged] = beam_search(
            None, enc, lens, p_ctc, cfg, max_steps=_PAGE + 8, att_cached=att_cached
        )
    assert hyps_to_lists(*outs[False][:2]) == hyps_to_lists(*outs[True][:2])
    np.testing.assert_allclose(
        np.asarray(outs[False][2]), np.asarray(outs[True][2]), atol=1e-5
    )


def test_make_attends_kernel_branch_interpret(monkeypatch):
    """Cover the _make_attends KERNEL branch off-chip (Pallas interpret via
    SATPU_FORCE_KERNEL_INTERPRET): scale plumbing, cache threading through
    the per-layer closures, the stacked per-step scale update in finalize,
    and the uniform-page MXU subtile path, driven through a full
    TransformerLM.decode_step chain with beam reorders and page
    completions, against the jnp paged fallback (the reference math).
    Without this the kernel branch only ever runs on a real chip."""
    from speech_anonymization_tpu.models.transformer import TransformerLM
    from speech_anonymization_tpu.ops.pallas import attention_step as ats

    L, B, K, M, H = 2, 2, 8, 128, 2
    N = B * K
    page = 16
    monkeypatch.setattr(ats, "max_u_whole_row", lambda m, i: 8)
    monkeypatch.setattr(ats, "_PAGE_LONG", page)
    monkeypatch.setattr(ats, "_pick_chunk_paged", lambda n, m, it: (8, page, page, 3))
    lm = TransformerLM(vocab=32, d_model=M, nhead=H, num_layers=L, d_ffn=64,
                       max_len=64)
    variables = lm.init(KEY, jnp.zeros((1, 4), jnp.int32))
    steps, u_max = 40, 48

    def run(force_kernel):
        if force_kernel:
            monkeypatch.setenv("SATPU_FORCE_KERNEL_INTERPRET", "1")
        else:
            monkeypatch.delenv("SATPU_FORCE_KERNEL_INTERPRET", raising=False)
        pc = make_kv_cache(N, u_max, L, H, M // H, jnp.int8, paged=True)
        rr = np.random.default_rng(7)
        outs = []
        for t in range(steps):
            token = jnp.asarray(rr.integers(1, 32, size=(N,)), jnp.int32)
            logits, pc = lm.apply(variables, token, pc, t,
                                  method=TransformerLM.decode_step)
            outs.append(logits)
            # collapsed parents while pages 0-1 complete -> tile-UNIFORM
            # completed pages (K == tile rows), then random reorders
            parent = (jnp.zeros((B, K), jnp.int32) if t < 2 * page
                      else jnp.asarray(rr.integers(0, K, (B, K)), jnp.int32))
            pc = beam_reorder_cache(pc, parent, t)
        return np.asarray(jnp.stack(outs))

    ref = run(False)
    got = run(True)
    rel = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
    # both branches quantize the fresh k/v independently (f32- vs
    # bf16-derived amax), so agreement is quantization-grade, not exact
    assert rel < 6e-2, rel
