"""Pallas TPU kernel: single-token cached self-attention for beam decode.

Why a kernel at all: in the XLA formulation of one decode step, every op
that touches the stacked KV cache costs a full-cache pass. Measured on
v5e at the bench shape (B=8, beam 66 -> N=528 rows, 12 layers, d=768,
trace in BENCHMARKS.md round 2): a {3,2,1,0}->{1,3,2,0} relayout copy of
K (~2.6 ms/step, XLA prefers an N-minor layout for the per-token mat-vec
but the Pallas reorder kernel pins the carry row-major), a kLoop fusion
materializing all 12 per-layer K slices CONVERTED TO F32 (~3.9 ms/step),
the same for V (~2.1 ms/step), plus conservative copies feeding the
reorder custom call. None of that is compute — it is XLA being unable to
fuse 12 sequential consumers of one buffer.

This kernel makes the cache opaque to XLA: the whole stacked (L, N, U, M)
cache stays in HBM (memory_space=ANY), each invocation DMAs ONLY the
``ceil((step+1)/CU)`` live position-chunks of its row tile for its layer
(the rest of the buffer is dead weight at step t), writes the fresh
token's k/v into the tile at position ``step``, and runs the full
(numerically f32) softmax-attention in VMEM. The only HBM traffic is the
gated cache read — the theoretical minimum for this op.

Head handling: rather than slicing 64-lane head columns (misaligned for
the 128-lane VPU), per-head score/value sums are computed as ONE MXU
matmul against a constant (M, H) head-segment matrix:

    scores(n,u,h) = sum_m prod(n,u,m) * seg(m,h),   prod = q * k
    wexp(n,u,m)   = sum_h w(n,u,h) * seg(m,h)       (broadcast back)

Replaces the per-layer torch ``F.multi_head_attention_forward`` step
inside the reference's S2STransformerBeamSearch decode loop
(convae.yaml:226-240).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CU = 8  # positions per DMA chunk; must divide U (make_kv_cache pads)
NEG_INF = -1e30


def _kernel(step_ref, q_ref, kh_ref, vh_ref, mask_ref, seg_ref,
            *rest, layer, tn, d_head, quant):
    # operand tail differs by mode:
    #   bf16/f32: ck, cv | out, cko, cvo | scratch...
    #   int8:     ksl, vsl, ck, cv | out, cko, cvo, kso, vso | scratch...
    if quant:
        (ksl_ref, vsl_ref, ck_ref, cv_ref,
         out_ref, cko_ref, cvo_ref, kso_ref, vso_ref,
         ksc, vsc, kwb, vwb, sems) = rest
    else:
        (ck_ref, cv_ref, out_ref, cko_ref, cvo_ref,
         ksc, vsc, kwb, vwb, sems) = rest
    i = pl.program_id(0)
    row0 = i * tn
    step = step_ref[0]
    nc = (step + _CU) // _CU  # chunks covering positions <= step

    def _copies(c):
        return (
            pltpu.make_async_copy(
                ck_ref.at[layer, pl.ds(row0, tn), pl.ds(c * _CU, _CU), :],
                ksc.at[:, pl.ds(c * _CU, _CU), :],
                sems.at[0, c],
            ),
            pltpu.make_async_copy(
                cv_ref.at[layer, pl.ds(row0, tn), pl.ds(c * _CU, _CU), :],
                vsc.at[:, pl.ds(c * _CU, _CU), :],
                sems.at[1, c],
            ),
        )

    def _start(c, _):
        ck, cv = _copies(c)
        ck.start()
        cv.start()
        return 0

    def _wait(c, _):
        ck, cv = _copies(c)
        ck.wait()
        cv.wait()
        return 0

    jax.lax.fori_loop(0, nc, _start, 0)
    jax.lax.fori_loop(0, nc, _wait, 0)

    u = ksc.shape[1]
    m = ksc.shape[2]
    h = m // d_head

    # ---- cache writeback: this layer's fresh k/v land at position `step`
    # (outputs alias the cache operands — the XLA stacked DUS this replaces
    # RMWs whole (8,128) tiles at an unaligned position: ~1.15 ms/step at
    # the bench shape). The write covers the ALIGNED 8-position block
    # around `step`: earlier positions repeat the just-read cache bytes,
    # later ones are junk that is overwritten before it is ever read.
    t8 = (step // _CU) * _CU
    pos8 = jax.lax.broadcasted_iota(jnp.int32, (tn, _CU, 1), 1) + t8
    at8 = pos8 == step
    if quant:
        # symmetric per-row int8: scale = max|x|/127, stored f32 (DUSed into
        # the (L, N, U) scale arrays by the caller from kso/vso)
        kh_f = kh_ref[...].astype(jnp.float32)
        vh_f = vh_ref[...].astype(jnp.float32)
        k_amax = jnp.maximum(jnp.max(jnp.abs(kh_f), axis=1, keepdims=True), 1e-6)
        v_amax = jnp.maximum(jnp.max(jnp.abs(vh_f), axis=1, keepdims=True), 1e-6)
        kq = jnp.clip(jnp.round(kh_f * (127.0 / k_amax)), -127, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vh_f * (127.0 / v_amax)), -127, 127).astype(jnp.int8)
        kso_ref[...] = jnp.broadcast_to(k_amax * (1.0 / 127.0), kso_ref.shape)
        vso_ref[...] = jnp.broadcast_to(v_amax * (1.0 / 127.0), vso_ref.shape)
        kwb[...] = jnp.where(at8, kq[:, None, :], ksc[:, pl.ds(t8, _CU), :])
        vwb[...] = jnp.where(at8, vq[:, None, :], vsc[:, pl.ds(t8, _CU), :])
    else:
        kwb[...] = jnp.where(
            at8, kh_ref[...][:, None, :].astype(kwb.dtype), ksc[:, pl.ds(t8, _CU), :]
        )
        vwb[...] = jnp.where(
            at8, vh_ref[...][:, None, :].astype(vwb.dtype), vsc[:, pl.ds(t8, _CU), :]
        )
    wb_k = pltpu.make_async_copy(
        kwb, cko_ref.at[layer, pl.ds(row0, tn), pl.ds(t8, _CU), :], sems.at[2, 0]
    )
    wb_v = pltpu.make_async_copy(
        vwb, cvo_ref.at[layer, pl.ds(row0, tn), pl.ds(t8, _CU), :], sems.at[2, 1]
    )
    wb_k.start()
    wb_v.start()
    seg = seg_ref[...]  # (M, H) bf16 head-segment one-hot
    # 3-D int32 iota/masks throughout: Mosaic cannot insert a minor dim on
    # i1/i8 vectors, so comparisons are done at their target rank
    pos3 = jax.lax.broadcasted_iota(jnp.int32, (tn, u, 1), 1)
    at_step = pos3 == step  # (TN, U, 1) bool

    mask3 = mask_ref[...].astype(jnp.int32)[:, :, None]       # (TN, U, 1)
    valid = (pos3 <= step) & (mask3 != 0)                     # (TN, U, 1)

    # fresh token's k/v REPLACE column ``step`` (vector select — a dynamic
    # sublane store would need 8-aligned indices, which step is not);
    # invalid positions are zeroed: the un-DMAed scratch region is
    # uninitialized and 0 * NaN would poison the weighted value sum
    if quant:
        kd = ksc[...].astype(jnp.bfloat16) * ksl_ref[...][:, :, None].astype(jnp.bfloat16)
        vd = vsc[...].astype(jnp.float32) * vsl_ref[...][:, :, None]
    else:
        kd = ksc[...].astype(jnp.bfloat16)
        vd = vsc[...].astype(jnp.float32)
    kk = jnp.where(at_step, kh_ref[...][:, None, :].astype(jnp.bfloat16), kd)
    vv = jnp.where(at_step, vh_ref[...][:, None, :].astype(jnp.float32), vd)
    vv = jnp.where(valid | at_step, vv, 0.0)

    q = q_ref[...].astype(jnp.bfloat16)                       # (TN, M)
    prod = q[:, None, :] * kk                                 # (TN, U, M)
    scores = jnp.dot(
        prod.reshape(tn * u, m), seg, preferred_element_type=jnp.float32
    ).reshape(tn, u, h) * (1.0 / math.sqrt(d_head))

    scores = jnp.where(valid, scores, NEG_INF)

    mx = jnp.max(scores, axis=1, keepdims=True)               # (TN, 1, H)
    e = jnp.exp(scores - mx)
    w = e / jnp.sum(e, axis=1, keepdims=True)                 # (TN, U, H)

    wexp = jnp.dot(
        w.astype(jnp.bfloat16).reshape(tn * u, h), seg.T,
        preferred_element_type=jnp.float32,
    ).reshape(tn, u, m)
    out = jnp.sum(wexp * vv, axis=1)                          # (TN, M)
    out_ref[...] = out.astype(out_ref.dtype)
    wb_k.wait()
    wb_v.wait()


def _kernel_chunked(step_ref, q_ref, kh_ref, vh_ref, mask_ref, seg_ref,
                    *rest, layer, tn, uc, ucc, nbuf, d_head, quant):
    """Long-cache variant: U is streamed in ``uc``-position DMA chunks
    (``nbuf``-deep pipelining) and computed in ``ucc``-position sub-tiles
    with an online (flash-style) softmax, so VMEM use is independent of U
    — no cap, no jnp fallback. Decoupling the DMA grain from the compute
    tile matters on both sides: big chunks amortize DMA issue latency
    (the whole-row kernel's 8-position fragments are latency-bound at
    long U), small sub-tiles keep the (tn, ucc, m)-extent f32/bf16
    compute temporaries inside VMEM.

    The fresh token seeds the running (max, denom, acc) accumulators;
    chunks contribute positions < step (the stale slot at ``step`` is
    excluded rather than score-overridden). Head sums ride the same
    constant (M, H) segment matmul as the whole-row kernel; the
    alpha/denominator expansions use an f32 copy of the (exact 0/1)
    segment matrix so rescaling error does not compound across chunks.

    Operand order matches ``_kernel``; the pad mask (and int8 scales)
    arrive pre-chunked at sub-tile granularity, (U/ucc, N, max(ucc, 128)),
    and are copied ONCE per kernel invocation (not per chunk — three
    extra small DMAs per chunk were pure latency)."""
    if quant:
        (ksl_ref, vsl_ref, ck_ref, cv_ref,
         out_ref, cko_ref, cvo_ref, kso_ref, vso_ref,
         ksc, vsc, mall, kslall, vslall, kwb, vwb, mflag, sems) = rest
    else:
        (ck_ref, cv_ref, out_ref, cko_ref, cvo_ref,
         ksc, vsc, mall, kwb, vwb, mflag, sems) = rest
    i = pl.program_id(0)
    row0 = i * tn
    rows = pl.ds(row0, tn)
    step = step_ref[0]
    nc = (step + uc) // uc  # DMA chunks covering positions <= step
    m = q_ref.shape[1]
    h = m // d_head
    nsub = uc // ucc
    seg = seg_ref[...]                      # (M, H) bf16 — scores/wexp
    segf = seg.astype(jnp.float32)          # exact f32 — alpha/denominator
    rsqrt = 1.0 / math.sqrt(d_head)
    lastc = nc - 1                          # chunk containing `step`

    def _copies(c):
        slot = jax.lax.rem(c, nbuf)
        upos = pl.ds(c * uc, uc)
        return (
            pltpu.make_async_copy(
                ck_ref.at[layer, rows, upos, :], ksc.at[slot], sems.at[0, slot]
            ),
            pltpu.make_async_copy(
                cv_ref.at[layer, rows, upos, :], vsc.at[slot], sems.at[1, slot]
            ),
        )

    def _flat_copies():
        # sems row 2/3 carry the once-per-invocation flat copies (columns
        # sized max(nbuf, 2) >= 2)
        cp = [pltpu.make_async_copy(mask_ref.at[:, rows, :], mall, sems.at[2, 0])]
        if quant:
            cp.append(pltpu.make_async_copy(
                ksl_ref.at[:, rows, :], kslall, sems.at[2, 1]
            ))
            cp.append(pltpu.make_async_copy(
                vsl_ref.at[:, rows, :], vslall, sems.at[3, 0]
            ))
        return cp

    def _wb_copies():
        # the WHOLE last chunk writes back (fresh k/v merged at `step`):
        # re-writing just-read bytes costs one chunk of extra DMA out of
        # ~nc chunks read, and avoids dynamic sub-chunk slicing
        upos = pl.ds(lastc * uc, uc)
        return (
            pltpu.make_async_copy(
                kwb, cko_ref.at[layer, rows, upos, :], sems.at[4, 0]
            ),
            pltpu.make_async_copy(
                vwb, cvo_ref.at[layer, rows, upos, :], sems.at[4, 1]
            ),
        )

    u_tot = ck_ref.shape[2]  # never statically address past the last chunk
    for cp in _flat_copies():
        cp.start()
    for b in range(min(nbuf, u_tot // uc)):
        @pl.when(b < nc)
        def _(b=b):
            for cp in _copies(b):
                cp.start()

    q = q_ref[...].astype(jnp.bfloat16)     # (TN, M)
    kh_f = kh_ref[...].astype(jnp.float32)
    vh_f = vh_ref[...].astype(jnp.float32)
    if quant:
        k_amax = jnp.maximum(jnp.max(jnp.abs(kh_f), axis=1, keepdims=True), 1e-6)
        v_amax = jnp.maximum(jnp.max(jnp.abs(vh_f), axis=1, keepdims=True), 1e-6)
        kq = jnp.clip(jnp.round(kh_f * (127.0 / k_amax)), -127, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vh_f * (127.0 / v_amax)), -127, 127).astype(jnp.int8)
        kso_ref[...] = jnp.broadcast_to(k_amax * (1.0 / 127.0), kso_ref.shape)
        vso_ref[...] = jnp.broadcast_to(v_amax * (1.0 / 127.0), vso_ref.shape)

    # The fresh token seeds the accumulators OPTIMISTICALLY (its pad-mask
    # bit is read during the loop; dynamic lane indexing is not a vector
    # op on TPU). The cumulative alpha product tracks exactly how the
    # seed has been rescaled, so if the bit turns out 0 the seed is
    # removed exactly at the end — same semantics as the whole-row
    # kernel's masked fresh token.
    prod_new = q * kh_ref[...].astype(jnp.bfloat16)
    s_new = jnp.dot(prod_new, seg, preferred_element_type=jnp.float32) * rsqrt
    mx = s_new                                          # (TN, H)
    den = jnp.ones((tn, h), jnp.float32)
    acc = vh_f                                          # (TN, M)
    aprod0 = jnp.ones((tn, h), jnp.float32)
    mflag[...] = jnp.zeros((tn, 1), jnp.int32)

    for cp in _flat_copies():
        cp.wait()

    def body(c, carry):
        mx, den, acc, aprod = carry
        for cp in _copies(c):
            cp.wait()
        slot = jax.lax.rem(c, nbuf)
        for b in range(nsub):
            # FULL explicit index tuples (a partial ref[slot] lowers
            # through jnp's gather, unsupported in Mosaic); sub-tile
            # offsets are static
            kst = ksc[slot, :, b * ucc:(b + 1) * ucc, :]   # (TN, UCC, M)
            vst = vsc[slot, :, b * ucc:(b + 1) * ucc, :]
            cc = c * nsub + b                              # sub-tile index
            msub = jax.lax.slice_in_dim(mall[cc, :, :], 0, ucc, axis=1)
            mchunk = msub[:, :, None]                      # (TN, UCC, 1)
            if quant:
                ksl_c = jax.lax.slice_in_dim(kslall[cc, :, :], 0, ucc, axis=1)
                vsl_c = jax.lax.slice_in_dim(vslall[cc, :, :], 0, ucc, axis=1)
                # minor-dim insert must happen on the f32 array — Mosaic
                # only supports non-no-op minor-dim insertion for 32-bit
                kd = kst.astype(jnp.bfloat16) * ksl_c[:, :, None].astype(jnp.bfloat16)
                vd = vst.astype(jnp.float32) * vsl_c[:, :, None]
            else:
                kd = kst.astype(jnp.bfloat16)
                vd = vst.astype(jnp.float32)
            pos3 = (jax.lax.broadcasted_iota(jnp.int32, (tn, ucc, 1), 1)
                    + cc * ucc)
            valid = (pos3 < step) & (mchunk != 0)
            vv = jnp.where(valid, vd, 0.0)
            prod = q[:, None, :] * kd
            scores = jnp.dot(
                prod.reshape(tn * ucc, m), seg,
                preferred_element_type=jnp.float32,
            ).reshape(tn, ucc, h) * rsqrt
            scores = jnp.where(valid, scores, NEG_INF)
            mxc = jnp.max(scores, axis=1)                  # (TN, H)
            new_mx = jnp.maximum(mx, mxc)
            alpha = jnp.exp(mx - new_mx)                   # (TN, H)
            e = jnp.exp(scores - new_mx[:, None, :])       # (TN, UCC, H)
            den = den * alpha + jnp.sum(e, axis=1)
            wexp = jnp.dot(
                e.astype(jnp.bfloat16).reshape(tn * ucc, h), seg.T,
                preferred_element_type=jnp.float32,
            ).reshape(tn, ucc, m)
            contrib = jnp.sum(wexp * vv, axis=1)           # (TN, M)
            alpha_m = jnp.dot(alpha, segf.T, preferred_element_type=jnp.float32)
            acc = acc * alpha_m + contrib
            mx = new_mx
            aprod = aprod * alpha
            # record the fresh token's mask bit when this sub-tile holds it
            mflag[...] = mflag[...] + jnp.sum(
                jnp.where(pos3 == step, mchunk, 0), axis=1
            )

        # last chunk: merge fresh k/v at `step` into the writeback buffers
        @pl.when(c == nc - 1)
        def _():
            posc = (jax.lax.broadcasted_iota(jnp.int32, (tn, uc, 1), 1)
                    + c * uc)
            at_step = posc == step
            kchunk = ksc[slot, :, :, :]
            vchunk = vsc[slot, :, :, :]
            if quant:
                kwb[...] = jnp.where(at_step, kq[:, None, :], kchunk)
                vwb[...] = jnp.where(at_step, vq[:, None, :], vchunk)
            else:
                kwb[...] = jnp.where(
                    at_step, kh_ref[...][:, None, :].astype(kwb.dtype), kchunk
                )
                vwb[...] = jnp.where(
                    at_step, vh_ref[...][:, None, :].astype(vwb.dtype), vchunk
                )
            wbk, wbv = _wb_copies()
            wbk.start()
            wbv.start()

        # prefetch chunk c+nbuf AFTER chunk c's slot has been consumed
        # (it reuses this slot; starting it before the reads above would
        # race the DMA against the compute). Chunks c+1..c+nbuf-1 are
        # already in flight, so nbuf-1 chunks of prefetch depth remain.
        @pl.when(c + nbuf < nc)
        def _():
            for cp in _copies(c + nbuf):
                cp.start()

        return mx, den, acc, aprod

    mx, den, acc, aprod = jax.lax.fori_loop(
        0, nc, body, (mx, den, acc, aprod0)
    )
    # remove the optimistic fresh-token seed where its mask bit was 0
    ok = mflag[...] > 0                                 # (TN, 1)
    den = den - jnp.where(jnp.broadcast_to(ok, den.shape), 0.0, aprod)
    aprod_m = jnp.dot(aprod, segf.T, preferred_element_type=jnp.float32)
    acc = acc - jnp.where(ok, 0.0, aprod_m * vh_f)
    den_m = jnp.dot(
        jnp.maximum(den, 1e-30), segf.T, preferred_element_type=jnp.float32
    )
    out_ref[...] = (acc / den_m).astype(out_ref.dtype)
    wbk, wbv = _wb_copies()
    wbk.wait()
    wbv.wait()


_PAGE = 32       # page size for SHORT (whole-row-kernel) paged caches
# page size for LONG (chunked-kernel) paged caches = DMA grain. Env knob
# for on-chip A/B: smaller pages shrink the active page's R/W traffic and
# per-row VPU work but double the chunk-loop iteration count.
_PAGE_LONG = int(os.environ.get("SATPU_PAGE_LONG", "64"))
_PDEPTH = 16     # in-flight per-(row, page) DMAs in the paged kernel


def _kernel_paged(step_ref, tbl_ref, asrc_ref, q_ref, kh_ref, vh_ref,
                  mask_ref, seg_ref, *rest, layer, tn, d_head, quant, page):
    """Paged-cache variant of the whole-row kernel (lazy beam reorder).

    The beam search never physically reorders a paged cache. Instead the
    cache carries an ownership table: COMPLETED ``page``-position pages
    of row ``n`` live at ``(tbl[n, p], p)`` of the main cache, and the
    ACTIVE page (the one containing ``step``) lives in a parity-slotted
    side buffer ``ak/av (L, N, 2, P, M)``: at step ``t`` the content of
    positions ``p_act*P .. t-1`` for row ``n`` was written at step
    ``t-1`` by row ``asrc[n]`` (this row's beam parent) into parity slot
    ``(t-1) % 2``. This kernel DMAs the live pages through that
    indirection (one descriptor per (row, page) — the descriptor-count
    price of indirection), computes the same masked softmax-attention as
    ``_kernel``, then writes the MERGED active page (parent content +
    fresh k/v at ``step``) to its OWN row: into parity slot ``t % 2``
    normally, or into the main cache when ``step`` completes the page.
    Writers and readers always touch opposite parity slots and no
    invocation reads the main-cache page being completed, so in-place
    aliasing stays race-free across grid tiles. The standalone
    beam-reorder pass — a full read+write of every live cache byte per
    step, as large as the attention reads themselves (BENCHMARKS.md) —
    disappears; reorder becomes an int-table gather in jnp.
    """
    if quant:
        (ksl_ref, vsl_ref, ck_ref, cv_ref, ak_ref, av_ref,
         out_ref, cko_ref, cvo_ref, ako_ref, avo_ref, kso_ref, vso_ref,
         ksc, vsc, kwb, vwb, sems) = rest
    else:
        (ck_ref, cv_ref, ak_ref, av_ref,
         out_ref, cko_ref, cvo_ref, ako_ref, avo_ref,
         ksc, vsc, kwb, vwb, sems) = rest
    i = pl.program_id(0)
    row0 = i * tn
    step = step_ref[0]
    p_act = step // page
    o = step - p_act * page
    par_w = jax.lax.rem(step, 2)
    par_r = jax.lax.rem(step + 1, 2)

    # ---- completed pages: one DMA pair per (row, page) via the table.
    # All copies are the same size, so semaphore slots can be reused in
    # issue order (same contract as beam_gather's pipeline).
    safe = jnp.maximum(p_act, 1)  # avoid div-by-0 when the loop is empty

    def cp(idx):
        r = idx // safe
        p = jax.lax.rem(idx, safe)
        src = tbl_ref[row0 + r, p]
        slot = jax.lax.rem(idx, _PDEPTH)
        return (
            pltpu.make_async_copy(
                ck_ref.at[layer, src, pl.ds(p * page, page), :],
                ksc.at[r, pl.ds(p * page, page), :],
                sems.at[0, slot],
            ),
            pltpu.make_async_copy(
                cv_ref.at[layer, src, pl.ds(p * page, page), :],
                vsc.at[r, pl.ds(p * page, page), :],
                sems.at[1, slot],
            ),
        )

    total = tn * p_act

    def start_body(idx, _):
        @pl.when(idx >= _PDEPTH)
        def _():
            for c in cp(idx - _PDEPTH):
                c.wait()

        for c in cp(idx):
            c.start()
        return 0

    jax.lax.fori_loop(0, total, start_body, 0)

    # ---- active page: per-row DMA from the beam parent's parity slot
    # (one semaphore slot PER ROW — the sems array is sized max(tn, 16),
    # so a row's wait can never be satisfied by another row's copy)
    def ap(r):
        src = asrc_ref[row0 + r]
        return (
            pltpu.make_async_copy(
                ak_ref.at[layer, src, par_r, :, :],
                ksc.at[r, pl.ds(p_act * page, page), :],
                sems.at[2, r],
            ),
            pltpu.make_async_copy(
                av_ref.at[layer, src, par_r, :, :],
                vsc.at[r, pl.ds(p_act * page, page), :],
                sems.at[3, r],
            ),
        )

    @pl.when(o > 0)
    def _():
        def ab(r, _):
            for c in ap(r):
                c.start()
            return 0

        jax.lax.fori_loop(0, tn, ab, 0)

    def drain(idx, _):
        for c in cp(idx):
            c.wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(total - _PDEPTH, 0), total, drain, 0)

    @pl.when(o > 0)
    def _():
        def aw(r, _):
            for c in ap(r):
                c.wait()
            return 0

        jax.lax.fori_loop(0, tn, aw, 0)

    # ---- compute: identical math to _kernel (fresh token replaces the
    # column at `step`, invalid positions zeroed before the value sum)
    u = ksc.shape[1]
    m = ksc.shape[2]
    h = m // d_head
    seg = seg_ref[...]
    pos3 = jax.lax.broadcasted_iota(jnp.int32, (tn, u, 1), 1)
    at_step = pos3 == step
    mask3 = mask_ref[...].astype(jnp.int32)[:, :, None]
    valid = (pos3 <= step) & (mask3 != 0)
    if quant:
        kh_f = kh_ref[...].astype(jnp.float32)
        vh_f = vh_ref[...].astype(jnp.float32)
        k_amax = jnp.maximum(jnp.max(jnp.abs(kh_f), axis=1, keepdims=True), 1e-6)
        v_amax = jnp.maximum(jnp.max(jnp.abs(vh_f), axis=1, keepdims=True), 1e-6)
        kq = jnp.clip(jnp.round(kh_f * (127.0 / k_amax)), -127, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vh_f * (127.0 / v_amax)), -127, 127).astype(jnp.int8)
        kso_ref[...] = jnp.broadcast_to(k_amax * (1.0 / 127.0), kso_ref.shape)
        vso_ref[...] = jnp.broadcast_to(v_amax * (1.0 / 127.0), vso_ref.shape)
        kd = ksc[...].astype(jnp.bfloat16) * ksl_ref[...][:, :, None].astype(jnp.bfloat16)
        vd = vsc[...].astype(jnp.float32) * vsl_ref[...][:, :, None]
    else:
        kd = ksc[...].astype(jnp.bfloat16)
        vd = vsc[...].astype(jnp.float32)
    kk = jnp.where(at_step, kh_ref[...][:, None, :].astype(jnp.bfloat16), kd)
    vv = jnp.where(at_step, vh_ref[...][:, None, :].astype(jnp.float32), vd)
    vv = jnp.where(valid | at_step, vv, 0.0)

    q = q_ref[...].astype(jnp.bfloat16)
    prod = q[:, None, :] * kk
    scores = jnp.dot(
        prod.reshape(tn * u, m), seg, preferred_element_type=jnp.float32
    ).reshape(tn, u, h) * (1.0 / math.sqrt(d_head))
    scores = jnp.where(valid, scores, NEG_INF)
    mx = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - mx)
    w = e / jnp.sum(e, axis=1, keepdims=True)
    wexp = jnp.dot(
        w.astype(jnp.bfloat16).reshape(tn * u, h), seg.T,
        preferred_element_type=jnp.float32,
    ).reshape(tn, u, m)
    out_ref[...] = jnp.sum(wexp * vv, axis=1).astype(out_ref.dtype)

    # ---- writeback: the MERGED active page (parent content at positions
    # < step, fresh k/v at `step`, junk beyond — never read: every later
    # step re-writes the full page before its positions become <= step)
    posP = jax.lax.broadcasted_iota(jnp.int32, (tn, page, 1), 1) + p_act * page
    atP = posP == step
    act_k = ksc[:, pl.ds(p_act * page, page), :]
    act_v = vsc[:, pl.ds(p_act * page, page), :]
    if quant:
        kwb[...] = jnp.where(atP, kq[:, None, :], act_k)
        vwb[...] = jnp.where(atP, vq[:, None, :], act_v)
    else:
        kwb[...] = jnp.where(atP, kh_ref[...][:, None, :].astype(kwb.dtype), act_k)
        vwb[...] = jnp.where(atP, vh_ref[...][:, None, :].astype(vwb.dtype), act_v)
    completes = o == (page - 1)

    @pl.when(completes)
    def _():
        wk = pltpu.make_async_copy(
            kwb, cko_ref.at[layer, pl.ds(row0, tn), pl.ds(p_act * page, page), :],
            sems.at[4, 0],
        )
        wv = pltpu.make_async_copy(
            vwb, cvo_ref.at[layer, pl.ds(row0, tn), pl.ds(p_act * page, page), :],
            sems.at[4, 1],
        )
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    @pl.when(jnp.logical_not(completes))
    def _():
        wk = pltpu.make_async_copy(
            kwb, ako_ref.at[layer, pl.ds(row0, tn), par_w, :, :], sems.at[4, 0]
        )
        wv = pltpu.make_async_copy(
            vwb, avo_ref.at[layer, pl.ds(row0, tn), par_w, :, :], sems.at[4, 1]
        )
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()


def _kernel_chunked_paged(step_ref, tbl_ref, asrc_ref, unif_ref, q_ref,
                          kh_ref, vh_ref, mask_ref, seg_ref, *rest, layer,
                          tn, uc, ucc, nbuf, d_head, quant, unif_mxu,
                          fused=False):
    """Paged variant of the chunked online-softmax kernel. The DMA grain
    equals the page size (``uc == _PAGE_LONG``), so every chunk is exactly
    one page: completed pages stream from their table-owner row (one
    descriptor per (row, page)), the ACTIVE page from the beam parent's
    parity slot, and the merged active page (parent content + fresh k/v
    at ``step``) is written back each step — to this row's opposite
    parity slot, or to the main cache when ``step`` completes the page.
    Same race-free aliasing argument as ``_kernel_paged``; same online
    softmax/fresh-seed math as ``_kernel_chunked`` (positions < step from
    chunks, the fresh token seeded optimistically with exact removal when
    masked).

    UNIFORM-page dedup: deep in a beam decode, completed pages are
    overwhelmingly SHARED across the beams of an utterance (the beam
    frontier only diverges near the tip, so old pages coalesce to one
    ancestor). When every row of this tile owns the same page
    (``unif_ref[i, c]``, precomputed in jnp from the ownership table),
    the page is DMAed ONCE into a shared (uc, m) buffer and the score
    math broadcasts it across the tile's rows — HBM bytes for that page
    drop tn-fold while the per-row elementwise compute is unchanged
    (the round-3 measured negative only rules out restructuring the
    compute into per-unique-page MXU matmuls, BENCHMARKS.md). The online
    -softmax accumulators live in VMEM scratch so the uniform/mixed
    paths can be disjoint ``pl.when`` branches."""
    if fused:
        # FUSED K+V layout: the main cache stores each logical page as
        # 2*uc consecutive positions [K-page, V-page] and the parity
        # slots hold (2*uc, m) fused pages, so every per-(row, page)
        # transfer is ONE descriptor + ONE semaphore op instead of two.
        # The traced 30 s decode is dominated by the scalar core issuing
        # per-row copy descriptors (~2k scalar DMA ops per invocation,
        # tiling-independent) — fusing halves exactly that.
        if quant:
            (ksl_ref, vsl_ref, ck_ref, ak_ref,
             out_ref, cko_ref, ako_ref, kso_ref, vso_ref,
             ksc, ksu, mall, kslall, vslall, kwb, mflag,
             amx, aden, aacc, aprd, sems, csems, usems) = rest
        else:
            (ck_ref, ak_ref, out_ref, cko_ref, ako_ref,
             ksc, ksu, mall, kwb, mflag,
             amx, aden, aacc, aprd, sems, csems, usems) = rest
        cv_ref = av_ref = cvo_ref = avo_ref = vsc = vsu = vwb = None
    elif quant:
        (ksl_ref, vsl_ref, ck_ref, cv_ref, ak_ref, av_ref,
         out_ref, cko_ref, cvo_ref, ako_ref, avo_ref, kso_ref, vso_ref,
         ksc, vsc, ksu, vsu, mall, kslall, vslall, kwb, vwb, mflag,
         amx, aden, aacc, aprd, sems, csems, usems) = rest
    else:
        (ck_ref, cv_ref, ak_ref, av_ref,
         out_ref, cko_ref, cvo_ref, ako_ref, avo_ref,
         ksc, vsc, ksu, vsu, mall, kwb, vwb, mflag,
         amx, aden, aacc, aprd, sems, csems, usems) = rest
    ucd = 2 * uc if fused else uc  # DMA rows per (logical) page
    i = pl.program_id(0)
    row0 = i * tn
    rows = pl.ds(row0, tn)
    step = step_ref[0]
    nc = (step + uc) // uc   # pages covering positions <= step
    lastc = nc - 1           # the ACTIVE page (contains `step`)
    o = step - lastc * uc
    par_w = jax.lax.rem(step, 2)
    par_r = jax.lax.rem(step + 1, 2)
    m = q_ref.shape[1]
    h = m // d_head
    nsub = uc // ucc
    seg = seg_ref[...]
    segf = seg.astype(jnp.float32)
    rsqrt = 1.0 / math.sqrt(d_head)

    # ---- per-(row, page) DMAs; active page branches to the parity slot.
    # Both per-row branches move the same byte count on the same
    # (slot, row) semaphore, so waits stay uniform. A UNIFORM completed
    # page takes the single-DMA branch instead (own ksu/vsu buffers +
    # usems semaphores — start/wait branch on the same deterministic
    # ``unif_ref[i, c]`` value, so they always pair up).
    def _is_unif(c):
        return (c != lastc) & (unif_ref[i, c] != 0)

    def _unif_copies(c, slot):
        src = tbl_ref[row0, c]  # all rows of the tile agree
        cps = [
            pltpu.make_async_copy(
                ck_ref.at[layer, src, pl.ds(c * ucd, ucd), :],
                ksu.at[slot], usems.at[0, slot],
            ),
        ]
        if not fused:
            cps.append(pltpu.make_async_copy(
                cv_ref.at[layer, src, pl.ds(c * uc, uc), :],
                vsu.at[slot], usems.at[1, slot],
            ))
        return cps

    def _row_copies(c, slot, r):
        """Per-row copies for a MIXED completed chunk (one fused descriptor,
        or a K/V pair in the legacy split layout)."""
        src = tbl_ref[row0 + r, c]
        cps = [pltpu.make_async_copy(
            ck_ref.at[layer, src, pl.ds(c * ucd, ucd), :],
            ksc.at[slot, r], csems.at[0, slot, r],
        )]
        if not fused:
            cps.append(pltpu.make_async_copy(
                cv_ref.at[layer, src, pl.ds(c * uc, uc), :],
                vsc.at[slot, r], csems.at[1, slot, r],
            ))
        return cps

    # active-page DMA granule: positions beyond the fresh token are junk
    # (masked in compute, rewritten before becoming live), so granules
    # past `o` are never transferred — on average ~25% of the active
    # page's R/W bytes at grd=32 (kept at 32: int8 HBM tiling is
    # (32, 128), so 32-row slices stay tile-aligned)
    grd = 32 if uc % 32 == 0 else uc

    def _act_op(slot, r, start):
        """Per-row granule copies for the ACTIVE page (beam parent's
        parity slot); start/wait branch on the same deterministic
        position predicate, so they always pair up."""
        src = asrc_ref[row0 + r]
        for g in range(uc // grd):
            lo = g * grd

            @pl.when(lastc * uc + lo <= step)
            def _(lo=lo):
                cps = [pltpu.make_async_copy(
                    ak_ref.at[layer, src, par_r, pl.ds(lo, grd), :],
                    ksc.at[slot, r, pl.ds(lo, grd), :], csems.at[0, slot, r],
                )]
                if fused:
                    cps.append(pltpu.make_async_copy(
                        ak_ref.at[layer, src, par_r, pl.ds(uc + lo, grd), :],
                        ksc.at[slot, r, pl.ds(uc + lo, grd), :],
                        csems.at[0, slot, r],
                    ))
                else:
                    cps.append(pltpu.make_async_copy(
                        av_ref.at[layer, src, par_r, pl.ds(lo, grd), :],
                        vsc.at[slot, r, pl.ds(lo, grd), :], csems.at[1, slot, r],
                    ))
                for cp in cps:
                    cp.start() if start else cp.wait()

    def _chunk_op(c, start):
        slot = jax.lax.rem(c, nbuf)

        @pl.when(_is_unif(c))
        def _():
            for cp in _unif_copies(c, slot):
                cp.start() if start else cp.wait()

        @pl.when((c != lastc) & jnp.logical_not(_is_unif(c)))
        def _():
            def b(r, _):
                for cp in _row_copies(c, slot, r):
                    cp.start() if start else cp.wait()
                return 0

            jax.lax.fori_loop(0, tn, b, 0)

        @pl.when(c == lastc)
        def _():
            def b(r, _):
                _act_op(slot, r, start)
                return 0

            jax.lax.fori_loop(0, tn, b, 0)

    def _start_chunk(c):
        _chunk_op(c, True)

    def _wait_chunk(c):
        _chunk_op(c, False)

    def _flat_copies():
        cp = [pltpu.make_async_copy(mask_ref.at[:, rows, :], mall, sems.at[2, 0])]
        if quant:
            cp.append(pltpu.make_async_copy(
                ksl_ref.at[:, rows, :], kslall, sems.at[2, 1]
            ))
            cp.append(pltpu.make_async_copy(
                vsl_ref.at[:, rows, :], vslall, sems.at[3, 0]
            ))
        return cp

    completes = o == (uc - 1)

    n_pages = ck_ref.shape[2] // ucd  # never statically address past the end
    for cp in _flat_copies():
        cp.start()
    for b in range(min(nbuf, n_pages)):
        @pl.when(b < nc)
        def _(b=b):
            _start_chunk(b)

    q = q_ref[...].astype(jnp.bfloat16)
    kh_f = kh_ref[...].astype(jnp.float32)
    vh_f = vh_ref[...].astype(jnp.float32)
    if quant:
        k_amax = jnp.maximum(jnp.max(jnp.abs(kh_f), axis=1, keepdims=True), 1e-6)
        v_amax = jnp.maximum(jnp.max(jnp.abs(vh_f), axis=1, keepdims=True), 1e-6)
        kq = jnp.clip(jnp.round(kh_f * (127.0 / k_amax)), -127, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vh_f * (127.0 / v_amax)), -127, 127).astype(jnp.int8)
        kso_ref[...] = jnp.broadcast_to(k_amax * (1.0 / 127.0), kso_ref.shape)
        vso_ref[...] = jnp.broadcast_to(v_amax * (1.0 / 127.0), vso_ref.shape)

    prod_new = q * kh_ref[...].astype(jnp.bfloat16)
    s_new = jnp.dot(prod_new, seg, preferred_element_type=jnp.float32) * rsqrt
    # online-softmax accumulators live in scratch so the uniform/mixed
    # compute branches (disjoint pl.when bodies) can both update them
    amx[...] = s_new
    aden[...] = jnp.ones((tn, h), jnp.float32)
    aacc[...] = vh_f
    aprd[...] = jnp.ones((tn, h), jnp.float32)
    mflag[...] = jnp.zeros((tn, 1), jnp.int32)

    if unif_mxu:
        # head-expanded queries for the uniform-page MXU path, built once
        # per tile: qseg[r*h + j, d] = q[r, d] * [d // d_head == j]. The
        # multiply is by 0/1, so qseg is EXACT (no extra rounding); it
        # turns the per-head QK dot into one (tn*h, m) @ (ucc, m)^T matmul
        hh = jax.lax.broadcasted_iota(jnp.int32, (h, m), 0)
        dh = jax.lax.broadcasted_iota(jnp.int32, (h, m), 1) // d_head
        segT = (dh == hh).astype(jnp.bfloat16)           # (h, m) = seg.T
        qseg = (q[:, None, :] * segT[None, :, :]).reshape(tn * h, m)
        segT_f = segT.astype(jnp.float32)

    for cp in _flat_copies():
        cp.wait()

    def _subtile_update_unif(kst_b, vst_b, msub, ksl_c, vsl_c):
        """Uniform-page sub-tile update with MXU matmuls: all tn rows share
        the page's K/V bytes, so QK^T is one (tn*h, m) x (ucc, m)^T matmul
        against the head-expanded queries and PV one (tn*h, ucc) x (ucc, m)
        matmul followed by a seg-select — ~7x less VPU elementwise work
        than the broadcast path (the traced 30 s decode is VPU-bound, not
        DMA-bound: a 6x HBM-byte cut moved the deep step only 18%). int8
        dequant stays exactly PER ROW: the K scale factors out of the dot
        (applied to the (tn, h, ucc) scores) and the V scale folds into
        the softmax weights before the PV matmul — only the raw shared
        int8 bytes enter the MXU. Only COMPLETED pages take this path, so
        every position is < step (no fresh-token tracking; cache contents
        are finite by construction) and validity is the pad mask alone."""
        valid = msub != 0                                  # (tn, ucc)
        s2 = jax.lax.dot_general(
            qseg, kst_b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (tn*h, ucc)
        s3 = s2.reshape(tn, h, ucc) * rsqrt
        if quant:
            s3 = s3 * ksl_c[:, None, :]
        s3 = jnp.where(valid[:, None, :], s3, NEG_INF)
        mx = amx[...]
        new_mx = jnp.maximum(mx, jnp.max(s3, axis=2))
        alpha = jnp.exp(mx - new_mx)
        e = jnp.exp(s3 - new_mx[:, :, None])               # masked -> exp(-inf)=0
        aden[...] = aden[...] * alpha + jnp.sum(e, axis=2)
        if quant:
            ew = e * vsl_c[:, None, :]
        else:
            ew = e
        ctx = jax.lax.dot_general(
            ew.astype(jnp.bfloat16).reshape(tn * h, ucc), vst_b,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tn, h, m)
        contrib = jnp.sum(ctx * segT_f[None, :, :], axis=1)  # (tn, m)
        alpha_m = jnp.dot(alpha, segf.T, preferred_element_type=jnp.float32)
        aacc[...] = aacc[...] * alpha_m + contrib
        amx[...] = new_mx
        aprd[...] = aprd[...] * alpha

    def _subtile_update(kd, vd, pos0, mchunk, track_step):
        """One sub-tile's online-softmax update over positions
        ``pos0 .. pos0 + X`` (X = kd.shape[1], normally ucc but the ACTIVE
        page is processed in smaller granules so invalid tails can be
        skipped at the pl.when level). ``kd``/``vd`` may be (TN, X, M)
        (per-row path) or (1, X, M) (uniform page, broadcast)."""
        x = kd.shape[1]
        pos3 = (jax.lax.broadcasted_iota(jnp.int32, (tn, x, 1), 1) + pos0)
        valid = (pos3 < step) & (mchunk != 0)
        vv = jnp.where(valid, vd, 0.0)
        prod = q[:, None, :] * kd
        scores = jnp.dot(
            prod.reshape(tn * x, m), seg,
            preferred_element_type=jnp.float32,
        ).reshape(tn, x, h) * rsqrt
        scores = jnp.where(valid, scores, NEG_INF)
        mx = amx[...]
        mxc = jnp.max(scores, axis=1)
        new_mx = jnp.maximum(mx, mxc)
        alpha = jnp.exp(mx - new_mx)
        e = jnp.exp(scores - new_mx[:, None, :])
        aden[...] = aden[...] * alpha + jnp.sum(e, axis=1)
        wexp = jnp.dot(
            e.astype(jnp.bfloat16).reshape(tn * x, h), seg.T,
            preferred_element_type=jnp.float32,
        ).reshape(tn, x, m)
        contrib = jnp.sum(wexp * vv, axis=1)
        alpha_m = jnp.dot(alpha, segf.T, preferred_element_type=jnp.float32)
        aacc[...] = aacc[...] * alpha_m + contrib
        amx[...] = new_mx
        aprd[...] = aprd[...] * alpha
        if track_step:
            mflag[...] = mflag[...] + jnp.sum(
                jnp.where(pos3 == step, mchunk, 0), axis=1
            )

    def _wb_op(start):
        """Granule writeback of the merged active page: granules past the
        fresh token hold junk that is never read before being rewritten,
        so they are skipped (same predicate as the read side). On page
        completion every predicate is true, so the FULL page lands in the
        main cache."""
        for g in range(uc // grd):
            lo = g * grd

            @pl.when(lastc * uc + lo <= step)
            def _(lo=lo):
                @pl.when(completes)
                def _():
                    cps = [pltpu.make_async_copy(
                        kwb.at[:, pl.ds(lo, grd), :],
                        cko_ref.at[layer, rows, pl.ds(lastc * ucd + lo, grd), :],
                        sems.at[4, 0],
                    )]
                    if fused:
                        cps.append(pltpu.make_async_copy(
                            kwb.at[:, pl.ds(uc + lo, grd), :],
                            cko_ref.at[
                                layer, rows, pl.ds(lastc * ucd + uc + lo, grd), :
                            ],
                            sems.at[4, 0],
                        ))
                    else:
                        cps.append(pltpu.make_async_copy(
                            vwb.at[:, pl.ds(lo, grd), :],
                            cvo_ref.at[layer, rows, pl.ds(lastc * uc + lo, grd), :],
                            sems.at[4, 1],
                        ))
                    for cp in cps:
                        cp.start() if start else cp.wait()

                @pl.when(jnp.logical_not(completes))
                def _():
                    cps = [pltpu.make_async_copy(
                        kwb.at[:, pl.ds(lo, grd), :],
                        ako_ref.at[layer, rows, par_w, pl.ds(lo, grd), :],
                        sems.at[4, 0],
                    )]
                    if fused:
                        cps.append(pltpu.make_async_copy(
                            kwb.at[:, pl.ds(uc + lo, grd), :],
                            ako_ref.at[layer, rows, par_w, pl.ds(uc + lo, grd), :],
                            sems.at[4, 0],
                        ))
                    else:
                        cps.append(pltpu.make_async_copy(
                            vwb.at[:, pl.ds(lo, grd), :],
                            avo_ref.at[layer, rows, par_w, pl.ds(lo, grd), :],
                            sems.at[4, 1],
                        ))
                    for cp in cps:
                        cp.start() if start else cp.wait()

    def body(c, carry):
        _wait_chunk(c)
        slot = jax.lax.rem(c, nbuf)

        @pl.when(_is_unif(c))
        def _():
            for b in range(nsub):
                cc = c * nsub + b
                kst = ksu[slot, b * ucc:(b + 1) * ucc, :]   # (UCC, M)
                vst = (ksu[slot, uc + b * ucc:uc + (b + 1) * ucc, :]
                       if fused else vsu[slot, b * ucc:(b + 1) * ucc, :])
                msub = jax.lax.slice_in_dim(mall[cc, :, :], 0, ucc, axis=1)
                ksl_c = vsl_c = None
                if quant:
                    # scales stay per OWN row (physically reordered by
                    # the beam search) — only the page BYTES are shared
                    ksl_c = jax.lax.slice_in_dim(kslall[cc, :, :], 0, ucc, axis=1)
                    vsl_c = jax.lax.slice_in_dim(vslall[cc, :, :], 0, ucc, axis=1)
                if unif_mxu:
                    _subtile_update_unif(
                        kst.astype(jnp.bfloat16), vst.astype(jnp.bfloat16),
                        msub, ksl_c, vsl_c,
                    )
                    continue
                mchunk = msub[:, :, None]
                if quant:
                    kd = (kst.astype(jnp.bfloat16)[None, :, :]
                          * ksl_c[:, :, None].astype(jnp.bfloat16))
                    vd = vst.astype(jnp.float32)[None, :, :] * vsl_c[:, :, None]
                else:
                    kd = kst.astype(jnp.bfloat16)[None, :, :]
                    vd = vst.astype(jnp.float32)[None, :, :]
                # completed pages never contain `step`
                _subtile_update(kd, vd, cc * ucc, mchunk, track_step=False)

        def _mixed_granule(b, g0, gw, track_step):
            """Per-row online-softmax update over granule columns
            [g0, g0+gw) of sub-tile b of chunk c (dequant + update)."""
            kst = ksc[slot, :, b * ucc + g0:b * ucc + g0 + gw, :]
            vst = (ksc[slot, :, uc + b * ucc + g0:uc + b * ucc + g0 + gw, :]
                   if fused else vsc[slot, :, b * ucc + g0:b * ucc + g0 + gw, :])
            cc = c * nsub + b
            msub = jax.lax.slice_in_dim(mall[cc, :, :], g0, g0 + gw, axis=1)
            mchunk = msub[:, :, None]
            if quant:
                ksl_c = jax.lax.slice_in_dim(kslall[cc, :, :], g0, g0 + gw, axis=1)
                vsl_c = jax.lax.slice_in_dim(vslall[cc, :, :], g0, g0 + gw, axis=1)
                kd = kst.astype(jnp.bfloat16) * ksl_c[:, :, None].astype(jnp.bfloat16)
                vd = vst.astype(jnp.float32) * vsl_c[:, :, None]
            else:
                kd = kst.astype(jnp.bfloat16)
                vd = vst.astype(jnp.float32)
            _subtile_update(kd, vd, cc * ucc + g0, mchunk, track_step=track_step)

        @pl.when(jnp.logical_not(_is_unif(c)) & (c != lastc))
        def _():
            # completed mixed pages: all positions < step, full sub-tiles
            for b in range(nsub):
                _mixed_granule(b, 0, ucc, track_step=False)

        @pl.when(c == lastc)
        def _():
            # ACTIVE page compute: only positions <= step are live (o+1 of
            # uc), and this per-row VPU path is the kernel's densest
            # elementwise work — skip whole granules beyond the fresh
            # token instead of exp-ing masked -inf columns
            gr = 16 if ucc % 16 == 0 else ucc
            for b in range(nsub):
                for g in range(ucc // gr):
                    @pl.when(c * uc + b * ucc + g * gr <= step)
                    def _(b=b, g=g):
                        _mixed_granule(b, g * gr, gr, track_step=True)

        # active page: merge fresh k/v at `step`, write back to the
        # opposite parity slot (or the main cache when the page completes)
        @pl.when(c == lastc)
        def _():
            fk = kq if quant else kh_ref[...].astype(kwb.dtype)
            fv = vq if quant else vh_ref[...].astype(kwb.dtype)
            if fused:
                # merged fused page: K half with the fresh key at local
                # offset o, V half (rows uc..2uc) with the fresh value
                ii = jax.lax.broadcasted_iota(jnp.int32, (tn, 2 * uc, 1), 1)
                kwb[...] = jnp.where(
                    ii == o, fk[:, None, :],
                    jnp.where(ii == uc + o, fv[:, None, :], ksc[slot]),
                )
            else:
                posc = (jax.lax.broadcasted_iota(jnp.int32, (tn, uc, 1), 1)
                        + c * uc)
                at_step = posc == step
                kwb[...] = jnp.where(at_step, fk[:, None, :], ksc[slot])
                vwb[...] = jnp.where(at_step, fv[:, None, :], vsc[slot])

            _wb_op(start=True)

        @pl.when(c + nbuf < nc)
        def _():
            _start_chunk(c + nbuf)

        return 0

    jax.lax.fori_loop(0, nc, body, 0)
    ok = mflag[...] > 0
    aprod = aprd[...]
    den = aden[...] - jnp.where(jnp.broadcast_to(ok, aden.shape), 0.0, aprod)
    aprod_m = jnp.dot(aprod, segf.T, preferred_element_type=jnp.float32)
    acc = aacc[...] - jnp.where(ok, 0.0, aprod_m * vh_f)
    den_m = jnp.dot(
        jnp.maximum(den, 1e-30), segf.T, preferred_element_type=jnp.float32
    )
    out_ref[...] = (acc / den_m).astype(out_ref.dtype)

    _wb_op(start=False)


_VMEM_BUDGET = 10 * 2**20  # k+v scratch tiles together


def max_u_whole_row(m: int, itemsize: int) -> int:
    """Largest cache length U the WHOLE-ROW kernel holds in VMEM at the
    minimum row tile. Beyond this the chunked online-softmax kernel takes
    over (it streams U in double-buffered chunks, so its VMEM use is
    independent of U). The budget is deliberately below the 16 MB/core
    physical VMEM: the kernel body also materializes (tn, u, m)-extent
    temporaries (bf16 product, f32 value/wexp) that this estimate does not
    itemize (ADVICE r2) — the margin absorbs them, and the chunked path
    makes an over-estimate harmless (a longer U switches kernels instead
    of failing the Mosaic compile or falling back to jnp)."""
    return _VMEM_BUDGET // (2 * 8 * m * itemsize)


def max_u_for_kernel(m: int, itemsize: int) -> int:
    """Largest cache length U servable by SOME kernel path. The chunked
    kernel streams U, so the bound is the pad-mask/scale VMEM footprint —
    far beyond any real decode; callers treat this as 'no practical cap'."""
    return 16384


def _pick_tile(n: int, u: int, m: int, itemsize: int) -> int:
    for tn in (32, 16, 24, 48, 8):
        if n % tn == 0 and 2 * tn * u * m * itemsize <= _VMEM_BUDGET:
            return tn
    return 8 if n % 8 == 0 else n


def _pick_chunk(n: int, u: int, m: int, itemsize: int) -> tuple[int, int, int, int]:
    """(tn, uc, ucc, nbuf) for the chunked kernel.

    DMA grain (uc) and compute tile (ucc) are decoupled: big chunks keep
    in-flight bytes above the DMA latency-bandwidth product (~1.5 MB),
    small sub-tiles bound the (tn, ucc, m)-extent f32/bf16 compute
    temporaries (~16 B/elem). VMEM model: nbuf k + nbuf v chunk buffers +
    2 full-chunk writeback buffers + sub-tile temporaries. The budget sits
    well under the 16 MB scoped-vmem limit because Mosaic's actual stack
    exceeds this model by ~4 MB (measured: a 12.58 MB-modeled int8 config
    compiled to a 16.71 MB stack and OOMed)."""
    budget = 9 * 2**20
    for uc in (512, 256, 128, 64, 32, 16, 8):
        for tn in (16, 8):
            if n % tn or u % uc:
                continue
            for nbuf in (3, 2):
                ucc = min(uc, 32)
                need = (
                    tn * uc * m * itemsize * (2 * nbuf + 2)
                    + tn * ucc * m * 16
                )
                if need <= budget:
                    return tn, uc, ucc, nbuf
    return (8 if n % 8 == 0 else n), 8, 8, 2


@functools.partial(jax.jit, static_argnames=("layer", "d_head", "interpret"))
def _attn_step_call(q, kh, vh, mask, cache_k, cache_v, step, seg,
                    layer, d_head, interpret=False, k_scale=None, v_scale=None):
    n, m = q.shape
    l, _, u, _ = cache_k.shape
    quant = cache_k.dtype == jnp.int8
    eff_itemsize = max(cache_k.dtype.itemsize, 2)
    chunked = u > max_u_whole_row(m, eff_itemsize)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    if chunked:
        tn, uc, ucc, nbuf = _pick_chunk(n, u, m, cache_k.dtype.itemsize)
    else:
        tn = _pick_tile(n, u, m, eff_itemsize)
    row_spec = pl.BlockSpec((tn, m), lambda i, s: (i, 0))
    ul_spec = pl.BlockSpec((tn, u), lambda i, s: (i, 0))
    # chunked mode streams mask/scale chunks by in-kernel DMA — pinned to
    # HBM (an ANY-placed small array can land in VMEM, where sub-tile lane
    # slices are not DMA-able); whole-row mode takes them as VMEM blocks
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    flat_spec = hbm_spec if chunked else ul_spec
    in_specs = [
        row_spec, row_spec, row_spec, flat_spec,
        pl.BlockSpec((m, m // d_head), lambda i, s: (0, 0)),
    ]
    out_specs = [row_spec, any_spec, any_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n, m), jnp.float32),
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
    ]
    def _prechunk(a, dtype):
        # (N, U) -> (U/ucc, N, max(ucc, 128)): SUB-TILE index leading (the
        # only dynamically-indexable axis in-kernel), minor padded to a
        # full 128-lane tile (sub-tile lane slices are not DMA-able)
        a = a.astype(dtype).reshape(n, u // ucc, ucc)
        if ucc < 128:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - ucc)))
        return a.transpose(1, 0, 2)

    if chunked:
        mask = _prechunk(mask, jnp.int32)
    operands = [step, q, kh, vh, mask, seg]
    if quant:
        in_specs += [flat_spec, flat_spec]  # per-(row, position) dequant scales
        if chunked:
            k_scale = _prechunk(k_scale, jnp.float32)
            v_scale = _prechunk(v_scale, jnp.float32)
        operands += [k_scale, v_scale]
        sc_spec = pl.BlockSpec((tn, 128), lambda i, s: (i, 0))
        out_specs += [sc_spec, sc_spec]
        out_shape += [
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
        ]
        aliases = {8: 1, 9: 2}
    else:
        aliases = {6: 1, 7: 2}
    in_specs += [any_spec, any_spec]
    operands += [cache_k, cache_v]
    if chunked:
        ml = max(ucc, 128)  # mask/scale sub-tile lane width (tile-padded)
        nsub_tot = u // ucc
        scratch = [
            pltpu.VMEM((nbuf, tn, uc, m), cache_k.dtype),
            pltpu.VMEM((nbuf, tn, uc, m), cache_v.dtype),
            pltpu.VMEM((nsub_tot, tn, ml), jnp.int32),
        ]
        if quant:
            scratch += [
                pltpu.VMEM((nsub_tot, tn, ml), jnp.float32),
                pltpu.VMEM((nsub_tot, tn, ml), jnp.float32),
            ]
        scratch += [
            pltpu.VMEM((tn, uc, m), cache_k.dtype),
            pltpu.VMEM((tn, uc, m), cache_v.dtype),
            pltpu.VMEM((tn, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((5, max(nbuf, 2))),
        ]
        kernel = functools.partial(
            _kernel_chunked, layer=layer, tn=tn, uc=uc, ucc=ucc, nbuf=nbuf,
            d_head=d_head, quant=quant,
        )
    else:
        scratch = [
            pltpu.VMEM((tn, u, m), cache_k.dtype),
            pltpu.VMEM((tn, u, m), cache_v.dtype),
            pltpu.VMEM((tn, _CU, m), cache_k.dtype),
            pltpu.VMEM((tn, _CU, m), cache_v.dtype),
            pltpu.SemaphoreType.DMA((3, u // _CU)),
        ]
        kernel = functools.partial(
            _kernel, layer=layer, tn=tn, d_head=d_head, quant=quant
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tn,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # cache operands alias the cache outputs: the kernel updates
        # position `step` in place (operand indices include the
        # scalar-prefetch arg at 0)
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * u * m,
            bytes_accessed=2 * n * u * m * cache_k.dtype.itemsize,
            transcendentals=n * u * (m // d_head),
        ),
        interpret=interpret,
    )(*operands)


def _pick_chunk_paged(n: int, m: int, itemsize: int) -> tuple[int, int, int, int]:
    """(tn, uc, ucc, nbuf) for the paged chunked kernel: the DMA grain is
    pinned to the page size (uc = _PAGE_LONG) so every chunk reads exactly
    one page through the ownership table; tn/nbuf fit the same VMEM model
    as _pick_chunk. SATPU_CHUNK_{TN,UCC,NBUF} override for tuning runs
    (e.g. tn=16/ucc=16 halves the grid-tile count at the same VMEM)."""
    import os

    budget = 14 * 2**20
    uc = _PAGE_LONG
    env_tn = int(os.environ.get("SATPU_CHUNK_TN", "0"))
    env_ucc = int(os.environ.get("SATPU_CHUNK_UCC", "0"))
    env_nbuf = int(os.environ.get("SATPU_CHUNK_NBUF", "0"))
    if env_tn and n % env_tn == 0:
        return env_tn, uc, env_ucc or min(uc, 32), env_nbuf or 2
    # candidate order is measured, not modeled: the 30 s int8 decode is
    # dominated by a fixed per-(grid-tile, chunk-iteration) cost, so
    # FEWER, BIGGER tiles win — the measured ladder is 8/32/3 16.22
    # ms/step, 16/32/2 14.90, 16/64/2 13.31, 24/64/2 12.85, and 48/64/2
    # VMEM-OOMs at exactly the explicit-scratch sum (19.01M vs the 16M
    # scoped-vmem limit), which validates the model below: the scoped
    # stack holds the chunk double-buffers + shared uniform pages + the
    # writeback buffer (fused-KV accounting, 2*uc rows per page); compute
    # temporaries are not scoped-stack. 14M budget leaves ~2M for the
    # mask/scale/accumulator scratch (BENCHMARKS.md round 4).
    for tn, ucc, nbuf in ((24, min(uc, 64), 2), (16, min(uc, 64), 2),
                          (16, 32, 2), (8, min(uc, 64), 2),
                          (8, 32, 3), (8, 32, 2)):
        if n % tn or ucc > uc or uc % ucc:
            continue
        need = (
            (nbuf + 1) * tn * 2 * uc * m * itemsize
            + nbuf * 2 * uc * m * itemsize  # shared uniform-page buffers
        )
        if need <= budget:
            return tn, uc, ucc, nbuf
    return (8 if n % 8 == 0 else n), uc, min(uc, 32), 2


@functools.partial(jax.jit, static_argnames=("layer", "d_head", "interpret"))
def _attn_step_paged_call(q, kh, vh, mask, cache_k, cache_v, act_k, act_v,
                          table, act_src, step, seg, layer, d_head,
                          interpret=False, k_scale=None, v_scale=None):
    n, m = q.shape
    l, _, u, _ = cache_k.shape
    page = u // table.shape[1]  # 32 whole-row / 64 chunked (make_kv_cache)
    assert act_k.shape[3] == page, (act_k.shape, page)
    quant = cache_k.dtype == jnp.int8
    eff_itemsize = max(cache_k.dtype.itemsize, 2)
    chunked = u > max_u_whole_row(m, eff_itemsize)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    if chunked:
        assert page == _PAGE_LONG, (page, u)
        tn, uc, ucc, nbuf = _pick_chunk_paged(n, m, cache_k.dtype.itemsize)
    else:
        tn = _pick_tile(n, u, m, eff_itemsize)
    row_spec = pl.BlockSpec((tn, m), lambda i, *_: (i, 0))
    ul_spec = pl.BlockSpec((tn, u), lambda i, *_: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    flat_spec = hbm_spec if chunked else ul_spec
    in_specs = [
        row_spec, row_spec, row_spec, flat_spec,
        pl.BlockSpec((m, m // d_head), lambda i, *_: (0, 0)),
    ]
    out_specs = [row_spec, any_spec, any_spec, any_spec, any_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n, m), jnp.float32),
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        jax.ShapeDtypeStruct(act_k.shape, act_k.dtype),
        jax.ShapeDtypeStruct(act_v.shape, act_v.dtype),
    ]

    def _prechunk(a, dtype):
        # (N, U) -> (U/ucc, N, max(ucc, 128)); see _attn_step_call
        a = a.astype(dtype).reshape(n, u // ucc, ucc)
        if ucc < 128:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - ucc)))
        return a.transpose(1, 0, 2)

    if chunked:
        mask = _prechunk(mask, jnp.int32)
        # uniform-page flags: 1 where every row of a tile owns the same
        # completed page (deep decode coalesces old pages to one beam
        # ancestor) — the kernel then DMAs that page ONCE and broadcasts
        nt = n // tn
        tblr = table.reshape(nt, tn, table.shape[1])
        unif = jnp.all(tblr == tblr[:, :1, :], axis=1).astype(jnp.int32)
        operands = [step, table, act_src, unif, q, kh, vh, mask, seg]
        nsp = 4
    else:
        operands = [step, table, act_src, q, kh, vh, mask, seg]
        nsp = 3
    if quant:
        in_specs += [flat_spec, flat_spec]
        if chunked:
            k_scale = _prechunk(k_scale, jnp.float32)
            v_scale = _prechunk(v_scale, jnp.float32)
        operands += [k_scale, v_scale]
        sc_spec = pl.BlockSpec((tn, 128), lambda i, *_: (i, 0))
        out_specs += [sc_spec, sc_spec]
        out_shape += [
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
        ]
        aliases = {nsp + 7: 1, nsp + 8: 2, nsp + 9: 3, nsp + 10: 4}
    else:
        aliases = {nsp + 5: 1, nsp + 6: 2, nsp + 7: 3, nsp + 8: 4}
    in_specs += [any_spec, any_spec, any_spec, any_spec]
    operands += [cache_k, cache_v, act_k, act_v]
    if chunked:
        ml = max(ucc, 128)
        nsub_tot = u // ucc
        h = m // d_head
        scratch = [
            pltpu.VMEM((nbuf, tn, uc, m), cache_k.dtype),
            pltpu.VMEM((nbuf, tn, uc, m), cache_v.dtype),
            pltpu.VMEM((nbuf, uc, m), cache_k.dtype),  # shared uniform pages
            pltpu.VMEM((nbuf, uc, m), cache_v.dtype),
            pltpu.VMEM((nsub_tot, tn, ml), jnp.int32),
        ]
        if quant:
            scratch += [
                pltpu.VMEM((nsub_tot, tn, ml), jnp.float32),
                pltpu.VMEM((nsub_tot, tn, ml), jnp.float32),
            ]
        scratch += [
            pltpu.VMEM((tn, uc, m), cache_k.dtype),
            pltpu.VMEM((tn, uc, m), cache_v.dtype),
            pltpu.VMEM((tn, 1), jnp.int32),
            pltpu.VMEM((tn, h), jnp.float32),   # online-softmax accumulators
            pltpu.VMEM((tn, h), jnp.float32),
            pltpu.VMEM((tn, m), jnp.float32),
            pltpu.VMEM((tn, h), jnp.float32),
            pltpu.SemaphoreType.DMA((5, max(nbuf, 2))),
            pltpu.SemaphoreType.DMA((2, nbuf, tn)),
            pltpu.SemaphoreType.DMA((2, nbuf)),
        ]
        kernel = functools.partial(
            _kernel_chunked_paged, layer=layer, tn=tn, uc=uc, ucc=ucc,
            nbuf=nbuf, d_head=d_head, quant=quant,
            # SATPU_UNIF_MXU=0 restores the broadcast (per-row VPU) compute
            # for uniform pages — A/B knob for the MXU restructure
            unif_mxu=os.environ.get("SATPU_UNIF_MXU", "1") != "0",
        )
    else:
        scratch = [
            pltpu.VMEM((tn, u, m), cache_k.dtype),
            pltpu.VMEM((tn, u, m), cache_v.dtype),
            pltpu.VMEM((tn, page, m), cache_k.dtype),
            pltpu.VMEM((tn, page, m), cache_v.dtype),
            pltpu.SemaphoreType.DMA((5, max(tn, _PDEPTH))),
        ]
        kernel = functools.partial(
            _kernel_paged, layer=layer, tn=tn, d_head=d_head, quant=quant,
            page=page,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(n // tn,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * u * m,
            bytes_accessed=2 * n * u * m * cache_k.dtype.itemsize,
            transcendentals=n * u * (m // d_head),
        ),
        interpret=interpret,
    )(*operands)


def cached_attention_step_paged(
    q: jax.Array,
    kh: jax.Array,
    vh: jax.Array,
    mask: jax.Array,
    cache_k: jax.Array,
    cache_v: jax.Array,
    act_k: jax.Array,
    act_v: jax.Array,
    table: jax.Array,
    act_src: jax.Array,
    step,
    layer: int,
    nhead: int,
    seg: jax.Array | None = None,
    interpret: bool = False,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """One layer's cached attention over a PAGED cache (lazy beam reorder).

    Same contract as :func:`cached_attention_step`, plus the paging state:
    ``table (N, U/_PAGE)`` int32 — owner row of each COMPLETED page;
    ``act_src (N,)`` int32 — beam parent whose parity slot holds this
    row's active-page content; ``act_k/act_v (L, N, 2, _PAGE, M)`` — the
    parity-slotted active-page side buffers. ``mask`` and the int8 dequant
    scales are indexed by OWN row (the beam search physically reorders
    tokens/scales — they are small). Returns
    ``(out, new_ck, new_cv, new_ak, new_av[, kso, vso])`` with all cache
    outputs aliasing their operands. The caller never reorders ck/cv/ak/av
    — see models.transformer.beam_reorder_cache's paged branch.
    """
    n, m = q.shape
    if seg is None:
        seg = head_segments(m, nhead)
    step = jnp.asarray(step, jnp.int32).reshape((1,))
    return _attn_step_paged_call(
        q.astype(jnp.bfloat16), kh.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
        mask.astype(jnp.int8), cache_k, cache_v, act_k, act_v,
        table.astype(jnp.int32), act_src.astype(jnp.int32), step, seg,
        layer=layer, d_head=m // nhead, interpret=interpret,
        k_scale=k_scale, v_scale=v_scale,
    )


@functools.partial(jax.jit, static_argnames=("layer", "d_head", "interpret"))
def _attn_step_paged_fused_call(q, kh, vh, mask, cache_kv, act_kv,
                                table, act_src, step, seg, layer, d_head,
                                interpret=False, k_scale=None, v_scale=None):
    """Wiring for the FUSED-KV chunked paged kernel (long caches only).

    ``cache_kv (L, N, 2U, M)`` stores each logical page as 2*page
    consecutive positions [K-page, V-page]; ``act_kv (L, N, 2, 2*page, M)``
    are the fused parity slots. Every per-(row, page) transfer is one
    descriptor — the scalar-core DMA-issue loop that dominates the traced
    30 s decode halves (BENCHMARKS.md round 4)."""
    n, m = q.shape
    u = cache_kv.shape[2] // 2
    page = u // table.shape[1]
    assert page == _PAGE_LONG, (page, u)
    assert act_kv.shape[3] == 2 * page, (act_kv.shape, page)
    quant = cache_kv.dtype == jnp.int8
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    tn, uc, ucc, nbuf = _pick_chunk_paged(n, m, cache_kv.dtype.itemsize)
    row_spec = pl.BlockSpec((tn, m), lambda i, *_: (i, 0))
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [
        row_spec, row_spec, row_spec, hbm_spec,
        pl.BlockSpec((m, m // d_head), lambda i, *_: (0, 0)),
    ]
    out_specs = [row_spec, any_spec, any_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n, m), jnp.float32),
        jax.ShapeDtypeStruct(cache_kv.shape, cache_kv.dtype),
        jax.ShapeDtypeStruct(act_kv.shape, act_kv.dtype),
    ]

    def _prechunk(a, dtype):
        # (N, U) -> (U/ucc, N, max(ucc, 128)); see _attn_step_call
        a = a.astype(dtype).reshape(n, u // ucc, ucc)
        if ucc < 128:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - ucc)))
        return a.transpose(1, 0, 2)

    mask = _prechunk(mask, jnp.int32)
    nt = n // tn
    tblr = table.reshape(nt, tn, table.shape[1])
    unif = jnp.all(tblr == tblr[:, :1, :], axis=1).astype(jnp.int32)
    operands = [step, table, act_src, unif, q, kh, vh, mask, seg]
    nsp = 4
    if quant:
        in_specs += [hbm_spec, hbm_spec]
        operands += [_prechunk(k_scale, jnp.float32),
                     _prechunk(v_scale, jnp.float32)]
        sc_spec = pl.BlockSpec((tn, 128), lambda i, *_: (i, 0))
        out_specs += [sc_spec, sc_spec]
        out_shape += [
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
        ]
        aliases = {nsp + 7: 1, nsp + 8: 2}
    else:
        aliases = {nsp + 5: 1, nsp + 6: 2}
    in_specs += [any_spec, any_spec]
    operands += [cache_kv, act_kv]
    ml = max(ucc, 128)
    nsub_tot = u // ucc
    h = m // d_head
    scratch = [
        pltpu.VMEM((nbuf, tn, 2 * uc, m), cache_kv.dtype),  # fused chunk rows
        pltpu.VMEM((nbuf, 2 * uc, m), cache_kv.dtype),      # shared uniform pages
        pltpu.VMEM((nsub_tot, tn, ml), jnp.int32),
    ]
    if quant:
        scratch += [
            pltpu.VMEM((nsub_tot, tn, ml), jnp.float32),
            pltpu.VMEM((nsub_tot, tn, ml), jnp.float32),
        ]
    scratch += [
        pltpu.VMEM((tn, 2 * uc, m), cache_kv.dtype),        # fused writeback
        pltpu.VMEM((tn, 1), jnp.int32),
        pltpu.VMEM((tn, h), jnp.float32),   # online-softmax accumulators
        pltpu.VMEM((tn, h), jnp.float32),
        pltpu.VMEM((tn, m), jnp.float32),
        pltpu.VMEM((tn, h), jnp.float32),
        pltpu.SemaphoreType.DMA((5, max(nbuf, 2))),
        pltpu.SemaphoreType.DMA((1, nbuf, tn)),
        pltpu.SemaphoreType.DMA((1, nbuf)),
    ]
    kernel = functools.partial(
        _kernel_chunked_paged, layer=layer, tn=tn, uc=uc, ucc=ucc,
        nbuf=nbuf, d_head=d_head, quant=quant, fused=True,
        unif_mxu=os.environ.get("SATPU_UNIF_MXU", "1") != "0",
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(n // tn,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * u * m,
            bytes_accessed=2 * n * u * m * cache_kv.dtype.itemsize,
            transcendentals=n * u * (m // d_head),
        ),
        interpret=interpret,
    )(*operands)


def cached_attention_step_paged_fused(
    q: jax.Array,
    kh: jax.Array,
    vh: jax.Array,
    mask: jax.Array,
    cache_kv: jax.Array,
    act_kv: jax.Array,
    table: jax.Array,
    act_src: jax.Array,
    step,
    layer: int,
    nhead: int,
    seg: jax.Array | None = None,
    interpret: bool = False,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """Paged cached attention over a FUSED-KV long cache (page fusion of
    :func:`cached_attention_step_paged`): ``cache_kv (L, N, 2U, M)`` packs
    K and V page-interleaved, ``act_kv (L, N, 2, 2*_PAGE_LONG, M)`` packs
    the parity slots. Returns ``(out, new_kv, new_akv[, kso, vso])`` with
    the cache outputs aliasing their operands. make_kv_cache emits this
    layout for chunked-regime caches (SATPU_FUSED_KV=0 restores split)."""
    n, m = q.shape
    if seg is None:
        seg = head_segments(m, nhead)
    step = jnp.asarray(step, jnp.int32).reshape((1,))
    return _attn_step_paged_fused_call(
        q.astype(jnp.bfloat16), kh.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
        mask.astype(jnp.int8), cache_kv, act_kv,
        table.astype(jnp.int32), act_src.astype(jnp.int32), step, seg,
        layer=layer, d_head=m // nhead, interpret=interpret,
        k_scale=k_scale, v_scale=v_scale,
    )


def head_segments(d_model: int, nhead: int) -> jax.Array:
    """(M, H) bf16 one-hot head-segment matrix (constant)."""
    d_head = d_model // nhead
    seg = np.zeros((d_model, nhead), np.float32)
    for h in range(nhead):
        seg[h * d_head : (h + 1) * d_head, h] = 1.0
    return jnp.asarray(seg, jnp.bfloat16)


def cached_attention_step(
    q: jax.Array,
    kh: jax.Array,
    vh: jax.Array,
    mask: jax.Array,
    cache_k: jax.Array,
    cache_v: jax.Array,
    step,
    layer: int,
    nhead: int,
    seg: jax.Array | None = None,
    interpret: bool = False,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """One layer's cached single-token attention, cache-in-HBM.

    q/kh/vh: (N, M) the current token's projected heads (flat);
    mask: (N, U) nonzero = valid key (pad masking; positions > step are
    masked in-kernel); cache_k/cache_v: (L, N, U, M) stacked caches —
    only layer ``layer`` and positions <= step are read; step: scalar
    int32. Returns ``(out, new_cache_k, new_cache_v)``: the (N, M) f32
    attention output (heads concatenated, pre-output-projection) plus the
    caches with the fresh kh/vh written at position ``step`` of layer
    ``layer`` IN PLACE (outputs alias the operands — no XLA
    dynamic_update_slice needed).

    With int8 caches, pass ``k_scale``/``v_scale`` as the per-layer
    (N, U) f32 dequant scales; two extra outputs (N, 128) carry the fresh
    position's scales (column 0; the caller updates the (L, N, U) scale
    arrays).
    """
    n, m = q.shape
    if seg is None:
        seg = head_segments(m, nhead)
    step = jnp.asarray(step, jnp.int32).reshape((1,))
    return _attn_step_call(
        q.astype(jnp.bfloat16), kh.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
        mask.astype(jnp.int8), cache_k, cache_v, step, seg,
        layer=layer, d_head=m // nhead, interpret=interpret,
        k_scale=k_scale, v_scale=v_scale,
    )
