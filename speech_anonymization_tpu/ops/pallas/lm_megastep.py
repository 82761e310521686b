"""Whole-LM-step megakernel: every layer of a TransformerLM single-token
decode step in ONE pallas_call.

Why (BENCHMARKS.md round 4): at the 30 s serving shape (N=528 rows,
d=768, U=512, int8 fused-KV paged cache) the traced decode step spends
7.13 ms in 12 sequential per-layer attention kernel invocations of
0.594 ms each, while the kernel's own measured per-tile floor accounts
for only ~0.35 ms of each — the remainder is per-invocation dispatch +
DMA-pipeline ramp, re-paid 12 times per step with XLA matmul fusions
interleaved between the kernels. This kernel runs the **entire stack**
— per-layer q/k/v projections, the paged-attention cache streaming,
out-projection, residual+LayerNorm, and the feed-forward — inside one
pallas_call, so the dispatch/ramp cost is paid once and the layer
matmuls overlap the weight streams.

Structure (one grid step; everything is explicit loops):

  * ``x`` for ALL N rows lives in VMEM scratch for the whole call
    (N x M f32 = 1.6 MB at the bench shape);
  * weights stream from HBM as (M, M) bf16 blocks — [q, k, v, o,
    w1_c0, w2_c0, w1_c1, w2_c1, ...] per layer, double-buffered: block
    j+1's DMA is in flight while block j's matmul runs on the MXU
    (blocks-per-layer is even, so the buffer slot of each stage is
    static). The FF runs in ``d_ffn // d_model`` column/row block pairs
    so no (N, d_ffn) intermediate is ever materialized;
  * the attention phase is the fused-KV chunked-paged streaming loop of
    ``attention_step._kernel_chunked_paged`` (same pages-from-owner-rows
    DMAs, parity-slotted active page, uniform-page MXU dedup, granule
    skip, int8 dequant, online softmax) re-hosted as an inner tile loop
    with the LAYER index dynamic;
  * biases + LayerNorm parameters for all layers sit in one small
    (L, NV, M) f32 VMEM operand.

The per-layer torch modules this replaces at serving time are the
reference's TransformerLM layers driven token-by-token inside
S2STransformerBeamSearch (speechbrain_configs/convae.yaml:226-240).

Only the FUSED-KV paged layout is supported (make_kv_cache emits it for
every chunked-regime paged cache); short caches keep the per-layer
whole-row kernel, whose invocations are ~0.1 ms class and do not pay the
ramp 12x. Gate: ``SATPU_LM_MEGA=0`` restores the per-layer path.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_step import _PAGE_LONG, NEG_INF, head_segments

# vecs rows per layer: bq bk bv bo | b1 (nf rows) | b2 | ln1_s ln1_b ln2_s ln2_b
_V_BQ, _V_BK, _V_BV, _V_BO = 0, 1, 2, 3


def _nv(nf: int) -> int:
    return 9 + nf


def _nb(nf: int) -> int:  # weight blocks per layer (always even)
    return 4 + 2 * nf


def prepare_lm_megastep(params: dict, num_layers: int, d_model: int,
                        d_ffn: int) -> tuple[jax.Array, jax.Array]:
    """Stack a TransformerLM's layer parameters for the megakernel.

    Returns ``(wall, vecs)``: ``wall (L*NB, M, M)`` bf16 weight blocks in
    stream order [q, k, v, o, w1_c0, w2_c0, ...] and ``vecs (L, NV, M)``
    f32 bias/LayerNorm rows. Pure function of the params pytree — called
    once per decode (outside the step scan), so the stacking cost is
    amortized over every step.
    """
    m, f = d_model, d_ffn
    assert f % m == 0, (f, m)
    nf = f // m
    blocks, vecs = [], []
    for l in range(num_layers):
        p = params[f"layer_{l}"]
        wq = p["attn"]["q"]["kernel"].reshape(m, m)
        wk = p["attn"]["k"]["kernel"].reshape(m, m)
        wv = p["attn"]["v"]["kernel"].reshape(m, m)
        wo = p["attn"]["out"]["kernel"].reshape(m, m)
        w1 = p["FeedForward_0"]["Dense_0"]["kernel"]  # (M, F)
        w2 = p["FeedForward_0"]["Dense_1"]["kernel"]  # (F, M)
        lb = [wq, wk, wv, wo]
        for c in range(nf):
            lb.append(w1[:, c * m:(c + 1) * m])
            lb.append(w2[c * m:(c + 1) * m, :])
        blocks.append(jnp.stack([b.astype(jnp.bfloat16) for b in lb]))
        vr = [
            p["attn"]["q"]["bias"].reshape(m),
            p["attn"]["k"]["bias"].reshape(m),
            p["attn"]["v"]["bias"].reshape(m),
            p["attn"]["out"]["bias"].reshape(m),
            *[p["FeedForward_0"]["Dense_0"]["bias"][c * m:(c + 1) * m]
              for c in range(nf)],
            p["FeedForward_0"]["Dense_1"]["bias"],
            p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
            p["LayerNorm_1"]["scale"], p["LayerNorm_1"]["bias"],
        ]
        vecs.append(jnp.stack([v.astype(jnp.float32) for v in vr]))
    return jnp.concatenate(blocks, axis=0), jnp.stack(vecs)


def _kernel_mega(step_ref, tbl_ref, asrc_ref, unif_ref,
                 x0_ref, mask_ref, seg_ref, vecs_ref, wall_ref, *rest,
                 num_layers, n, tn, uc, ucc, nbuf, d_head, nf, quant,
                 exact_gelu, eps=1e-6):
    if quant:
        (ksl_ref, vsl_ref, ckv_ref, akv_ref,
         xo_ref, ckvo_ref, akvo_ref, kso_ref, vso_ref,
         xs, xb, qs, ks, vs, abuf, bbuf, wbuf, ksos, vsos,
         ksc, ksu, mall, kslall, vslall, kwb, mflag,
         amx, aden, aacc, aprd,
         sems, csems, usems, wsem, ssem, xsem) = rest
    else:
        (ckv_ref, akv_ref, xo_ref, ckvo_ref, akvo_ref,
         xs, xb, qs, ks, vs, abuf, bbuf, wbuf,
         ksc, ksu, mall, kwb, mflag,
         amx, aden, aacc, aprd,
         sems, csems, usems, wsem, xsem) = rest
        kso_ref = vso_ref = kslall = vslall = ksos = vsos = ssem = None
    L = num_layers
    NB = _nb(nf)
    ucd = 2 * uc  # fused page: [K-page, V-page] DMA rows
    nt = n // tn
    m = xs.shape[1]
    h = m // d_head
    nsub = uc // ucc
    step = step_ref[0]
    nc = (step + uc) // uc
    lastc = nc - 1
    o = step - lastc * uc
    par_w = jax.lax.rem(step, 2)
    par_r = jax.lax.rem(step + 1, 2)
    completes = o == (uc - 1)
    n_pages = ckv_ref.shape[2] // ucd
    seg = seg_ref[...]
    segf = seg.astype(jnp.float32)
    rsqrt = 1.0 / math.sqrt(d_head)
    grd = 32 if uc % 32 == 0 else uc

    # ---- x0 -> xs (once) --------------------------------------------------
    cp = pltpu.make_async_copy(x0_ref, xs, xsem.at[0])
    cp.start()
    cp.wait()

    # ---- weight-block pipeline -------------------------------------------
    # waits reconstruct the matching copy descriptor (same src/dst shapes,
    # so the byte count — all a DMA wait needs — is identical)
    def _wcopy(j, slot):
        return pltpu.make_async_copy(wall_ref.at[j], wbuf.at[slot],
                                     wsem.at[slot])

    def _wstart(j, slot):
        @pl.when(j < L * NB)
        def _():
            _wcopy(j, slot).start()

    _wstart(jnp.int32(0), 0)

    def _ln(x, scale, bias):
        # flax LayerNorm semantics (fast variance, eps inside rsqrt)
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True) - mu * mu, 0.0)
        return (x - mu) * jax.lax.rsqrt(var + eps) * scale[None, :] + bias[None, :]

    def layer_body(l, _):
        jbase = l * NB
        vec = vecs_ref[pl.ds(l, 1)][0]  # (NV, M) f32

        def _mm(jj, src_bf16):
            """Wait weight block jbase+jj, matmul, start block jbase+jj+1.
            NB is even, so slot = jj % 2 is STATIC across layers."""
            slot = jj % 2
            _wcopy(jbase + jj, slot).wait()
            out = jnp.dot(src_bf16, wbuf[slot][...],
                          preferred_element_type=jnp.float32)
            _wstart(jbase + jj + 1, (jj + 1) % 2)
            return out

        # ---- q/k/v projections (whole-N matmuls) -------------------------
        xb[...] = xs[...].astype(jnp.bfloat16)
        qs[...] = (_mm(0, xb[...]) + vec[_V_BQ][None, :]).astype(jnp.bfloat16)
        ks[...] = (_mm(1, xb[...]) + vec[_V_BK][None, :]).astype(jnp.bfloat16)
        vs[...] = (_mm(2, xb[...]) + vec[_V_BV][None, :]).astype(jnp.bfloat16)

        # ---- attention: paged cache streaming, tile by tile --------------
        def tile_body(t, _):
            row0 = pl.multiple_of(t * tn, tn)
            rows = pl.ds(row0, tn)
            q = qs[rows, :]
            khb = ks[rows, :]
            kh_f = khb.astype(jnp.float32)
            vh_f = vs[rows, :].astype(jnp.float32)

            # flat copies: pad mask (layer-invariant) + this layer's scales
            fc = [pltpu.make_async_copy(mask_ref.at[:, rows, :], mall,
                                        sems.at[2, 0])]
            if quant:
                fc.append(pltpu.make_async_copy(
                    ksl_ref.at[l, :, rows, :], kslall, sems.at[2, 1]))
                fc.append(pltpu.make_async_copy(
                    vsl_ref.at[l, :, rows, :], vslall, sems.at[3, 0]))
            for c in fc:
                c.start()

            # ---- chunk DMA machinery (fused layout, dynamic layer) -------
            def _is_unif(c):
                return (c != lastc) & (unif_ref[t, c] != 0)

            def _unif_copies(c, slot):
                src = tbl_ref[row0, c]
                return [pltpu.make_async_copy(
                    ckv_ref.at[l, src, pl.ds(c * ucd, ucd), :],
                    ksu.at[slot], usems.at[0, slot])]

            def _row_copies(c, slot, r):
                src = tbl_ref[row0 + r, c]
                return [pltpu.make_async_copy(
                    ckv_ref.at[l, src, pl.ds(c * ucd, ucd), :],
                    ksc.at[slot, r], csems.at[0, slot, r])]

            def _act_op(slot, r, start):
                src = asrc_ref[row0 + r]
                for g in range(uc // grd):
                    lo = g * grd

                    @pl.when(lastc * uc + lo <= step)
                    def _(lo=lo):
                        cps = [
                            pltpu.make_async_copy(
                                akv_ref.at[l, src, par_r, pl.ds(lo, grd), :],
                                ksc.at[slot, r, pl.ds(lo, grd), :],
                                csems.at[0, slot, r]),
                            pltpu.make_async_copy(
                                akv_ref.at[l, src, par_r, pl.ds(uc + lo, grd), :],
                                ksc.at[slot, r, pl.ds(uc + lo, grd), :],
                                csems.at[0, slot, r]),
                        ]
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

            for b in range(min(nbuf, n_pages)):
                @pl.when(b < nc)
                def _(b=b):
                    _chunk_op(b, True)

            # fresh-token seed (identical math to _kernel_chunked_paged)
            if quant:
                k_amax = jnp.maximum(
                    jnp.max(jnp.abs(kh_f), axis=1, keepdims=True), 1e-6)
                v_amax = jnp.maximum(
                    jnp.max(jnp.abs(vh_f), axis=1, keepdims=True), 1e-6)
                kq = jnp.clip(jnp.round(kh_f * (127.0 / k_amax)),
                              -127, 127).astype(jnp.int8)
                vq = jnp.clip(jnp.round(vh_f * (127.0 / v_amax)),
                              -127, 127).astype(jnp.int8)
                ksos[rows, :] = jnp.broadcast_to(
                    k_amax * (1.0 / 127.0), (tn, 128))
                vsos[rows, :] = jnp.broadcast_to(
                    v_amax * (1.0 / 127.0), (tn, 128))

            prod_new = q * khb
            s_new = jnp.dot(prod_new, seg,
                            preferred_element_type=jnp.float32) * rsqrt
            amx[...] = s_new
            aden[...] = jnp.ones((tn, h), jnp.float32)
            aacc[...] = vh_f
            aprd[...] = jnp.ones((tn, h), jnp.float32)
            mflag[...] = jnp.zeros((tn, 1), jnp.int32)

            # head-expanded queries for the uniform-page MXU path
            hh = jax.lax.broadcasted_iota(jnp.int32, (h, m), 0)
            dh = jax.lax.broadcasted_iota(jnp.int32, (h, m), 1) // d_head
            segT = (dh == hh).astype(jnp.bfloat16)
            qseg = (q[:, None, :] * segT[None, :, :]).reshape(tn * h, m)
            segT_f = segT.astype(jnp.float32)

            for c in fc:
                c.wait()

            def _subtile_update_unif(kst_b, vst_b, msub, ksl_c, vsl_c):
                valid = msub != 0
                s2 = jax.lax.dot_general(
                    qseg, kst_b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s3 = s2.reshape(tn, h, ucc) * rsqrt
                if quant:
                    s3 = s3 * ksl_c[:, None, :]
                s3 = jnp.where(valid[:, None, :], s3, NEG_INF)
                mx = amx[...]
                new_mx = jnp.maximum(mx, jnp.max(s3, axis=2))
                alpha = jnp.exp(mx - new_mx)
                e = jnp.exp(s3 - new_mx[:, :, None])
                aden[...] = aden[...] * alpha + jnp.sum(e, axis=2)
                ew = e * vsl_c[:, None, :] if quant else e
                ctx = jax.lax.dot_general(
                    ew.astype(jnp.bfloat16).reshape(tn * h, ucc), vst_b,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(tn, h, m)
                contrib = jnp.sum(ctx * segT_f[None, :, :], axis=1)
                alpha_m = jnp.dot(alpha, segf.T,
                                  preferred_element_type=jnp.float32)
                aacc[...] = aacc[...] * alpha_m + contrib
                amx[...] = new_mx
                aprd[...] = aprd[...] * alpha

            def _subtile_update(kd, vd, pos0, mchunk, track_step):
                x = kd.shape[1]
                pos3 = (jax.lax.broadcasted_iota(jnp.int32, (tn, x, 1), 1)
                        + pos0)
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
                alpha_m = jnp.dot(alpha, segf.T,
                                  preferred_element_type=jnp.float32)
                aacc[...] = aacc[...] * alpha_m + contrib
                amx[...] = new_mx
                aprd[...] = aprd[...] * alpha
                if track_step:
                    mflag[...] = mflag[...] + jnp.sum(
                        jnp.where(pos3 == step, mchunk, 0), axis=1)

            def _wb_op(start):
                for g in range(uc // grd):
                    lo = g * grd

                    @pl.when(lastc * uc + lo <= step)
                    def _(lo=lo):
                        @pl.when(completes)
                        def _():
                            cps = [
                                pltpu.make_async_copy(
                                    kwb.at[:, pl.ds(lo, grd), :],
                                    ckvo_ref.at[l, rows,
                                                pl.ds(lastc * ucd + lo, grd), :],
                                    sems.at[4, 0]),
                                pltpu.make_async_copy(
                                    kwb.at[:, pl.ds(uc + lo, grd), :],
                                    ckvo_ref.at[
                                        l, rows,
                                        pl.ds(lastc * ucd + uc + lo, grd), :],
                                    sems.at[4, 0]),
                            ]
                            for cp in cps:
                                cp.start() if start else cp.wait()

                        @pl.when(jnp.logical_not(completes))
                        def _():
                            cps = [
                                pltpu.make_async_copy(
                                    kwb.at[:, pl.ds(lo, grd), :],
                                    akvo_ref.at[l, rows, par_w,
                                                pl.ds(lo, grd), :],
                                    sems.at[4, 0]),
                                pltpu.make_async_copy(
                                    kwb.at[:, pl.ds(uc + lo, grd), :],
                                    akvo_ref.at[l, rows, par_w,
                                                pl.ds(uc + lo, grd), :],
                                    sems.at[4, 0]),
                            ]
                            for cp in cps:
                                cp.start() if start else cp.wait()

            def chunk_body(c, carry):
                _chunk_op(c, False)  # wait chunk c
                slot = jax.lax.rem(c, nbuf)

                @pl.when(_is_unif(c))
                def _():
                    for b in range(nsub):
                        cc = c * nsub + b
                        kst = ksu[slot, b * ucc:(b + 1) * ucc, :]
                        vst = ksu[slot, uc + b * ucc:uc + (b + 1) * ucc, :]
                        msub = jax.lax.slice_in_dim(mall[cc, :, :], 0, ucc,
                                                    axis=1)
                        ksl_c = vsl_c = None
                        if quant:
                            ksl_c = jax.lax.slice_in_dim(
                                kslall[cc, :, :], 0, ucc, axis=1)
                            vsl_c = jax.lax.slice_in_dim(
                                vslall[cc, :, :], 0, ucc, axis=1)
                        _subtile_update_unif(
                            kst.astype(jnp.bfloat16), vst.astype(jnp.bfloat16),
                            msub, ksl_c, vsl_c)

                def _mixed_granule(b, g0, gw, track_step):
                    kst = ksc[slot, :, b * ucc + g0:b * ucc + g0 + gw, :]
                    vst = ksc[slot, :,
                              uc + b * ucc + g0:uc + b * ucc + g0 + gw, :]
                    cc = c * nsub + b
                    msub = jax.lax.slice_in_dim(mall[cc, :, :], g0, g0 + gw,
                                                axis=1)
                    mchunk = msub[:, :, None]
                    if quant:
                        ksl_c = jax.lax.slice_in_dim(kslall[cc, :, :], g0,
                                                     g0 + gw, axis=1)
                        vsl_c = jax.lax.slice_in_dim(vslall[cc, :, :], g0,
                                                     g0 + gw, axis=1)
                        kd = (kst.astype(jnp.bfloat16)
                              * ksl_c[:, :, None].astype(jnp.bfloat16))
                        vd = vst.astype(jnp.float32) * vsl_c[:, :, None]
                    else:
                        kd = kst.astype(jnp.bfloat16)
                        vd = vst.astype(jnp.float32)
                    _subtile_update(kd, vd, cc * ucc + g0, mchunk,
                                    track_step=track_step)

                @pl.when(jnp.logical_not(_is_unif(c)) & (c != lastc))
                def _():
                    for b in range(nsub):
                        _mixed_granule(b, 0, ucc, track_step=False)

                @pl.when(c == lastc)
                def _():
                    gr = 16 if ucc % 16 == 0 else ucc
                    for b in range(nsub):
                        for g in range(ucc // gr):
                            @pl.when(c * uc + b * ucc + g * gr <= step)
                            def _(b=b, g=g):
                                _mixed_granule(b, g * gr, gr, track_step=True)

                @pl.when(c == lastc)
                def _():
                    fk = kq if quant else khb.astype(kwb.dtype)
                    fv = vq if quant else vs[rows, :].astype(kwb.dtype)
                    ii = jax.lax.broadcasted_iota(jnp.int32, (tn, 2 * uc, 1), 1)
                    kwb[...] = jnp.where(
                        ii == o, fk[:, None, :],
                        jnp.where(ii == uc + o, fv[:, None, :], ksc[slot]))
                    _wb_op(start=True)

                @pl.when(c + nbuf < nc)
                def _():
                    _chunk_op(c + nbuf, True)

                return 0

            jax.lax.fori_loop(0, nc, chunk_body, 0)
            ok = mflag[...] > 0
            aprod = aprd[...]
            den = aden[...] - jnp.where(
                jnp.broadcast_to(ok, aden.shape), 0.0, aprod)
            aprod_m = jnp.dot(aprod, segf.T,
                              preferred_element_type=jnp.float32)
            acc = aacc[...] - jnp.where(ok, 0.0, aprod_m * vh_f)
            den_m = jnp.dot(jnp.maximum(den, 1e-30), segf.T,
                            preferred_element_type=jnp.float32)
            abuf[rows, :] = acc / den_m
            _wb_op(start=False)
            return 0

        jax.lax.fori_loop(0, nt, tile_body, 0)
        if quant:
            # one scale-out DMA per layer per k/v; waited immediately (the
            # transfer is 0.25 MB-class — latency, not bandwidth)
            cps = [
                pltpu.make_async_copy(ksos, kso_ref.at[l], ssem.at[0]),
                pltpu.make_async_copy(vsos, vso_ref.at[l], ssem.at[1]),
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        # ---- out projection + residual + LN1 ------------------------------
        bbuf[...] = _mm(3, abuf[...].astype(jnp.bfloat16)) + vec[_V_BO][None, :]
        xs[...] = _ln(xs[...] + bbuf[...], vec[5 + nf], vec[6 + nf])

        # ---- feed-forward in (w1_c, w2_c) block pairs ---------------------
        xb[...] = xs[...].astype(jnp.bfloat16)
        bbuf[...] = jnp.broadcast_to(vec[4 + nf][None, :], bbuf.shape)
        for c in range(nf):
            abuf[...] = jax.nn.gelu(_mm(4 + 2 * c, xb[...]) + vec[4 + c][None, :],
                                    approximate=not exact_gelu)
            bbuf[...] = bbuf[...] + _mm(5 + 2 * c, abuf[...].astype(jnp.bfloat16))
        xs[...] = _ln(xs[...] + bbuf[...], vec[7 + nf], vec[8 + nf])
        return 0

    jax.lax.fori_loop(0, L, layer_body, 0)

    cp = pltpu.make_async_copy(xs, xo_ref, xsem.at[0])
    cp.start()
    cp.wait()


def _pick_mega_tn(n: int, itemsize: int) -> tuple[int, int]:
    """(tn, nbuf) for the megakernel's internal attention tiles. The
    persistent x/q/k/v/FF/weight buffers take ~10.5 MB of the scoped-VMEM
    budget at the bench shape, so the attention tile must be smaller than
    the standalone kernel's tn=24 winner (whose chunk buffers alone would
    put the scoped stack over the 16 MB limit). SATPU_MEGA_TN/NBUF
    override for on-chip A/Bs."""
    env_tn = int(os.environ.get("SATPU_MEGA_TN", "0"))
    if env_tn and n % env_tn == 0:
        return env_tn, int(os.environ.get("SATPU_MEGA_NBUF", "2"))
    cands = (8, 4) if itemsize == 1 else (4, 2)
    for tn in cands:
        if n % tn == 0:
            return tn, 2
    return math.gcd(n, 8) or 1, 2


@functools.partial(jax.jit, static_argnames=(
    "num_layers", "d_head", "nf", "exact_gelu", "interpret"))
def _lm_megastep_call(x0, mask, seg, vecs, wall, cache_kv, act_kv,
                      table, act_src, step, num_layers, d_head, nf,
                      exact_gelu=False, interpret=False,
                      k_scale=None, v_scale=None):
    n, m = x0.shape
    u = cache_kv.shape[2] // 2
    page = u // table.shape[1]
    assert page == _PAGE_LONG, (page, u)
    quant = cache_kv.dtype == jnp.int8
    tn, nbuf = _pick_mega_tn(n, cache_kv.dtype.itemsize)
    uc = page
    ucc = min(uc, 64)
    ml = max(ucc, 128)
    nsub_tot = u // ucc
    h = m // d_head
    nt = n // tn
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)

    def _prechunk(a, dtype):
        a = a.astype(dtype).reshape(n, u // ucc, ucc)
        if ucc < 128:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - ucc)))
        return a.transpose(1, 0, 2)

    mask_p = _prechunk(mask, jnp.int32)
    tblr = table.reshape(nt, tn, table.shape[1])
    unif = jnp.all(tblr == tblr[:, :1, :], axis=1).astype(jnp.int32)

    in_specs = [
        hbm_spec,                                            # x0
        hbm_spec,                                            # mask (prechunked)
        pl.BlockSpec((m, h), lambda i, *_: (0, 0)),          # seg
        pl.BlockSpec(vecs.shape, lambda i, *_: (0, 0, 0)),   # vecs (VMEM)
        any_spec,                                            # wall
    ]
    operands = [step, table.astype(jnp.int32), act_src.astype(jnp.int32),
                unif, x0, mask_p, seg, vecs, wall]
    out_specs = [any_spec, any_spec, any_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n, m), jnp.float32),
        jax.ShapeDtypeStruct(cache_kv.shape, cache_kv.dtype),
        jax.ShapeDtypeStruct(act_kv.shape, act_kv.dtype),
    ]
    if quant:
        # per-LAYER prechunked scale tables: (L, U/ucc, N, ml)
        ksl = jax.vmap(lambda a: _prechunk(a, jnp.float32))(k_scale)
        vsl = jax.vmap(lambda a: _prechunk(a, jnp.float32))(v_scale)
        in_specs += [hbm_spec, hbm_spec]
        operands += [ksl, vsl]
        out_specs += [any_spec, any_spec]
        out_shape += [
            jax.ShapeDtypeStruct((num_layers, n, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_layers, n, 128), jnp.float32),
        ]
        aliases = {11: 1, 12: 2}  # cache_kv, act_kv operand -> output
    else:
        aliases = {9: 1, 10: 2}
    in_specs += [any_spec, any_spec]
    operands += [cache_kv, act_kv]

    cdt = cache_kv.dtype
    scratch = [
        pltpu.VMEM((n, m), jnp.float32),      # xs
        pltpu.VMEM((n, m), jnp.bfloat16),     # xb
        pltpu.VMEM((n, m), jnp.bfloat16),     # qs
        pltpu.VMEM((n, m), jnp.bfloat16),     # ks
        pltpu.VMEM((n, m), jnp.bfloat16),     # vs
        pltpu.VMEM((n, m), jnp.float32),      # abuf (attn ctx / FF hidden)
        pltpu.VMEM((n, m), jnp.float32),      # bbuf (attn out / FF acc)
        pltpu.VMEM((2, m, m), jnp.bfloat16),  # weight double-buffer
    ]
    if quant:
        scratch += [
            pltpu.VMEM((n, 128), jnp.float32),  # ksos (fresh k scales)
            pltpu.VMEM((n, 128), jnp.float32),  # vsos
        ]
    scratch += [
        pltpu.VMEM((nbuf, tn, 2 * uc, m), cdt),   # fused chunk rows
        pltpu.VMEM((nbuf, 2 * uc, m), cdt),       # shared uniform pages
        pltpu.VMEM((nsub_tot, tn, ml), jnp.int32),
    ]
    if quant:
        scratch += [
            pltpu.VMEM((nsub_tot, tn, ml), jnp.float32),
            pltpu.VMEM((nsub_tot, tn, ml), jnp.float32),
        ]
    scratch += [
        pltpu.VMEM((tn, 2 * uc, m), cdt),         # writeback
        pltpu.VMEM((tn, 1), jnp.int32),
        pltpu.VMEM((tn, h), jnp.float32),
        pltpu.VMEM((tn, h), jnp.float32),
        pltpu.VMEM((tn, m), jnp.float32),
        pltpu.VMEM((tn, h), jnp.float32),
        pltpu.SemaphoreType.DMA((5, max(nbuf, 2))),
        pltpu.SemaphoreType.DMA((1, nbuf, tn)),
        pltpu.SemaphoreType.DMA((1, nbuf)),
        pltpu.SemaphoreType.DMA((2,)),            # weight blocks
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # scale-out
    scratch.append(pltpu.SemaphoreType.DMA((1,)))      # x0/x_out

    kernel = functools.partial(
        _kernel_mega, num_layers=num_layers, n=n, tn=tn, uc=uc, ucc=ucc,
        nbuf=nbuf, d_head=d_head, nf=nf, quant=quant, exact_gelu=exact_gelu)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    flops_mm = 2 * n * m * m * _nb(nf) * num_layers
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=flops_mm + 4 * n * u * m * num_layers,
            bytes_accessed=(2 * n * u * m * cdt.itemsize * num_layers
                            + wall.size * 2),
            transcendentals=n * u * h * num_layers,
        ),
        interpret=interpret,
    )(*operands)


def lm_megastep(x0, mask, cache_kv, act_kv, table, act_src, step,
                wall, vecs, nhead, seg=None, exact_gelu=False,
                interpret=False, k_scale=None, v_scale=None):
    """Run every TransformerLM layer of one decode step in one kernel.

    ``x0 (N, M)`` f32: embedded+positioned token; ``mask (N, U)`` nonzero
    = valid key; ``cache_kv (L, N, 2U, M)`` / ``act_kv (L, N, 2, 2P, M)``:
    the fused-KV paged cache (make_kv_cache) with ownership ``table`` /
    ``act_src``; ``wall``/``vecs`` from :func:`prepare_lm_megastep`.
    Returns ``(x_out, new_kv, new_akv[, kso, vso])`` — cache outputs alias
    their operands; ``kso/vso (L, N, 128)`` carry the fresh position's
    int8 scales (column 0) for the caller's stacked scale update.
    """
    n, m = x0.shape
    L = cache_kv.shape[0]
    assert wall.shape[0] % L == 0
    nf = (wall.shape[0] // L - 4) // 2
    if seg is None:
        seg = head_segments(m, nhead)
    step = jnp.asarray(step, jnp.int32).reshape((1,))
    return _lm_megastep_call(
        x0.astype(jnp.float32), mask.astype(jnp.int8), seg, vecs, wall,
        cache_kv, act_kv, table.astype(jnp.int32), act_src.astype(jnp.int32),
        step, num_layers=L, d_head=m // nhead, nf=nf, exact_gelu=exact_gelu,
        interpret=interpret, k_scale=k_scale, v_scale=v_scale,
    )
