"""Transformer ASR + LM stack (the utility evaluator's models).

Reference configuration (convae.yaml:139-173, transformer.yaml:128-164):
  * ConvolutionFrontEnd: 3 conv2d blocks over (T, F), channels
    (128, 256, 512), kernels (3,3,1), strides (2,2,1) -> 4x time
    subsampling, flattened freq*channel = 20*512 = 10240
  * TransformerASR: input proj 10240 -> d_model 768, sinusoidal positions,
    12 post-norm encoder layers (8 heads, ffn 3072, GELU), 6 decoder
    layers, normalized target embedding (x sqrt(d_model)), vocab 5000
  * TransformerLM: 768-d, 12 heads, 12 causal encoder layers

TPU notes: everything is static-shape with explicit padding masks derived
from relative lengths; attention uses additive -inf masking; dropout is 0.0
in the reference configs, kept as a parameter. The beam-decode hot path
runs on fused Pallas kernels with bf16 caches (ops/pallas/); training
matmuls use the TPU default (bf16-pass) precision on f32 params.
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def lengths_to_padding_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) relative lengths -> (B, max_len) True=valid mask."""
    n = jnp.round(lengths * max_len)
    return jnp.arange(max_len)[None, :] < n[:, None]


def use_paged_cache(batch: int, u_max: int, d_model: int, dtype) -> bool:
    """True when the paged (lazy-beam-reorder) decode path applies: TPU
    backend and fused-kernel-compatible shapes. Short caches ride the
    paged whole-row kernel, long ones the paged chunked kernel. The paged
    path eliminates the per-step physical cache reorder — see
    beam_reorder_cache."""
    from ..ops.pallas.attention_step import max_u_for_kernel

    return (
        jax.default_backend() == "tpu"
        and d_model % 128 == 0
        and batch % 8 == 0
        and u_max <= max_u_for_kernel(d_model, max(jnp.dtype(dtype).itemsize, 2))
    )


def make_kv_cache(batch: int, u_max: int, num_layers: int, nhead: int, d_head: int,
                  dtype=jnp.float32, pad_index: int = 0, paged: bool = False) -> dict:
    """KV + token buffers for incremental decoding (callable outside
    apply — flax setup attributes are unavailable there). The token buffer
    lets cached steps reproduce the full path's pad-key masking.

    Layout: ONE stacked (L, N, U, H, D) array per k/v rather than per-layer
    buffers — beam reorder then touches one array, and the per-step write
    is a single dynamic_update_slice over all layers (measured: per-layer
    gathers interleaved with the step graph ran at ~61 GB/s on v5e,
    ~94% of LM decode cost; see BENCHMARKS.md round 2). ``dtype=bfloat16``
    halves cache traffic; scores/outputs still accumulate in f32.

    ``u_max`` is rounded up to a multiple of 8 so the position axis stays
    aligned to the TPU HBM tiling — the Pallas beam-reorder DMA
    (ops/pallas/beam_gather.py) slices whole rows, and misaligned slices
    fail Mosaic. Readers mask by step, so the extra positions are inert.

    The head axes are stored FLAT — (L, N, U, H*D), not (L, N, U, H, D):
    for the 5-D shape XLA picks an N-minor layout ({1,4,3,2,0}) and then
    must materialize full-cache relayout copies at the Pallas reorder
    boundary (measured: 4 copies x ~2.5 ms/step at the bench shape — more
    than the reorder itself). The flat shape keeps the model width on the
    lane axis; attention steps view heads via a free bitcast.
    """
    u_max = -(-u_max // 8) * 8
    # long caches take the CHUNKED attention kernel, whose DMA grain must
    # divide U; a 64-multiple U enables 64-position chunks instead of the
    # 8-position floor (57 tiny serial DMAs per step at e.g. U=456)
    from ..ops.pallas.attention_step import _PAGE, _PAGE_LONG, max_u_whole_row
    page = _PAGE
    if u_max > max_u_whole_row(nhead * d_head, max(jnp.dtype(dtype).itemsize, 2)):
        u_max = -(-u_max // 64) * 64
        page = _PAGE_LONG  # paged long caches: page == chunk DMA grain
    if paged:
        u_max = -(-u_max // page) * page
    # FUSED-KV layout for chunked-regime paged caches: the traced 30 s
    # decode is dominated by the scalar core issuing per-(row, page) DMA
    # descriptors inside the paged kernel (~2k per invocation, independent
    # of tiling); storing each page as 2*page consecutive positions
    # [K-page, V-page] makes every such transfer ONE descriptor instead of
    # a K/V pair. SATPU_FUSED_KV=0 restores the split layout (A/B knob).
    fused = (paged and page == _PAGE_LONG
             and os.environ.get("SATPU_FUSED_KV", "1") != "0")
    m = nhead * d_head
    if fused:
        cache = {
            "kv": jnp.zeros((num_layers, batch, 2 * u_max, m), dtype),
            "tokens": jnp.full((batch, u_max), pad_index, jnp.int32),
        }
    else:
        cache = {
            "k": jnp.zeros((num_layers, batch, u_max, m), dtype),
            "v": jnp.zeros((num_layers, batch, u_max, m), dtype),
            # init to pad so un-written positions are masked like the full path
            "tokens": jnp.full((batch, u_max), pad_index, jnp.int32),
        }
    if paged:
        # lazy-beam-reorder state: completed-page ownership table (each
        # row initially owns its pages), the beam parent whose parity slot
        # holds this row's ACTIVE page, and the parity-slotted active-page
        # side buffers the attention kernel ping-pongs through. With these
        # present, beam_reorder_cache never copies k/v — the reorder pass
        # (a full live-cache read+write per step, as large as the
        # attention reads themselves) becomes an int-table gather.
        cache["table"] = jnp.broadcast_to(
            jnp.arange(batch, dtype=jnp.int32)[:, None], (batch, u_max // page)
        )
        cache["act_src"] = jnp.arange(batch, dtype=jnp.int32)
        if fused:
            cache["kv_act"] = jnp.zeros(
                (num_layers, batch, 2, 2 * page, m), dtype
            )
        else:
            cache["k_act"] = jnp.zeros((num_layers, batch, 2, page, m), dtype)
            cache["v_act"] = jnp.zeros((num_layers, batch, 2, page, m), dtype)
    if dtype == jnp.int8:
        # symmetric per-(layer, row, position) dequant scales (quantized
        # serving mode — halves the cache bytes that dominate decode)
        cache["k_scale"] = jnp.zeros((num_layers, batch, u_max), jnp.float32)
        cache["v_scale"] = jnp.zeros((num_layers, batch, u_max), jnp.float32)
    return cache


def beam_reorder_cache(cache: dict, parent: jax.Array, step=None) -> dict:
    """Reorder a stacked KV cache to new beam parents, (B, K) ``parent``.

    Parents point within each batch item's K beams; rows move via the
    Pallas streaming-DMA gather (ops/pallas/beam_gather.py), which is a
    pure copy — EXACT for any cache dtype. The earlier one-hot MXU einsum
    and plain ``jnp.take`` both lowered to ~250/~120 GB/s on v5e vs the
    ~310-320 GB/s copy ceiling, and at beam 66 the reorder dominated the
    decode step (BENCHMARKS.md round 2). With ``step`` given, only
    positions <= step move (~45% of the bytes averaged over a decode);
    later positions are undefined, which cached decode steps tolerate
    (they mask by step and overwrite position step+1 before reading it).
    """
    from ..ops.pallas.beam_gather import beam_gather_rows

    b, k = parent.shape
    src = (jnp.arange(b, dtype=jnp.int32)[:, None] * k + parent.astype(jnp.int32)).reshape(-1)

    tokens = cache["tokens"]
    n, u = tokens.shape
    toks = jnp.take_along_axis(
        tokens.reshape(b, k, u), parent[:, :, None], axis=1
    ).reshape(n, u)

    if "table" in cache:
        # PAGED cache: k/v (and the active-page side buffers) never move.
        # Completed pages re-parent by gathering the int ownership table;
        # the active page re-parents by recording the parent row, whose
        # parity slot the next attention step reads. When this step just
        # COMPLETED a page (the kernel wrote the merged page to the main
        # cache at its OWN row), that page's table column becomes src.
        if step is None:
            raise ValueError("paged cache reorder requires the decode step")
        step = jnp.asarray(step, jnp.int32)
        up = cache["table"].shape[1]
        page = u // up  # 32 (whole-row) or 64 (chunked) — see make_kv_cache
        tbl = jnp.take(cache["table"], src, axis=0)
        completes = (step % page) == (page - 1)
        col = jnp.where(completes, step // page, up)  # up = out of range
        tbl = jnp.where(jnp.arange(up)[None, :] == col, src[:, None], tbl)
        out = {"table": tbl, "act_src": src, "tokens": toks}
        for key in ("k", "v", "k_act", "v_act", "kv", "kv_act"):
            if key in cache:  # content never moves — ownership does
                out[key] = cache[key]
        for key in ("k_scale", "v_scale"):
            if key in cache:  # (L, N, U) — small, physically gathered
                out[key] = jnp.take(cache[key], src, axis=1)
        return out

    def perm(a):  # (L, N, U, M) -> gather rows along N
        return beam_gather_rows(a, src, step)

    out = {"k": perm(cache["k"]), "v": perm(cache["v"]), "tokens": toks}
    for key in ("k_scale", "v_scale"):
        if key in cache:  # (L, N, U) — small, a plain gather suffices
            out[key] = jnp.take(cache[key], src, axis=1)
    return out


def _make_attends_paged_jnp(attns, cache, mask_nu, step, nhead, quant):
    """jnp fallback for PAGED caches (off-TPU tests): materializes each
    layer's logically-contiguous k/v buffer through the page table + the
    beam parent's active-page parity slot, runs attend_cached on it, and
    has finalize write the merged active page back (parity slot, plus the
    main cache when the page completes) — the same semantics the Pallas
    paged kernel implements with per-(row, page) DMAs. O(full cache)
    materialization per step: a correctness oracle, not a fast path.
    """
    n, u = mask_nu.shape
    fused = "kv" in cache  # fused-KV long layout: pages stored [K, V]
    m = (cache["kv"] if fused else cache["k"]).shape[-1]
    up = cache["table"].shape[1]
    page = u // up  # 32 (whole-row) or 64 (chunked) — see make_kv_cache
    step = jnp.asarray(step, jnp.int32)
    p_act = step // page
    o = step - p_act * page
    par_w = step % 2
    par_r = (step + 1) % 2
    tbl = cache["table"]
    asrc = cache["act_src"]

    def _views(i):
        """Per-layer (k_main, v_main, k_act, v_act) views of either layout."""
        if fused:
            kvb = cache["kv"][i].reshape(n, up, 2, page, m)
            ab = cache["kv_act"][i]  # (N, 2, 2*page, M)
            return (kvb[:, :, 0].reshape(n, u, m), kvb[:, :, 1].reshape(n, u, m),
                    ab[:, :, :page], ab[:, :, page:])
        return (cache["k"][i], cache["v"][i],
                cache["k_act"][i], cache["v_act"][i])

    def materialize(buf, act):
        # buf: (N, U, M) one layer's main cache; act: (N, 2, P, M)
        pages = buf.reshape(n, up, page, m)
        g = jnp.take_along_axis(pages, tbl[:, :, None, None], axis=0)
        act_page = jnp.take(jnp.take(act, asrc, axis=0), par_r, axis=1)
        pidx = jnp.arange(up)[None, :, None, None]
        merged = jnp.where(pidx == p_act, act_page[:, None], g)
        return merged.reshape(n, u, m)

    self_mask = mask_nu[:, None, None, :]

    def make(i, attn):
        def attend(qh, kh, vh):
            k_main, v_main, k_act, v_act = _views(i)
            k_buf = materialize(k_main, k_act)
            v_buf = materialize(v_main, v_act)
            scales = (
                (cache["k_scale"][i], cache["v_scale"][i]) if quant else (None, None)
            )
            return attn.attend_cached(
                qh, kh, vh, k_buf, v_buf, self_mask, step,
                k_scale=scales[0], v_scale=scales[1],
            )

        return attend

    def finalize(khs, vhs):
        ks = jnp.stack(khs)[:, :, 0]  # (L, N, M) f32
        vs = jnp.stack(vhs)[:, :, 0]
        out = {key: cache[key] for key in cache if key != "tokens"}
        if fused:
            ga = jnp.take(jnp.take(cache["kv_act"], asrc, axis=1), par_r, axis=2)
            gk, gv = ga[:, :, :page], ga[:, :, page:]
        else:
            gk = jnp.take(jnp.take(cache["k_act"], asrc, axis=1), par_r, axis=2)
            gv = jnp.take(jnp.take(cache["v_act"], asrc, axis=1), par_r, axis=2)
        if quant:
            k_amax = jnp.maximum(jnp.max(jnp.abs(ks), axis=-1, keepdims=True), 1e-6)
            v_amax = jnp.maximum(jnp.max(jnp.abs(vs), axis=-1, keepdims=True), 1e-6)
            kf = jnp.clip(jnp.round(ks * (127.0 / k_amax)), -127, 127).astype(jnp.int8)
            vf = jnp.clip(jnp.round(vs * (127.0 / v_amax)), -127, 127).astype(jnp.int8)
            l = ks.shape[0]
            out["k_scale"] = jax.lax.dynamic_update_slice(
                cache["k_scale"], (k_amax / 127.0).reshape(l, n, 1), (0, 0, step)
            )
            out["v_scale"] = jax.lax.dynamic_update_slice(
                cache["v_scale"], (v_amax / 127.0).reshape(l, n, 1), (0, 0, step)
            )
        else:
            cdtype = (cache["kv"] if fused else cache["k"]).dtype
            kf = ks.astype(cdtype)
            vf = vs.astype(cdtype)
        posP = jnp.arange(page)[None, None, :, None]
        mk = jnp.where(posP == o, kf[:, :, None, :], gk)  # (L, N, P, M)
        mv = jnp.where(posP == o, vf[:, :, None, :], gv)
        completes = o == (page - 1)
        if fused:
            mkv = jnp.concatenate([mk, mv], axis=2)  # fused page [K, V]
            out["kv_act"] = jax.lax.dynamic_update_slice(
                cache["kv_act"], mkv[:, :, None], (0, 0, par_w, 0, 0)
            )
            kvm = jax.lax.dynamic_update_slice(
                cache["kv"], mkv, (0, 0, p_act * 2 * page, 0)
            )
            out["kv"] = jnp.where(completes, kvm, cache["kv"])
            return out
        out["k_act"] = jax.lax.dynamic_update_slice(
            cache["k_act"], mk[:, :, None], (0, 0, par_w, 0, 0)
        )
        out["v_act"] = jax.lax.dynamic_update_slice(
            cache["v_act"], mv[:, :, None], (0, 0, par_w, 0, 0)
        )
        km = jax.lax.dynamic_update_slice(cache["k"], mk, (0, 0, p_act * page, 0))
        vm = jax.lax.dynamic_update_slice(cache["v"], mv, (0, 0, p_act * page, 0))
        out["k"] = jnp.where(completes, km, cache["k"])
        out["v"] = jnp.where(completes, vm, cache["v"])
        return out

    return [make(i, a) for i, a in enumerate(attns)], finalize


def _make_attends(layers, attns, cache, mask_nu, step, nhead):
    """Per-layer ``attend(qh, kh, vh) -> (N, 1, H, D)`` closures for cached
    decode steps, plus ``finalize(khs, vhs) -> (new_k, new_v)``.

    On TPU (with kernel-compatible shapes) this is the fused Pallas
    attention-step kernel (ops/pallas/attention_step.py): the stacked
    cache stays in HBM, only positions <= step are streamed, the fresh
    k/v are written back IN PLACE by the kernel (outputs alias the cache),
    and — the real win — NO per-layer slice of the cache ever appears in
    the XLA graph (XLA materializes such slices as full-cache copy+convert
    fusions: ~8.6 ms/step at the bench shape, BENCHMARKS.md round 2); the
    cache arrays are threaded through the per-layer calls, so ``finalize``
    just returns them. Elsewhere: MultiHeadAttention.attend_cached on
    per-layer slices + one stacked dynamic_update_slice in ``finalize``.
    """
    from ..ops.pallas.attention_step import max_u_for_kernel

    n, u = mask_nu.shape
    fused = "kv" in cache  # fused-KV long paged layout (make_kv_cache)
    kv_key = "kv" if fused else "k"
    m = cache[kv_key].shape[-1]
    paged = "table" in cache
    # SATPU_FORCE_KERNEL_INTERPRET=1 routes CPU runs through the kernel
    # branch in Pallas interpret mode — the only way the suite can cover
    # this branch (its scale plumbing, cache threading, finalize) without
    # a real chip
    interp = os.environ.get("SATPU_FORCE_KERNEL_INTERPRET", "0") == "1"
    use_kernel = (
        (jax.default_backend() == "tpu" or interp)
        and m % 128 == 0
        and u % 8 == 0
        and n % 8 == 0
        # short caches take the whole-row kernel; beyond its VMEM bound a
        # chunked online-softmax kernel streams U (attention_step.py), so
        # this cap is only a pathological-shape backstop for the jnp path
        and u <= max_u_for_kernel(m, max(cache[kv_key].dtype.itemsize, 2))
    )
    quant = "k_scale" in cache
    if use_kernel:
        from ..ops.pallas.attention_step import (
            cached_attention_step, cached_attention_step_paged,
            cached_attention_step_paged_fused, head_segments,
        )

        seg = head_segments(m, nhead)
        cell = dict(cache)
        # fresh-position scale columns, collected across layers and written
        # with ONE stacked dynamic_update_slice in finalize: the traced
        # 30 s decode showed a ~257 us HBM-bound DUS per layer per step
        # when each layer updated the (L, N, U) scale arrays separately
        ksos, vsos = [], []

        def make(i):
            def attend(qh, kh, vh):
                # scales for positions < step only (the kernel handles the
                # fresh position internally), so reading the step-start
                # arrays is exact
                scales = (
                    {"k_scale": cache["k_scale"][i], "v_scale": cache["v_scale"][i]}
                    if quant else {}
                )
                if paged and fused:
                    res = cached_attention_step_paged_fused(
                        qh.reshape(n, m), kh.reshape(n, m), vh.reshape(n, m),
                        mask_nu, cell["kv"], cell["kv_act"],
                        cell["table"], cell["act_src"], step, i, nhead, seg,
                        interpret=interp, **scales,
                    )
                    if quant:
                        out, cell["kv"], cell["kv_act"], kso, vso = res
                    else:
                        out, cell["kv"], cell["kv_act"] = res
                elif paged:
                    res = cached_attention_step_paged(
                        qh.reshape(n, m), kh.reshape(n, m), vh.reshape(n, m),
                        mask_nu, cell["k"], cell["v"],
                        cell["k_act"], cell["v_act"],
                        cell["table"], cell["act_src"], step, i, nhead, seg,
                        interpret=interp, **scales,
                    )
                    if quant:
                        (out, cell["k"], cell["v"], cell["k_act"],
                         cell["v_act"], kso, vso) = res
                    else:
                        out, cell["k"], cell["v"], cell["k_act"], cell["v_act"] = res
                else:
                    res = cached_attention_step(
                        qh.reshape(n, m), kh.reshape(n, m), vh.reshape(n, m),
                        mask_nu, cell["k"], cell["v"], step, i, nhead, seg,
                        interpret=interp, **scales,
                    )
                    if quant:
                        out, cell["k"], cell["v"], kso, vso = res
                    else:
                        out, cell["k"], cell["v"] = res
                if quant:
                    ksos.append(kso[:, 0])
                    vsos.append(vso[:, 0])
                return out.reshape(n, 1, nhead, m // nhead)

            return attend

        def finalize(khs, vhs):
            out = {key: cell[key] for key in cache if key != "tokens"}
            if quant:
                out["k_scale"] = jax.lax.dynamic_update_slice(
                    cache["k_scale"], jnp.stack(ksos)[:, :, None], (0, 0, step)
                )
                out["v_scale"] = jax.lax.dynamic_update_slice(
                    cache["v_scale"], jnp.stack(vsos)[:, :, None], (0, 0, step)
                )
            return out

        return [make(i) for i in range(len(layers))], finalize

    if paged:
        return _make_attends_paged_jnp(attns, cache, mask_nu, step, nhead, quant)

    self_mask = mask_nu[:, None, None, :]

    def make_jnp(i, attn):
        def attend(qh, kh, vh):
            scales = (
                (cache["k_scale"][i], cache["v_scale"][i]) if quant else (None, None)
            )
            return attn.attend_cached(
                qh, kh, vh, cache["k"][i], cache["v"][i], self_mask, step,
                k_scale=scales[0], v_scale=scales[1],
            )

        return attend

    def finalize_jnp(khs, vhs):
        ks = jnp.stack(khs)  # (L, N, 1, M) f32
        vs = jnp.stack(vhs)
        out = {}
        if quant:
            k_amax = jnp.maximum(jnp.max(jnp.abs(ks), axis=-1, keepdims=True), 1e-6)
            v_amax = jnp.maximum(jnp.max(jnp.abs(vs), axis=-1, keepdims=True), 1e-6)
            kq = jnp.clip(jnp.round(ks * (127.0 / k_amax)), -127, 127).astype(jnp.int8)
            vq = jnp.clip(jnp.round(vs * (127.0 / v_amax)), -127, 127).astype(jnp.int8)
            out["k"] = jax.lax.dynamic_update_slice(cache["k"], kq, (0, 0, step, 0))
            out["v"] = jax.lax.dynamic_update_slice(cache["v"], vq, (0, 0, step, 0))
            out["k_scale"] = jax.lax.dynamic_update_slice(
                cache["k_scale"], (k_amax / 127.0)[:, :, :, 0], (0, 0, step)
            )
            out["v_scale"] = jax.lax.dynamic_update_slice(
                cache["v_scale"], (v_amax / 127.0)[:, :, :, 0], (0, 0, step)
            )
            return out
        out["k"] = jax.lax.dynamic_update_slice(
            cache["k"], ks.astype(cache["k"].dtype), (0, 0, step, 0)
        )
        out["v"] = jax.lax.dynamic_update_slice(
            cache["v"], vs.astype(cache["v"].dtype), (0, 0, step, 0)
        )
        return out

    return [make_jnp(i, a) for i, a in enumerate(attns)], finalize_jnp


def sinusoidal_positions(max_len: int, d_model: int) -> jnp.ndarray:
    pos = jnp.arange(max_len)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, d_model, 2).astype(jnp.float32) * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


class ConvolutionFrontEnd(nn.Module):
    """2-D conv subsampler: (B, T, F) -> (B, T/4, F/4 * channels[-1]).

    Conscious deviations from SpeechBrain's ConvolutionFrontEnd (SAME
    padding, swish activation, channel-only LayerNorm) — faster on TPU and
    equivalent in capacity for models trained HERE. Checkpoints ported
    from the reference's torch layout need :class:`SBConvFrontEnd`.
    """

    out_channels: Sequence[int] = (128, 256, 512)
    kernel_sizes: Sequence[int] = (3, 3, 1)
    strides: Sequence[int] = (2, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, f = x.shape
        h = x[..., None]  # (B, T, F, 1)
        for ch, k, s in zip(self.out_channels, self.kernel_sizes, self.strides):
            h = nn.Conv(ch, (k, k), strides=(s, s), padding="SAME")(h)
            h = nn.LayerNorm()(h)
            h = nn.swish(h)
        bb, tt, ff, cc = h.shape
        return h.reshape(bb, tt, ff * cc)


class SBConvFrontEnd(nn.Module):
    """SpeechBrain-0.5-faithful ConvolutionFrontEnd — the layout/semantics
    the HF ``asr.ckpt`` weights were trained under
    (speechbrain/lobes/models/convolution.py, instantiated at
    /root/reference/speechbrain_configs/transformer.yaml:128-135 with
    num_layers_per_block=1, residuals all False):

      per block: Conv2d(k, stride, symmetric k//2 padding — SB's
      get_padding_elem, NOT XLA SAME, whose asymmetric pad shifts windows
      for even lengths) -> LayerNorm over the trailing (freq, channel)
      axes (SB LayerNorm gets input_shape[2:], eps 1e-5) -> LeakyReLU(0.01)
      (SB's default activation).
    """

    out_channels: Sequence[int] = (128, 256, 512)
    kernel_sizes: Sequence[int] = (3, 3, 1)
    strides: Sequence[int] = (2, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, f = x.shape
        h = x[..., None]  # (B, T, F, 1)
        for i, (ch, k, s) in enumerate(
            zip(self.out_channels, self.kernel_sizes, self.strides)
        ):
            pad = k // 2
            h = nn.Conv(
                ch, (k, k), strides=(s, s),
                padding=((pad, pad), (pad, pad)), name=f"conv_{i}",
            )(h)
            h = nn.LayerNorm(
                epsilon=1e-5, reduction_axes=(-2, -1),
                feature_axes=(-2, -1), name=f"norm_{i}",
            )(h)
            h = jnp.where(h >= 0, h, 0.01 * h)  # LeakyReLU, torch default slope
        bb, tt, ff, cc = h.shape
        return h.reshape(bb, tt, ff * cc)


class MultiHeadAttention(nn.Module):
    d_model: int
    nhead: int
    dropout: float = 0.0

    def setup(self):
        d_head = self.d_model // self.nhead
        self.q_proj = nn.DenseGeneral((self.nhead, d_head), name="q")
        self.k_proj = nn.DenseGeneral((self.nhead, d_head), name="k")
        self.v_proj = nn.DenseGeneral((self.nhead, d_head), name="v")
        self.out_proj = nn.DenseGeneral(self.d_model, axis=(-2, -1), name="out")

    def kv(self, x):
        """Precompute key/value heads (cross-attention memory caching)."""
        return self.k_proj(x), self.v_proj(x)

    def attend_kv(self, q, kh, vh, mask=None):
        """Attention with PRECOMPUTED key/value heads."""
        d_head = self.d_model // self.nhead
        scores = jnp.einsum("bqhd,bkhd->bhqk", self.q_proj(q), kh) / math.sqrt(d_head)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
        return self.out_proj(out)

    def attend_kv_grouped(self, q, kh, vh, mask=None):
        """Cross-attention with the memory K/V SHARED across beam groups.

        q: (N, 1, Dm) with N = B * K beams; kh/vh: (B, T, H, D) — NOT
        repeated per beam. The round-1 design repeated the encoder memory
        K times, making every decode step read K x more cross-KV HBM than
        necessary (~2.4 GB/step at the bench shape). mask: (B, 1, 1, T).
        """
        d_head = self.d_model // self.nhead
        b = kh.shape[0]
        qh = self.q_proj(q)  # (N, 1, H, D)
        qg = qh.reshape(b, -1, self.nhead, d_head)  # (B, K, H, D)
        scores = jnp.einsum(
            "bkhd,bthd->bhkt", qg, kh, preferred_element_type=jnp.float32
        ) / math.sqrt(d_head)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)  # (B,1,1,T) broadcast
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhkt,bthd->bkhd", weights, vh, preferred_element_type=jnp.float32
        )
        return self.out_proj(out.reshape(q.shape[0], 1, self.nhead, d_head))

    def attend_cached(self, qh, kh, vh, k_buf, v_buf, mask, step,
                      k_scale=None, v_scale=None):
        """jnp (off-TPU) cached attention context — the reference math for
        ops/pallas/attention_step.py's fused kernel.

        qh/kh/vh: (N, 1, H, D) current-token heads; k_buf/v_buf: (N, U, M)
        cache (heads flat) holding positions < step — position ``step`` of
        the buffers may hold stale data: its score and value contributions
        are overridden with the fresh kh/vh, so no per-layer
        dynamic_update_slice is needed. mask: optional (N, 1, 1, U) key
        mask. Returns the context (N, 1, H, D), f32.
        """
        d_head = self.d_model // self.nhead
        n, u_max, m = k_buf.shape
        if k_scale is not None:  # int8 cache: dequant (scales (N, U) f32)
            k_buf = k_buf.astype(jnp.float32) * k_scale[:, :, None]
            v_buf = v_buf.astype(jnp.float32) * v_scale[:, :, None]
        kb = k_buf.reshape(n, u_max, self.nhead, d_head)
        vb = v_buf.reshape(n, u_max, self.nhead, d_head)
        # Positions >= step are UNDEFINED after a beam reorder
        # (beam_gather_rows only copies positions <= step, and position
        # ``step`` itself is stale even then). Zero them BEFORE the value
        # einsum: a softmax weight of 0 does not protect against 0*Inf/NaN
        # garbage, and the additive stale-value correction below relies on
        # exact cancellation that fails for non-finite stale bytes. The
        # Pallas kernel zeroes vv for the same reason; the fresh token's
        # value contribution is added explicitly at the end, in f32.
        pos_v = jnp.arange(u_max)[None, :, None, None]  # (1, U, 1, 1)
        vb = jnp.where(pos_v < step, vb, jnp.zeros_like(vb))
        # cast the single-token operand to the cache dtype (bf16 caches then
        # feed the MXU natively instead of materializing an f32 copy of the
        # whole buffer); accumulate in f32
        qc = qh.astype(k_buf.dtype)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", qc, kb, preferred_element_type=jnp.float32
        ) / math.sqrt(d_head)
        s_new = jnp.einsum(
            "bqhd,bqhd->bhq", qh, kh, preferred_element_type=jnp.float32
        )[..., None] / math.sqrt(d_head)
        pos = jnp.arange(u_max)[None, None, None, :]
        scores = jnp.where(pos == step, s_new, scores)
        scores = jnp.where(pos <= step, scores, NEG_INF)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)  # (N, H, 1, U)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", weights.astype(v_buf.dtype), vb,
            preferred_element_type=jnp.float32,
        )
        # position `step` was zeroed above; add the fresh token's value
        # contribution directly (no stale-value cancellation needed)
        w_step = jax.lax.dynamic_slice_in_dim(weights, step, 1, axis=3)  # (N,H,1,1)
        return out + jnp.transpose(w_step, (0, 2, 1, 3)) * vh

    def __call__(self, q, kv, mask=None, train: bool = False):
        """Full (non-incremental) attention."""
        d_head = self.d_model // self.nhead
        qh = self.q_proj(q)
        kh = self.k_proj(kv)
        vh = self.v_proj(kv)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d_head)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0 and train:
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
        return self.out_proj(out)


class FeedForward(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float = 0.0
    # exact erf GELU (torch nn.GELU default) instead of flax's tanh
    # approximation — required for <=1e-4 parity with ported SpeechBrain
    # checkpoints (sb_compat mode); the approximate default stays for
    # this repo's own trained models.
    exact_gelu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.d_ffn)(x)
        h = nn.gelu(h, approximate=not self.exact_gelu)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.d_model)(h)


class EncoderLayer(nn.Module):
    """Post-norm (normalize_before=False, convae.yaml:158) encoder layer."""

    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.0
    exact_gelu: bool = False

    def setup(self):
        # explicit names preserve the parameter tree of the original
        # nn.compact implementation (ported checkpoints depend on it)
        self.attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout, name="attn")
        self.ln1 = nn.LayerNorm(name="LayerNorm_0")
        self.ff = FeedForward(self.d_model, self.d_ffn, self.dropout,
                              exact_gelu=self.exact_gelu, name="FeedForward_0")
        self.ln2 = nn.LayerNorm(name="LayerNorm_1")

    def __call__(self, x, mask=None, train: bool = False):
        attn = self.attn(x, x, mask, train)
        x = self.ln1(x + attn)
        ff = self.ff(x, train)
        return self.ln2(x + ff)

    def decode_step(self, x, attend):
        """Cached single-token step. ``attend(qh, kh, vh) -> (N, 1, H, D)``
        computes the attention context against the CALLER-owned cache
        (fused Pallas kernel on TPU, MultiHeadAttention.attend_cached
        elsewhere). Returns (out, kh, vh flat (N, 1, M)) — the caller owns
        the stacked cache write."""
        n = x.shape[0]
        qh = self.attn.q_proj(x)
        kh = self.attn.k_proj(x)
        vh = self.attn.v_proj(x)
        attn = self.attn.out_proj(attend(qh, kh, vh))
        x = self.ln1(x + attn)
        return (
            self.ln2(x + self.ff(x, False)),
            kh.reshape(n, 1, -1),
            vh.reshape(n, 1, -1),
        )


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.0
    exact_gelu: bool = False

    def setup(self):
        self.self_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout)
        self.cross_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout)
        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.ln3 = nn.LayerNorm()
        self.ff = FeedForward(self.d_model, self.d_ffn, self.dropout,
                              exact_gelu=self.exact_gelu)

    def cross_kv(self, memory):
        """Precompute the cross-attention K/V heads of the encoder memory —
        computed ONCE per decode instead of at every step (dominant cost of
        naive incremental decoding)."""
        return self.cross_attn.kv(memory)

    def __call__(self, x, memory, self_mask=None, cross_mask=None, train: bool = False,
                 cross_kv=None):
        attn = self.self_attn(x, x, self_mask, train)
        x = self.ln1(x + attn)
        if cross_kv is not None:
            cross = self.cross_attn.attend_kv(x, cross_kv[0], cross_kv[1], cross_mask)
        else:
            cross = self.cross_attn(x, memory, cross_mask, train)
        x = self.ln2(x + cross)
        return self.ln3(x + self.ff(x, train))

    def decode_step(self, x, attend, cross_kv, cross_mask):
        """Cached single-token step with beam-grouped cross-attention.

        ``attend(qh, kh, vh)`` computes the cached self-attention context
        (see EncoderLayer.decode_step); cross_kv: (kh, vh) of the encoder
        memory, (B, T, H, D) with N = B * beams rows in x. Returns
        (out, kh, vh flat) for the caller's stacked cache write.
        """
        n = x.shape[0]
        qh = self.self_attn.q_proj(x)
        kh = self.self_attn.k_proj(x)
        vh = self.self_attn.v_proj(x)
        attn = self.self_attn.out_proj(attend(qh, kh, vh))
        x = self.ln1(x + attn)
        cross = self.cross_attn.attend_kv_grouped(x, cross_kv[0], cross_kv[1], cross_mask)
        x = self.ln2(x + cross)
        return (
            self.ln3(x + self.ff(x, False)),
            kh.reshape(n, 1, -1),
            vh.reshape(n, 1, -1),
        )


class TransformerASR(nn.Module):
    """Encoder-decoder ASR transformer.

    ``__call__(src, tgt_tokens, src_lengths)`` -> (enc_out, dec_out).
    ``encode(src, src_lengths)`` -> enc_out (the utility-loss hot path).
    ``decode_step`` exposes single-step decoding for the beam search.
    """

    input_size: int = 10240
    tgt_vocab: int = 5000
    d_model: int = 768
    nhead: int = 8
    num_encoder_layers: int = 12
    num_decoder_layers: int = 6
    d_ffn: int = 3072
    dropout: float = 0.0
    max_len: int = 5000
    pad_index: int = 0
    # SpeechBrain-0.5 forward parity for PORTED reference checkpoints:
    # final LayerNorm after the encoder and decoder stacks (SB's
    # TransformerEncoder/Decoder apply self.norm unconditionally, even
    # post-norm) and exact erf GELU. Off by default — this repo's own
    # trained checkpoints have no such params.
    sb_compat: bool = False

    def setup(self):
        self.input_proj = nn.Dense(self.d_model)
        self.pe = sinusoidal_positions(self.max_len, self.d_model)
        self.embed = nn.Embed(self.tgt_vocab, self.d_model)
        self.encoder_layers = [
            EncoderLayer(self.d_model, self.nhead, self.d_ffn, self.dropout,
                         exact_gelu=self.sb_compat, name=f"enc_{i}")
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DecoderLayer(self.d_model, self.nhead, self.d_ffn, self.dropout,
                         exact_gelu=self.sb_compat, name=f"dec_{i}")
            for i in range(self.num_decoder_layers)
        ]
        if self.sb_compat:
            self.enc_norm = nn.LayerNorm(name="enc_norm")
            self.dec_norm = nn.LayerNorm(name="dec_norm")

    def encode(self, src, src_lengths=None, train: bool = False):
        b, t, _ = src.shape
        x = self.input_proj(src) + self.pe[None, :t]
        mask = None
        if src_lengths is not None:
            valid = lengths_to_padding_mask(src_lengths, t)  # (B, T)
            mask = valid[:, None, None, :]  # (B, 1, 1, T) keys masked
        for layer in self.encoder_layers:
            x = layer(x, mask, train)
        if self.sb_compat:
            x = self.enc_norm(x)
        return x

    def decode(self, tgt_tokens, memory, src_lengths=None, train: bool = False):
        b, u = tgt_tokens.shape
        t = memory.shape[1]
        x = self.embed(tgt_tokens) * math.sqrt(self.d_model) + self.pe[None, :u]
        causal = jnp.tril(jnp.ones((u, u), bool))[None, None]
        not_pad = (tgt_tokens != self.pad_index)[:, None, None, :]
        self_mask = causal & not_pad
        cross_mask = None
        if src_lengths is not None:
            cross_mask = lengths_to_padding_mask(src_lengths, t)[:, None, None, :]
        for layer in self.decoder_layers:
            x = layer(x, memory, self_mask, cross_mask, train)
        if self.sb_compat:
            x = self.dec_norm(x)
        return x

    def __call__(self, src, tgt_tokens, src_lengths=None, train: bool = False):
        memory = self.encode(src, src_lengths, train)
        dec = self.decode(tgt_tokens, memory, src_lengths, train)
        return memory, dec

    # -- KV-cached incremental decoding (beam-search hot path) ------------------

    def init_cache(self, batch: int, u_max: int, dtype=jnp.float32) -> dict:
        return make_kv_cache(
            batch, u_max, self.num_decoder_layers, self.nhead,
            self.d_model // self.nhead, dtype, self.pad_index,
        )

    def cross_kv(self, memory):
        """Per-layer precomputed cross-attention K/V of the encoder memory."""
        return [layer.cross_kv(memory) for layer in self.decoder_layers]

    def decode_step(self, token, memory, cache, step, src_lengths=None, cross_kv=None):
        """One decoder step with the stacked KV cache.

        token: (N,) int32 at position ``step`` with N = B * beams;
        ``memory``: (B, T, D) encoder states — NOT repeated per beam
        (cross-attention groups the N query rows over B memory rows);
        ``cache``: dict from :func:`make_kv_cache`; ``cross_kv``: optional
        per-layer precomputed memory K/V (from :meth:`cross_kv` — avoids
        reprojecting the memory every step); ``src_lengths``: (B,).
        Returns (hidden (N, D), new_cache). O(U) per step; key masking
        matches the full path (causal + pad keys excluded). All layers'
        new K/V are written with ONE stacked dynamic_update_slice.
        """
        t = memory.shape[1]
        n = token.shape[0]
        x = self.embed(token[:, None]) * math.sqrt(self.d_model)
        x = x + jax.lax.dynamic_slice_in_dim(self.pe, step, 1, axis=0)[None]
        tok_buf = jax.lax.dynamic_update_slice_in_dim(
            cache["tokens"], token[:, None], step, axis=1
        )
        cross_mask = None
        if src_lengths is not None:
            cross_mask = lengths_to_padding_mask(src_lengths, t)[:, None, None, :]
        mask_nu = tok_buf != self.pad_index
        attends, finalize = _make_attends(
            self.decoder_layers, [l.self_attn for l in self.decoder_layers],
            cache, mask_nu, step, self.nhead,
        )
        khs, vhs = [], []
        for i, layer in enumerate(self.decoder_layers):
            ckv = cross_kv[i] if cross_kv is not None else layer.cross_kv(memory)
            x, kh, vh = layer.decode_step(x, attends[i], ckv, cross_mask)
            khs.append(kh)
            vhs.append(vh)
        if self.sb_compat:
            x = self.dec_norm(x)
        return x[:, 0], {**finalize(khs, vhs), "tokens": tok_buf}


class TransformerLM(nn.Module):
    """Causal LM: 12 encoder layers over normalized token embeddings."""

    vocab: int = 5000
    d_model: int = 768
    nhead: int = 12
    num_layers: int = 12
    d_ffn: int = 3072
    dropout: float = 0.0
    max_len: int = 5000
    pad_index: int = 0
    # SpeechBrain-0.5 parity mode for PORTED reference lm.ckpt weights:
    # final encoder LayerNorm, exact erf GELU, and SB's output head —
    # Linear(d_model -> d_model//2) -> LayerNorm(eps 1e-5) ->
    # Linear(-> vocab) (TransformerLM.output_proj). Default off: this
    # repo's own LMs use a single Dense head.
    sb_compat: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.d_model)
        self.pe = sinusoidal_positions(self.max_len, self.d_model)
        self.layers = [
            EncoderLayer(self.d_model, self.nhead, self.d_ffn, self.dropout,
                         exact_gelu=self.sb_compat, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        if self.sb_compat:
            self.norm = nn.LayerNorm(name="norm")
            self.out_a = nn.Dense(self.d_model // 2, name="out_a")
            self.out_ln = nn.LayerNorm(epsilon=1e-5, name="out_ln")
            self.out_b = nn.Dense(self.vocab, name="out_b")
        else:
            self.out = nn.Dense(self.vocab)

    def _head(self, x):
        if self.sb_compat:
            return self.out_b(self.out_ln(self.out_a(self.norm(x))))
        return self.out(x)

    def __call__(self, tokens, train: bool = False):
        b, u = tokens.shape
        x = self.embed(tokens) * math.sqrt(self.d_model) + self.pe[None, :u]
        causal = jnp.tril(jnp.ones((u, u), bool))[None, None]
        not_pad = (tokens != self.pad_index)[:, None, None, :]
        mask = causal & not_pad
        for layer in self.layers:
            x = layer(x, mask, train)
        return self._head(x)

    def init_cache(self, batch: int, u_max: int, dtype=jnp.float32) -> dict:
        return make_kv_cache(
            batch, u_max, self.num_layers, self.nhead,
            self.d_model // self.nhead, dtype, self.pad_index,
        )

    def prepare_megastep(self, params: dict):
        """Stack this LM's layer weights for the whole-step megakernel
        (ops/pallas/lm_megastep.py). Call ONCE per decode, outside the
        step scan; pass the result as ``mega=`` to decode_step."""
        from ..ops.pallas.lm_megastep import prepare_lm_megastep

        return prepare_lm_megastep(
            params, self.num_layers, self.d_model, self.d_ffn
        )

    def decode_step(self, token, cache, step, mega=None):
        """(N,) token at position ``step`` -> ((N, V) logits, new_cache).

        Stacked cache: all layers' new K/V land in one
        dynamic_update_slice (see make_kv_cache). With ``mega`` (the
        stacked weights from :meth:`prepare_megastep`) and a fused-KV
        paged cache on TPU, the WHOLE layer stack runs in one Pallas
        megakernel instead of 12 per-layer kernel invocations + XLA
        matmuls (the per-invocation dispatch/ramp dominates the 30 s
        decode step — BENCHMARKS.md round 4)."""
        x = self.embed(token[:, None]) * math.sqrt(self.d_model)
        x = x + jax.lax.dynamic_slice_in_dim(self.pe, step, 1, axis=0)[None]
        tok_buf = jax.lax.dynamic_update_slice_in_dim(
            cache["tokens"], token[:, None], step, axis=1
        )
        mask_nu = tok_buf != self.pad_index
        # SATPU_LM_MEGA_INTERPRET=1 routes the megakernel through Pallas
        # interpret mode on CPU (test coverage) WITHOUT flipping the
        # per-layer reference path into kernel-interpret mode, so tests
        # can compare megakernel vs the jnp paged fallback directly
        interp = (
            os.environ.get("SATPU_FORCE_KERNEL_INTERPRET", "0") == "1"
            or os.environ.get("SATPU_LM_MEGA_INTERPRET", "0") == "1"
        )
        use_mega = (
            mega is not None
            and "kv" in cache  # fused-KV paged layout only
            and (jax.default_backend() == "tpu" or interp)
            and os.environ.get("SATPU_LM_MEGA", "1") != "0"
        )
        if use_mega:
            from ..ops.pallas.lm_megastep import lm_megastep

            quant = "k_scale" in cache
            scales = (
                {"k_scale": cache["k_scale"], "v_scale": cache["v_scale"]}
                if quant else {}
            )
            res = lm_megastep(
                x[:, 0], mask_nu, cache["kv"], cache["kv_act"],
                cache["table"], cache["act_src"], step,
                mega[0], mega[1], self.nhead,
                exact_gelu=self.sb_compat, interpret=interp, **scales,
            )
            out = {k: cache[k] for k in cache if k != "tokens"}
            if quant:
                xf, out["kv"], out["kv_act"], kso, vso = res
                out["k_scale"] = jax.lax.dynamic_update_slice(
                    cache["k_scale"], kso[:, :, :1], (0, 0, step)
                )
                out["v_scale"] = jax.lax.dynamic_update_slice(
                    cache["v_scale"], vso[:, :, :1], (0, 0, step)
                )
            else:
                xf, out["kv"], out["kv_act"] = res
            return self._head(xf), {**out, "tokens": tok_buf}
        attends, finalize = _make_attends(
            self.layers, [l.attn for l in self.layers],
            cache, mask_nu, step, self.nhead,
        )
        khs, vhs = [], []
        for i, layer in enumerate(self.layers):
            x, kh, vh = layer.decode_step(x, attends[i])
            khs.append(kh)
            vhs.append(vh)
        return self._head(x[:, 0]), {**finalize(khs, vhs), "tokens": tok_buf}
