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
in the reference configs, kept as a parameter. bfloat16-friendly: pass
``compute_dtype=jnp.bfloat16`` to run matmuls on the MXU's native dtype
while keeping f32 params/softmax.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def lengths_to_padding_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) relative lengths -> (B, max_len) True=valid mask."""
    n = jnp.round(lengths * max_len)
    return jnp.arange(max_len)[None, :] < n[:, None]


def make_kv_cache(batch: int, u_max: int, num_layers: int, nhead: int, d_head: int,
                  dtype=jnp.float32, pad_index: int = 0) -> dict:
    """KV + token buffers for incremental decoding (callable outside
    apply — flax setup attributes are unavailable there). The token buffer
    lets cached steps reproduce the full path's pad-key masking."""
    return {
        "layers": [
            {
                "k": jnp.zeros((batch, u_max, nhead, d_head), dtype),
                "v": jnp.zeros((batch, u_max, nhead, d_head), dtype),
            }
            for _ in range(num_layers)
        ],
        # init to pad so un-written positions are masked like the full path
        "tokens": jnp.full((batch, u_max), pad_index, jnp.int32),
    }


def sinusoidal_positions(max_len: int, d_model: int) -> jnp.ndarray:
    pos = jnp.arange(max_len)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, d_model, 2).astype(jnp.float32) * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


class ConvolutionFrontEnd(nn.Module):
    """2-D conv subsampler: (B, T, F) -> (B, T/4, F/4 * channels[-1])."""

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

    def __call__(self, q, kv, mask=None, train: bool = False, cache=None, cache_index=None):
        """Full attention, or single-step cached decoding.

        Cached mode (``cache`` = dict with 'k','v' buffers (B, U_max, H, D),
        ``cache_index`` = current step): q is (B, 1, D_model); the new
        token's k/v are written at ``cache_index`` and q attends over the
        buffer prefix. Returns (out, new_cache) in cached mode.
        """
        d_head = self.d_model // self.nhead
        qh = self.q_proj(q)
        kh = self.k_proj(kv)
        vh = self.v_proj(kv)
        if cache is not None:
            k_buf = jax.lax.dynamic_update_slice_in_dim(cache["k"], kh, cache_index, axis=1)
            v_buf = jax.lax.dynamic_update_slice_in_dim(cache["v"], vh, cache_index, axis=1)
            u_max = k_buf.shape[1]
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, k_buf) / math.sqrt(d_head)
            valid = jnp.arange(u_max)[None, None, None, :] <= cache_index
            scores = jnp.where(valid, scores, NEG_INF)
            if mask is not None:
                scores = jnp.where(mask, scores, NEG_INF)
            weights = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v_buf)
            return self.out_proj(out), {"k": k_buf, "v": v_buf}
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.d_ffn)(x)
        h = nn.gelu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.d_model)(h)


class EncoderLayer(nn.Module):
    """Post-norm (normalize_before=False, convae.yaml:158) encoder layer."""

    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False, cache=None, cache_index=None):
        if cache is not None:
            attn, new_cache = MultiHeadAttention(
                self.d_model, self.nhead, self.dropout, name="attn"
            )(x, x, mask, train, cache=cache, cache_index=cache_index)
        else:
            attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout, name="attn")(
                x, x, mask, train
            )
            new_cache = None
        x = nn.LayerNorm()(x + attn)
        ff = FeedForward(self.d_model, self.d_ffn, self.dropout)(x, train)
        out = nn.LayerNorm()(x + ff)
        if cache is not None:
            return out, new_cache
        return out


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.0

    def setup(self):
        self.self_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout)
        self.cross_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout)
        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.ln3 = nn.LayerNorm()
        self.ff = FeedForward(self.d_model, self.d_ffn, self.dropout)

    def cross_kv(self, memory):
        """Precompute the cross-attention K/V heads of the encoder memory —
        computed ONCE per decode instead of at every step (dominant cost of
        naive incremental decoding)."""
        return self.cross_attn.kv(memory)

    def __call__(self, x, memory, self_mask=None, cross_mask=None, train: bool = False,
                 cache=None, cache_index=None, cross_kv=None):
        if cache is not None:
            attn, new_cache = self.self_attn(
                x, x, self_mask, train, cache=cache, cache_index=cache_index
            )
        else:
            attn = self.self_attn(x, x, self_mask, train)
            new_cache = None
        x = self.ln1(x + attn)
        if cross_kv is not None:
            cross = self.cross_attn.attend_kv(x, cross_kv[0], cross_kv[1], cross_mask)
        else:
            cross = self.cross_attn(x, memory, cross_mask, train)
        x = self.ln2(x + cross)
        out = self.ln3(x + self.ff(x, train))
        if cache is not None:
            return out, new_cache
        return out


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

    def setup(self):
        self.input_proj = nn.Dense(self.d_model)
        self.pe = sinusoidal_positions(self.max_len, self.d_model)
        self.embed = nn.Embed(self.tgt_vocab, self.d_model)
        self.encoder_layers = [
            EncoderLayer(self.d_model, self.nhead, self.d_ffn, self.dropout, name=f"enc_{i}")
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DecoderLayer(self.d_model, self.nhead, self.d_ffn, self.dropout, name=f"dec_{i}")
            for i in range(self.num_decoder_layers)
        ]

    def encode(self, src, src_lengths=None, train: bool = False):
        b, t, _ = src.shape
        x = self.input_proj(src) + self.pe[None, :t]
        mask = None
        if src_lengths is not None:
            valid = lengths_to_padding_mask(src_lengths, t)  # (B, T)
            mask = valid[:, None, None, :]  # (B, 1, 1, T) keys masked
        for layer in self.encoder_layers:
            x = layer(x, mask, train)
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
        return x

    def __call__(self, src, tgt_tokens, src_lengths=None, train: bool = False):
        memory = self.encode(src, src_lengths, train)
        dec = self.decode(tgt_tokens, memory, src_lengths, train)
        return memory, dec

    # -- KV-cached incremental decoding (beam-search hot path) ------------------

    def init_cache(self, batch: int, u_max: int, dtype=jnp.float32) -> list[dict]:
        d_head = self.d_model // self.nhead
        return [
            {
                "k": jnp.zeros((batch, u_max, self.nhead, d_head), dtype),
                "v": jnp.zeros((batch, u_max, self.nhead, d_head), dtype),
            }
            for _ in range(self.num_decoder_layers)
        ]

    def cross_kv(self, memory):
        """Per-layer precomputed cross-attention K/V of the encoder memory."""
        return [layer.cross_kv(memory) for layer in self.decoder_layers]

    def decode_step(self, token, memory, cache, step, src_lengths=None, cross_kv=None):
        """One decoder step with KV cache.

        token: (B,) int32 token at position ``step``; cache: dict from
        :func:`make_kv_cache`; ``cross_kv``: optional per-layer precomputed
        memory K/V (from :meth:`cross_kv` — avoids reprojecting the memory
        every step). Returns (hidden (B, D), new_cache). O(U) per step;
        key masking matches the full path (causal + pad keys excluded).
        """
        b = token.shape[0]
        t = memory.shape[1]
        x = self.embed(token[:, None]) * math.sqrt(self.d_model)
        x = x + jax.lax.dynamic_slice_in_dim(self.pe, step, 1, axis=0)[None]
        tok_buf = jax.lax.dynamic_update_slice_in_dim(
            cache["tokens"], token[:, None], step, axis=1
        )
        self_mask = (tok_buf != self.pad_index)[:, None, None, :]
        cross_mask = None
        if src_lengths is not None:
            cross_mask = lengths_to_padding_mask(src_lengths, t)[:, None, None, :]
        new_layers = []
        for i, (layer, layer_cache) in enumerate(zip(self.decoder_layers, cache["layers"])):
            x, c = layer(
                x, memory, self_mask, cross_mask, False,
                cache=layer_cache, cache_index=step,
                cross_kv=cross_kv[i] if cross_kv is not None else None,
            )
            new_layers.append(c)
        return x[:, 0], {"layers": new_layers, "tokens": tok_buf}


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

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.d_model)
        self.pe = sinusoidal_positions(self.max_len, self.d_model)
        self.layers = [
            EncoderLayer(self.d_model, self.nhead, self.d_ffn, self.dropout, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.out = nn.Dense(self.vocab)

    def __call__(self, tokens, train: bool = False):
        b, u = tokens.shape
        x = self.embed(tokens) * math.sqrt(self.d_model) + self.pe[None, :u]
        causal = jnp.tril(jnp.ones((u, u), bool))[None, None]
        not_pad = (tokens != self.pad_index)[:, None, None, :]
        mask = causal & not_pad
        for layer in self.layers:
            x = layer(x, mask, train)
        return self.out(x)

    def init_cache(self, batch: int, u_max: int, dtype=jnp.float32) -> list[dict]:
        d_head = self.d_model // self.nhead
        return [
            {
                "k": jnp.zeros((batch, u_max, self.nhead, d_head), dtype),
                "v": jnp.zeros((batch, u_max, self.nhead, d_head), dtype),
            }
            for _ in range(self.num_layers)
        ]

    def decode_step(self, token, cache, step):
        """(B,) token at position ``step`` -> ((B, V) logits, new_cache)."""
        x = self.embed(token[:, None]) * math.sqrt(self.d_model)
        x = x + jax.lax.dynamic_slice_in_dim(self.pe, step, 1, axis=0)[None]
        tok_buf = jax.lax.dynamic_update_slice_in_dim(
            cache["tokens"], token[:, None], step, axis=1
        )
        mask = (tok_buf != self.pad_index)[:, None, None, :]
        new_layers = []
        for layer, layer_cache in zip(self.layers, cache["layers"]):
            x, c = layer(x, mask, False, cache=layer_cache, cache_index=step)
            new_layers.append(c)
        return self.out(x[:, 0]), {"layers": new_layers, "tokens": tok_buf}
