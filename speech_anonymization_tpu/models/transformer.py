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

    @nn.compact
    def __call__(self, q, kv, mask=None, train: bool = False):
        d_head = self.d_model // self.nhead
        dense = lambda name: nn.DenseGeneral((self.nhead, d_head), name=name)
        qh = dense("q")(q)
        kh = dense("k")(kv)
        vh = dense("v")(kv)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d_head)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0 and train:
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
        return nn.DenseGeneral(self.d_model, axis=(-2, -1), name="out")(out)


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
    def __call__(self, x, mask=None, train: bool = False):
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout)(x, x, mask, train)
        x = nn.LayerNorm()(x + attn)
        ff = FeedForward(self.d_model, self.d_ffn, self.dropout)(x, train)
        return nn.LayerNorm()(x + ff)


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, memory, self_mask=None, cross_mask=None, train: bool = False):
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout, name="self_attn")(
            x, x, self_mask, train
        )
        x = nn.LayerNorm()(x + attn)
        cross = MultiHeadAttention(self.d_model, self.nhead, self.dropout, name="cross_attn")(
            x, memory, cross_mask, train
        )
        x = nn.LayerNorm()(x + cross)
        ff = FeedForward(self.d_model, self.d_ffn, self.dropout)(x, train)
        return nn.LayerNorm()(x + ff)


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
