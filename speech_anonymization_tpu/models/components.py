"""Shared model components.

Data layout convention: channels-last (B, W, C) / (B, H, W, C) throughout —
the native layout for XLA conv tiling on TPU (the reference uses torch NCW;
layout is an implementation detail, semantics are preserved).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def glu(x: jax.Array) -> jax.Array:
    """The reference's custom 'GLU': ``x * sigmoid(x)`` — i.e. SiLU/swish.

    NOT the dimension-halving gated linear unit. The reference defines it
    this way on purpose ("the Voice Conversion CycleGAN paper assumes GLU
    won't reduce the dimension", models/ConvAutoEncoder.py:113-120) and the
    semantics are preserved exactly (SURVEY.md §7 quirk list).
    """
    return x * jax.nn.sigmoid(x)


class GLU(nn.Module):
    """Module wrapper for :func:`glu` (models/ConvAutoEncoder.py:113-120)."""

    @nn.compact
    def __call__(self, x):
        return glu(x)


class InstanceNorm(nn.Module):
    """InstanceNorm with affine params (torch InstanceNorm1d/2d, affine=True).

    Normalizes each (sample, channel) independently over the spatial axes
    (biased variance, eps=1e-5, no running stats — torch defaults used by
    models/ConvAutoEncoder.py:146 etc.). Input (B, *spatial, C).
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class PixelShuffle1D(nn.Module):
    """The reference's custom 3-D 'PixelShuffle': (B, W, C) -> (B, 2W, C/2).

    models/ConvAutoEncoder.py:122-133 (a pure reshape in channel-first
    layout: view(n, c/2, 2w)). In channels-last the equivalent reshape
    interleaves channel pairs into adjacent positions.
    """

    upscale_factor: int = 2

    @nn.compact
    def __call__(self, x):
        b, w, c = x.shape
        r = self.upscale_factor
        # torch view(n, c//r, r*w) on (n, c, w): output[n, co, j] with
        # co = flat // (r*w), j = flat % (r*w), flat = ci*w + wi.
        # Channels-last equivalent: transpose to (b, c, w), reshape, back.
        y = jnp.transpose(x, (0, 2, 1)).reshape(b, c // r, r * w)
        return jnp.transpose(y, (0, 2, 1))


def pixel_shuffle_2d(x: jax.Array, r: int = 2) -> jax.Array:
    """torch nn.PixelShuffle on (B, H, W, C) -> (B, rH, rW, C/r^2).

    Used by CycleGANGenerator's upsample blocks (models/ConvAutoEncoder.py:
    406-417). torch semantics: output[:, c, rh+i, rw+j] = in[:, c*r*r + i*r + j, h, w].
    """
    b, h, w, c = x.shape
    co = c // (r * r)
    # channels-last: reorganize channel index (co, i, j)
    y = x.reshape(b, h, w, co, r, r)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))  # b, h, i, w, j, co
    return y.reshape(b, h * r, w * r, co)


class Conv1dTorch(nn.Module):
    """1-D conv with explicit torch-style symmetric padding.

    torch Conv1d(k, stride, padding=p) == lax conv with explicit (p, p)
    padding; flax 'SAME' has a different left/right split for even overhang
    under stride>1, so we always pass the torch padding explicitly.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
        )(x)


class ConvTranspose1dTorch(nn.Module):
    """1-D transposed conv matching torch ConvTranspose1d output shape:
    out = (W-1)*stride - 2*padding + kernel + output_padding.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        # lax transposed conv pads (k-1-p) on both sides of the dilated
        # input; torch additionally appends output_padding on the right.
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(k,),
            strides=(s,),
            padding=[(k - 1 - p, k - 1 - p + op)],
            use_bias=self.use_bias,
        )(x)
