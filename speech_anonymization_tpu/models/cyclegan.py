"""CycleGAN-VC2-style 2-D gated generator (alternative anonymizer).

Reference: models/ConvAutoEncoder.py:204-486 (ResidualLayer,
downSample_Generator, CycleGANGenerator). Selectable in place of
ConvAutoencoder at speechbrain_convae_train.py:555. The residual/1D-bridge
blocks are commented out at reference HEAD and therefore not in the live
forward here either (kept as modules for completeness).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .components import InstanceNorm, glu, pixel_shuffle_2d
from .classifiers import SexClassifier1D
from ..ops.pooling import statistics_pooling


def _conv2d(features, kernel, stride=(1, 1), padding=None):
    kh, kw = kernel
    if padding is None:
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return nn.Conv(features, kernel, strides=stride, padding=padding)


class DownSampleGenerator(nn.Module):
    """2-branch gated 2-D conv downsample (models/ConvAutoEncoder.py:263-284):
    (conv+IN)(x) * sigmoid((conv_gates+IN)(x))."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int = 2

    @nn.compact
    def __call__(self, x):
        p = ((self.padding, self.padding), (self.padding, self.padding))
        k = (self.kernel_size, self.kernel_size)
        s = (self.stride, self.stride)
        h = _conv2d(self.features, k, s, p)(x)
        h = InstanceNorm(self.features)(h)
        g = _conv2d(self.features, k, s, p)(x)
        g = InstanceNorm(self.features)(g)
        return h * jax.nn.sigmoid(g)


class ResidualLayer(nn.Module):
    """Two-branch gated 1-D residual block (models/ConvAutoEncoder.py:204-259).

    Not instantiated by the live CycleGANGenerator at reference HEAD; kept
    for component parity. Input (B, W, C_in).
    """

    in_features: int
    out_features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        p = [(self.padding, self.padding)]
        h = nn.Conv(self.out_features, (self.kernel_size,), padding=p)(x)
        h = InstanceNorm(self.out_features)(h)
        g = nn.Conv(self.out_features, (self.kernel_size,), padding=p)(x)
        g = InstanceNorm(self.out_features)(g)
        gated = h * jax.nn.sigmoid(g)
        out = nn.Conv(self.in_features, (self.kernel_size,), padding=p)(gated)
        out = InstanceNorm(self.in_features)(out)
        return x + out


class CycleGANGenerator(nn.Module):
    """(B, T, F) -> (B, T, F) gated 2-D generator + pooled sex classifier.

    Live reference forward (models/ConvAutoEncoder.py:420-486): transpose to
    (B, F, T), add channel dim, gated conv1 (128ch, k(5,15)), two gated
    downsamples (256ch, s2), stats-pool the flattened (C*H) feature map and
    classify, then two PixelShuffle upsample blocks (1024->256, 512->128)
    and a final (5,15) conv back to one channel.
    """

    num_classes: int = 2
    grl_scale: float = 1.0

    @nn.compact
    def __call__(self, feats, train: bool = False):
        b, t, f = feats.shape
        # reference: view(B, F, T).unsqueeze(1) — channels-last: (B, F, T, 1)
        x = jnp.transpose(feats, (0, 2, 1))[..., None]

        k_long = (5, 15)
        h = _conv2d(128, k_long)(x)
        g = _conv2d(128, k_long)(x)
        conv1 = h * jax.nn.sigmoid(g)

        d1 = DownSampleGenerator(256)(conv1)      # (B, F/2, T/2, 256)
        d2 = DownSampleGenerator(256)(d1)         # (B, F/4, T/4, 256)

        # Sex head. The reference stats-pools the flattened (C*H, W) map to
        # (B, 2*C*H) and feeds it to SexClassifier, whose BatchNorm1d(128)
        # cannot accept that width — dead code that never ran (the generator
        # is a commented-out alternative at speechbrain_convae_train.py:555).
        # Working design: project the time-major map to the classifier's
        # 128-dim input, keep the classifier itself faithful.
        bb, hh, ww, cc = d2.shape
        clf_in = jnp.transpose(d2, (0, 2, 1, 3)).reshape(bb, ww, hh * cc)  # (B, W, H*C)
        clf_in = nn.Dense(128, name="sex_head_proj")(clf_in)
        sex_log_probs = SexClassifier1D(
            self.num_classes, grl_scale=self.grl_scale, name="sex_classifier"
        )(clf_in, train=train)

        # upsample 1: conv 256->1024, pixel-shuffle r2 -> 256ch, IN, GLU
        u = _conv2d(1024, (5, 5))(d2)
        u = pixel_shuffle_2d(u, 2)
        u = glu(InstanceNorm(256)(u))
        # upsample 2: conv 256->512, shuffle -> 128ch
        u = _conv2d(512, (5, 5))(u)
        u = pixel_shuffle_2d(u, 2)
        u = glu(InstanceNorm(128)(u))

        out = _conv2d(1, k_long)(u)[..., 0]        # (B, F, T)
        return jnp.transpose(out, (0, 2, 1)), sex_log_probs
