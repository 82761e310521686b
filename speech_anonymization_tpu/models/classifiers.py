"""Adversarial sex classifiers (sit behind a gradient-reversal layer).

Reference: models/ConvAutoEncoder.py:30-110 (TDNNSexClassifier,
SexClassifier) and models/FullyConnected.py:65-116 (FullyConnSexClassifier,
DummyFullyConnSexClassifier). All return per-utterance (B, 2) log-softmax
logits and reverse gradients flowing into the anonymizer bottleneck.

Layout: inputs are channels-last (B, W, C) (the reference uses (B, C, W)).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grl import grad_reverse
from ..ops.pooling import statistics_pooling
from .components import Conv1dTorch


class TDNNSexClassifier(nn.Module):
    """GRL -> BN -> 3 dilated TDNN convs -> stats pooling -> MLP -> log-softmax.

    Reference models/ConvAutoEncoder.py:30-69: Conv1d(128,128,k5,d1) /
    (k3,d2) / (k3,d3), each ReLU+BN; pooling mean||std -> 256; classify
    256->128->64->2. Sits on the ConvAE 128-channel bottleneck.
    """

    num_classes: int = 2
    channels: int = 128
    grl_scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)
        x = grad_reverse(x, self.grl_scale)
        x = norm()(x)
        for k, d in ((5, 1), (3, 2), (3, 3)):
            x = Conv1dTorch(self.channels, k, dilation=d)(x)  # VALID padding
            x = nn.relu(x)
            x = norm()(x)
        pooled = statistics_pooling(x, lengths)  # (B, 2*channels)
        h = nn.Dense(128)(pooled)
        h = nn.relu(h)
        h = norm()(h)
        h = nn.Dense(64)(h)
        h = nn.relu(h)
        h = norm()(h)
        logits = nn.Dense(self.num_classes)(h)
        return jax.nn.log_softmax(logits, axis=-1)


class SexClassifier1D(nn.Module):
    """GRL -> BN -> per-step MLP 128->256->256 -> stats pooling -> deep MLP.

    Reference models/ConvAutoEncoder.py:72-110 (used by CycleGANGenerator;
    there it is fed an already-pooled vector — see cyclegan.py for the
    faithful call pattern). Input (B, W, 128) or pooled (B, 128).
    """

    num_classes: int = 2
    grl_scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)
        x = grad_reverse(x, self.grl_scale)
        squeeze_time = x.ndim == 2
        if squeeze_time:
            x = x[:, None, :]  # (B, 1, C) — matches reference feeding a pooled vector
        x = norm()(x)
        h = nn.Dense(256)(x)
        h = nn.relu(h)
        h = nn.Dense(256)(h)
        h = nn.relu(h)
        pooled = statistics_pooling(h)  # (B, 512)
        h = nn.Dense(256)(pooled)
        h = norm()(h)
        h = nn.relu(h)
        h = nn.Dense(128)(h)
        h = nn.relu(h)
        h = nn.Dense(32)(h)
        h = norm()(h)
        h = nn.relu(h)
        logits = nn.Dense(self.num_classes)(h)
        return jax.nn.log_softmax(logits, axis=-1)


class FullyConnSexClassifier(nn.Module):
    """GRL -> BN(20) -> per-frame MLP 20->40->40 -> stats pooling -> MLP.

    Reference models/FullyConnected.py:65-104. Operates on the 20-dim FC
    bottleneck, (B, T, 20). classify: 80->40 BN ReLU ->40 ReLU ->20 BN ->2.
    """

    num_classes: int = 2
    bottleneck_dim: int = 20
    grl_scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)
        x = grad_reverse(x, self.grl_scale)
        x = norm()(x)
        h = nn.Dense(40)(x)
        h = nn.relu(h)
        h = nn.Dense(40)(h)
        h = nn.relu(h)
        pooled = statistics_pooling(h, lengths)  # (B, 80)
        h = nn.Dense(40)(pooled)
        h = norm()(h)
        h = nn.relu(h)
        h = nn.Dense(40)(h)
        h = nn.relu(h)
        h = nn.Dense(20)(h)
        h = norm()(h)
        logits = nn.Dense(self.num_classes)(h)
        return jax.nn.log_softmax(logits, axis=-1)


class DummyFullyConnSexClassifier(nn.Module):
    """Debug artifact: GRL -> 1024->512->2 MLP (models/FullyConnected.py:106-116)."""

    num_classes: int = 2
    grl_scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = grad_reverse(x, self.grl_scale)
        h = nn.relu(nn.Dense(512)(x))
        logits = nn.Dense(self.num_classes)(h)
        return jax.nn.log_softmax(logits, axis=-1)
