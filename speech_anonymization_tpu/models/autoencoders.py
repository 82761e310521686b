"""Anonymizer autoencoders.

Reference: models/ConvAutoEncoder.py:136-200 (ConvAutoencoder) and
models/FullyConnected.py:118-209 (FullyConnectedAutoencoder + Dummy).
Contract: ``apply(feats) -> (reconstruction, sex_log_probs)`` with feats
(B, T, 80); reconstruction has the same shape; sex_log_probs (B, 2).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .components import Conv1dTorch, ConvTranspose1dTorch, InstanceNorm, glu
from .classifiers import (
    DummyFullyConnSexClassifier,
    FullyConnSexClassifier,
    TDNNSexClassifier,
)


class ConvAutoencoder(nn.Module):
    """Primary conv anonymizer over the *flattened* (B, T*80, 1) feature axis.

    Reference models/ConvAutoEncoder.py:136-200. Encoder: Conv(1->32, k15)
    GLU; Conv(32->64, k5, s2) IN GLU; Conv(64->64, k5) IN GLU;
    Conv(64->128, k5, s2) IN GLU; Conv(128->128, k5) IN GLU. The
    TDNNSexClassifier reads the 128-ch bottleneck. Decoder: Conv(128->128);
    ConvT(128->64, s2, op1) IN GLU; Conv(64->64); ConvT(64->32, s2, op1)
    IN GLU; Conv(32->1, k15). Requires T*80 divisible by 4 (the trainer
    pads T to a multiple of 36 — speechbrain_convae_train.py:62-63).
    """

    num_classes: int = 2
    grl_scale: float = 1.0

    def setup(self):
        self.enc_conv0 = Conv1dTorch(32, 15, padding=7)
        self.enc_conv1 = Conv1dTorch(64, 5, stride=2, padding=2)
        self.enc_in1 = InstanceNorm(64)
        self.enc_conv2 = Conv1dTorch(64, 5, padding=2)
        self.enc_in2 = InstanceNorm(64)
        self.enc_conv3 = Conv1dTorch(128, 5, stride=2, padding=2)
        self.enc_in3 = InstanceNorm(128)
        self.enc_conv4 = Conv1dTorch(128, 5, padding=2)
        self.enc_in4 = InstanceNorm(128)
        self.sex_classifier = TDNNSexClassifier(self.num_classes, grl_scale=self.grl_scale)
        self.dec_conv0 = Conv1dTorch(128, 5, padding=2)
        self.dec_up1 = ConvTranspose1dTorch(64, 5, stride=2, padding=2, output_padding=1)
        self.dec_in1 = InstanceNorm(64)
        self.dec_conv1 = Conv1dTorch(64, 5, padding=2)
        self.dec_up2 = ConvTranspose1dTorch(32, 5, stride=2, padding=2, output_padding=1)
        self.dec_in2 = InstanceNorm(32)
        self.dec_conv2 = Conv1dTorch(1, 15, padding=7)

    def _encode(self, feats):
        b, t, d = feats.shape
        x = feats.reshape(b, t * d, 1)
        x = glu(self.enc_conv0(x))
        x = glu(self.enc_in1(self.enc_conv1(x)))
        x = glu(self.enc_in2(self.enc_conv2(x)))
        x = glu(self.enc_in3(self.enc_conv3(x)))
        return glu(self.enc_in4(self.enc_conv4(x)))  # (B, T*80/4, 128)

    def _decode(self, bottleneck, shape):
        b, t, d = shape
        y = self.dec_conv0(bottleneck)
        y = glu(self.dec_in1(self.dec_up1(y)))
        y = self.dec_conv1(y)
        y = glu(self.dec_in2(self.dec_up2(y)))
        y = self.dec_conv2(y)
        return y.reshape(b, t, d)

    def __call__(self, feats, train: bool = False):
        bottleneck = self._encode(feats)
        sex_log_probs = self.sex_classifier(bottleneck, train=train)
        recon = self._decode(bottleneck, feats.shape)
        return recon, sex_log_probs

    def anonymize(self, feats):
        """Inference-only path: encoder + decoder WITHOUT the adversarial
        classifier head (the classifier exists only to shape training
        gradients; serving it wastes ~25% of inference FLOPs)."""
        return self._decode(self._encode(feats), feats.shape)


class FullyConnectedAutoencoder(nn.Module):
    """Per-frame MLP autoencoder 80->60->40->20 / 20->40->60->80.

    Reference models/FullyConnected.py:118-159 — "best model so far" per
    gender_classifier_train_recon.py:23. FullyConnSexClassifier reads the
    20-dim bottleneck.
    """

    feature_dim: int = 80
    num_classes: int = 2
    grl_scale: float = 1.0

    @nn.compact
    def __call__(self, feats, train: bool = False, lengths=None):
        h = nn.relu(nn.Dense(60)(feats))
        h = nn.relu(nn.Dense(40)(h))
        bottleneck = nn.Dense(20)(h)  # (B, T, 20)

        sex_log_probs = FullyConnSexClassifier(
            self.num_classes, grl_scale=self.grl_scale, name="sex_classifier"
        )(bottleneck, train=train, lengths=lengths)

        y = nn.relu(nn.Dense(40)(bottleneck))
        y = nn.relu(nn.Dense(60)(y))
        recon = nn.Dense(self.feature_dim)(y)
        return recon, sex_log_probs


class DummyFullyConnectedAutoencoder(nn.Module):
    """Debug-only AE with random sex logits (models/FullyConnected.py:162-209).

    The reference emits ``torch.rand(B, 2)`` on CUDA; here the logits come
    from a PRNG stream (rng collection 'dummy') for reproducibility.
    """

    feature_dim: int = 80
    num_classes: int = 2

    @nn.compact
    def __call__(self, feats, train: bool = False):
        h = nn.relu(nn.Dense(60)(feats))
        h = nn.relu(nn.Dense(40)(h))
        bottleneck = nn.Dense(20)(h)
        key = self.make_rng("dummy") if self.has_rng("dummy") else jax.random.PRNGKey(0)
        sex_log_probs = jax.random.uniform(key, (feats.shape[0], self.num_classes))
        y = nn.relu(nn.Dense(40)(bottleneck))
        y = nn.relu(nn.Dense(60)(y))
        recon = nn.Dense(self.feature_dim)(y)
        return recon, sex_log_probs
