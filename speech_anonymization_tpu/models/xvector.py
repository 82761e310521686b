"""X-vector embedding model + classifier head (the privacy evaluator).

Reference: models/external_gender_classifiers.py:24-183 (a vendored copy of
speechbrain.lobes.models.Xvector), instantiated from gender_classifier.yaml:
97-111 and evaluator_inference.yaml:34-48 with in_channels=80,
tdnn_channels=[512,512,512,512,1500], kernels=[5,3,3,1,1],
dilations=[1,2,3,1,1], LeakyReLU, lin_neurons=128, 2 output classes.

Trained by recipes/gender_classifier_train.py; frozen and used as the
external privacy metric via eval/evaluator.py (classify_feats), replacing
the reference's patched ``EncoderClassifier.classify_batch_feats``
(speechbrain_convae_train.py:139,146).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pooling import statistics_pooling


class Xvector(nn.Module):
    """TDNN x-vector: 5 dilated conv blocks -> stats pooling -> embedding.

    Input (B, T, in_channels); output (B, lin_neurons) embeddings.
    Each block: Conv1d('same' padding) -> LeakyReLU -> BatchNorm.
    """

    in_channels: int = 80
    tdnn_channels: Sequence[int] = (512, 512, 512, 512, 1500)
    tdnn_kernel_sizes: Sequence[int] = (5, 3, 3, 1, 1)
    tdnn_dilations: Sequence[int] = (1, 2, 3, 1, 1)
    lin_neurons: int = 128

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        for ch, k, d in zip(self.tdnn_channels, self.tdnn_kernel_sizes, self.tdnn_dilations):
            eff = (k - 1) * d
            x = nn.Conv(
                ch,
                kernel_size=(k,),
                kernel_dilation=(d,),
                padding=[(eff // 2, eff - eff // 2)],
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        pooled = statistics_pooling(x, lengths)  # (B, 2*1500)
        return nn.Dense(self.lin_neurons)(pooled)


class XvectorClassifier(nn.Module):
    """MLP head over x-vectors -> (B, out_neurons) log-softmax.

    Reference models/external_gender_classifiers.py:118-183: activation+BN,
    lin_blocks x (Linear + activation + BN), final Linear, log-softmax.
    """

    lin_blocks: int = 1
    lin_neurons: int = 128
    out_neurons: int = 2

    @nn.compact
    def __call__(self, emb, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)
        h = nn.leaky_relu(emb, negative_slope=0.01)
        h = norm()(h)
        for _ in range(self.lin_blocks):
            h = nn.Dense(self.lin_neurons)(h)
            h = nn.leaky_relu(h, negative_slope=0.01)
            h = norm()(h)
        logits = nn.Dense(self.out_neurons)(h)
        return jax.nn.log_softmax(logits, axis=-1)
