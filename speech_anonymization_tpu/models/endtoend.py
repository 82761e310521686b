"""End-to-end conv reconstruction anonymizer (no internal GRL classifier).

Reference: models/EndToEnd.py:36-87 (ConvReconstruction). A single conv
encoder/decoder stack over the flattened (B, T*80, 1) axis; the sex signal
comes from the FROZEN external x-vector classifier, evaluated on the
reconstruction — so the training loss *subtracts* the sex loss instead of
using gradient reversal (speechbrain_convae_train.py:111-121).

Design deviation (deliberate): the reference constructs the external
EncoderClassifier INSIDE the model from hardcoded absolute paths
(models/EndToEnd.py:57-61). Here the model is pure; the recipe composes it
with the external classifier (eval/evaluator.py) — same computation, no
hidden global state, jit-friendly.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from .components import Conv1dTorch, ConvTranspose1dTorch, InstanceNorm, glu


class ConvReconstruction(nn.Module):
    """(B, T, 80) -> (B, T, 80) reconstruction. Stride stack: s2 down, s2 up.

    Layers (models/EndToEnd.py:40-54): Conv(1->32,k15) IN GLU;
    Conv(32->64,k5,s2) IN GLU; Conv(64->64,k5) IN GLU;
    ConvT(64->32,k5,s2,op1) IN GLU; Conv(32->1,k15).
    Requires T*80 even (trainer pads T to a multiple of 36).
    """

    @nn.compact
    def __call__(self, feats, train: bool = False):
        b, t, d = feats.shape
        x = feats.reshape(b, t * d, 1)
        x = Conv1dTorch(32, 15, padding=7)(x)
        x = glu(InstanceNorm(32)(x))
        x = Conv1dTorch(64, 5, stride=2, padding=2)(x)
        x = glu(InstanceNorm(64)(x))
        x = Conv1dTorch(64, 5, padding=2)(x)
        x = glu(InstanceNorm(64)(x))
        x = ConvTranspose1dTorch(32, 5, stride=2, padding=2, output_padding=1)(x)
        x = glu(InstanceNorm(32)(x))
        x = Conv1dTorch(1, 15, padding=7)(x)
        return x.reshape(b, t, d)
