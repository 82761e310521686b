"""Gradient reversal layer (GRL) — the adversarial mechanism.

Reference: ``GradReverse`` torch.autograd.Function (identity forward,
``-1 * grad`` backward) at models/ConvAutoEncoder.py:12-28 and duplicated at
models/FullyConnected.py:11-26. TPU-native equivalent via ``jax.custom_vjp``.

The scale is configurable (the reference hardcodes -1.0); the adversarial
alternation schedule in the rebuilt trainer can anneal it.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_reverse(x, scale: float = 1.0):
    """Identity forward; multiplies the cotangent by ``-scale`` on backward."""
    return x


def _grad_reverse_fwd(x, scale):
    return x, None


def _grad_reverse_bwd(scale, _res, g):
    return (jax.tree_util.tree_map(lambda t: -scale * t, g),)


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)
