"""Statistics pooling: mean ‖ std over the time axis.

Reference: ``speechbrain.nnet.pooling.StatisticsPooling`` used by every sex
classifier (models/ConvAutoEncoder.py:45,96; models/FullyConnected.py:88) and
the x-vector (gender_classifier.yaml:97-104 via the Xvector lobe).

SpeechBrain semantics: ``mean = x.mean(dim=1)``, ``std = x.std(dim=1)``
(unbiased), ``std += eps`` (eps=1e-5), concat -> (B, 1, 2D). SpeechBrain also
adds a tiny uniform noise (~1e-5) to the mean in *all* modes; that is a
nondeterministic regularizer, off by default here (pass a PRNG key to
enable).

Masked variant supports padded batches with relative lengths — required
under XLA static shapes (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5


def statistics_pooling(
    x: jax.Array,
    lengths: jax.Array | None = None,
    eps: float = _EPS,
    noise_key: jax.Array | None = None,
) -> jax.Array:
    """(B, T, D) -> (B, 2D) mean‖std over time.

    ``lengths``: optional (B,) relative lengths in (0, 1]; statistics are
    computed over the valid prefix only (matches SpeechBrain's masked path).
    Uses the unbiased (N-1) std to match torch.std.
    """
    b, t, d = x.shape
    if lengths is None:
        mean = jnp.mean(x, axis=1)
        var = jnp.var(x, axis=1, ddof=1)
    else:
        n = jnp.round(lengths * t).astype(x.dtype)  # (B,)
        idx = jnp.arange(t, dtype=x.dtype)[None, :]
        mask = (idx < n[:, None]).astype(x.dtype)[:, :, None]  # (B, T, 1)
        n = jnp.maximum(n, 2.0)[:, None]
        total = jnp.sum(x * mask, axis=1)
        mean = total / n
        sq = jnp.sum(mask * (x - mean[:, None, :]) ** 2, axis=1)
        var = sq / (n - 1.0)
    std = jnp.sqrt(jnp.maximum(var, 0.0)) + eps
    if noise_key is not None:
        # SpeechBrain adds uniform noise in [9e-5*eps..], magnitude ~1e-5;
        # approximated as tiny uniform noise on the mean.
        noise = jax.random.uniform(noise_key, mean.shape, mean.dtype, 0.0, eps)
        mean = mean + noise
    return jnp.concatenate([mean, std], axis=-1)
