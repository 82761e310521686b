"""Loss functions matching the reference's torch/SpeechBrain semantics.

Reference wiring (convae.yaml:78-85, transformer.yaml:71-74,
gender_classifier.yaml:44-46, convae.yaml:245-251):
  * loss_reconstruction: MSELoss(mean) — or L1 in the fcae experiments
  * loss_sex_classification: NLLLoss on (B, 2) log-probs
  * loss_utility: MSELoss(mean) (convae.yaml) or CosineSimilarityLoss
    (transformer.yaml:74)
  * loss_confusion: MSE(sex_logits, ln(1/2)) — target -0.6931
    (speechbrain_convae_train.py:108)
  * seq_cost: kldiv_loss(label_smoothing=0.1, reduction=batchmean)
  * ctc_cost: ctc_loss(blank=0, reduction=batchmean)
  * classification_error (gender_classifier.yaml:44-46)

All functions are pure and jittable; masking uses relative lengths, as the
reference's compute_masked_loss does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _length_mask(targets_shape, lengths: jax.Array | None, dtype=jnp.float32):
    """(B, T) validity mask from relative lengths in (0, 1]."""
    b, t = targets_shape[0], targets_shape[1]
    if lengths is None:
        return jnp.ones((b, t), dtype)
    n = jnp.round(lengths * t)
    idx = jnp.arange(t)[None, :]
    return (idx < n[:, None]).astype(dtype)


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.MSELoss(reduction='mean') equivalent."""
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.L1Loss(reduction='mean') equivalent."""
    return jnp.mean(jnp.abs(pred - target))


def nll_loss(
    log_probs: jax.Array,
    targets: jax.Array,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Negative log-likelihood over log-probabilities.

    Handles (B, C) utterance-level log-probs (torch.nn.NLLLoss, used for the
    sex loss at speechbrain_convae_train.py:107) and (B, T, C) sequence
    log-probs with relative-length masking (sb.nnet.losses.nll_loss, used at
    gender_classifier_train.py:145). Mean over valid elements.
    """
    if log_probs.ndim == 2:
        picked = jnp.take_along_axis(log_probs, targets[:, None].astype(jnp.int32), axis=-1)
        return -jnp.mean(picked)
    picked = jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = _length_mask(targets.shape, lengths, log_probs.dtype)
    return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def kldiv_loss(
    log_probs: jax.Array,
    targets: jax.Array,
    lengths: jax.Array | None = None,
    label_smoothing: float = 0.1,
    reduction: str = "batchmean",
    pad_idx: int = 0,
) -> jax.Array:
    """Label-smoothed KL-divergence seq cost (sb.nnet.losses.kldiv_loss).

    SpeechBrain 0.5 semantics: ``(1-ls) * NLL + ls * mean_c(-log p)``,
    length-masked, reduction 'batchmean' = sum over tokens / batch size.
    """
    b, t, c = log_probs.shape
    picked = jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    reg = -jnp.mean(log_probs, axis=-1)
    per_token = (1.0 - label_smoothing) * (-picked) + label_smoothing * reg
    mask = _length_mask(targets.shape, lengths, log_probs.dtype)
    total = jnp.sum(per_token * mask)
    if reduction == "batchmean":
        return total / b
    if reduction == "mean":
        return total / jnp.maximum(jnp.sum(mask), 1.0)
    return total


def ctc_loss(
    log_probs: jax.Array,
    targets: jax.Array,
    input_lengths: jax.Array,
    target_lengths: jax.Array,
    blank_index: int = 0,
    reduction: str = "batchmean",
) -> jax.Array:
    """CTC forward-backward loss (sb.nnet.losses.ctc_loss, convae.yaml:245-247).

    ``input_lengths``/``target_lengths`` are *relative* lengths in (0, 1],
    as the reference passes (wav_lens / tokens_lens). reduction 'batchmean'
    = sum of per-utterance losses / batch size (torch ctc_loss sum/B).
    """
    b, t, c = log_probs.shape
    u = targets.shape[1]
    in_n = jnp.round(input_lengths * t)
    tg_n = jnp.round(target_lengths * u)
    logit_paddings = (jnp.arange(t)[None, :] >= in_n[:, None]).astype(log_probs.dtype)
    label_paddings = (jnp.arange(u)[None, :] >= tg_n[:, None]).astype(log_probs.dtype)
    per_seq = optax.ctc_loss(
        log_probs, logit_paddings, targets.astype(jnp.int32), label_paddings, blank_id=blank_index
    )
    if reduction == "batchmean":
        return jnp.sum(per_seq) / b
    if reduction == "mean":
        return jnp.mean(per_seq / jnp.maximum(tg_n, 1.0))
    return jnp.sum(per_seq)


def classification_error(
    log_probs: jax.Array, targets: jax.Array, lengths: jax.Array | None = None
) -> jax.Array:
    """Error rate = mean(argmax != target) (sb.nnet.losses.classification_error)."""
    if log_probs.ndim == 3 and log_probs.shape[1] == 1:
        log_probs = log_probs[:, 0]
    pred = jnp.argmax(log_probs, axis=-1)
    if log_probs.ndim == 2:
        return jnp.mean((pred != targets).astype(jnp.float32))
    mask = _length_mask(targets.shape, lengths)
    err = (pred != targets).astype(jnp.float32)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cosine_similarity_loss(x1: jax.Array, x2: jax.Array, eps: float = 1e-6) -> jax.Array:
    """utils/cosine_similarity_loss.py:53-56 — ``sum(1-cos)/T``.

    Cosine over dim=2 of (B, T, D) inputs; the reduction divides the sum
    over B*T by T (NOT by B*T) — preserved exactly (SURVEY.md quirk list).
    """
    dot = jnp.sum(x1 * x2, axis=2)
    n1 = jnp.sqrt(jnp.sum(x1 * x1, axis=2))
    n2 = jnp.sqrt(jnp.sum(x2 * x2, axis=2))
    sim = dot / jnp.maximum(n1 * n2, eps)
    loss = 1.0 - sim
    return jnp.sum(loss) / loss.shape[1]


_LN_HALF = -0.6931


def confusion_loss(sex_log_probs: jax.Array) -> jax.Array:
    """MSE(log-probs, ln(1/2)) — pushes sex posteriors toward uniform.

    Reference: speechbrain_convae_train.py:108 (target constant -0.6931).
    """
    return jnp.mean((sex_log_probs - _LN_HALF) ** 2)
