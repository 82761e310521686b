"""Feature-level inference classifier — the frozen privacy evaluator.

First-class replacement for the reference's locally-PATCHED SpeechBrain API
``EncoderClassifier.classify_batch_feats(feats) -> (logits, score, index)``
(speechbrain_convae_train.py:139,146; models/EndToEnd.py:83 — the patch is
not stock SpeechBrain, see SURVEY.md §2.4): classify precomputed fbank
features (normalize -> x-vector -> classifier) without touching waveforms.

Composed from a trained gender-classifier checkpoint
(recipes/gender_classifier.py), mirroring evaluator_inference.yaml:53-58's
module graph {normalize, embedding_model, classifier}.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from ..models import Xvector, XvectorClassifier
from ..ops.normalization import InputNormalizer, NormalizerState
from ..train.checkpoint import Checkpointer, PytreeRecoverable


class FeatureClassifier:
    """Frozen (normalize -> Xvector -> classifier) head over fbank features."""

    def __init__(
        self,
        embedding_model: Xvector,
        classifier: XvectorClassifier,
        params: dict,
        model_state: dict,
        norm_state: NormalizerState,
        normalizer: InputNormalizer | None = None,
        renormalize: bool = False,
    ):
        """``renormalize=False`` (default): inputs are assumed to be
        already-normalized fbanks, and the internal normalization is the
        identity. This matches the reference's actual behavior: its
        evaluator_inference.yaml Pretrainer loads embedding/classifier/
        label_encoder but NOT the mean_var_norm stats
        (evaluator_inference.yaml:63-71), so the patched
        classify_batch_feats normalization ran with fresh (identity) stats
        on features the anonymizer had already normalized. Set
        renormalize=True to apply the trained stats (for RAW fbank input).
        """
        self.embedding_model = embedding_model
        self.classifier = classifier
        self.params = params
        self.model_state = model_state
        self.norm_state = norm_state
        self.normalizer = normalizer or InputNormalizer(dim=80)
        self.renormalize = renormalize
        # params enter as jit arguments (not baked constants) so the HLO
        # stays small for remote compilation
        self._jit_classify = jax.jit(self._classify)

    def _classify(self, params, model_state, norm_state, feats, lens):
        if self.renormalize:
            normed, _ = self.normalizer(norm_state, feats, lens, epoch=10**9, training=False)
        else:
            normed = feats
        ev = {"params": params["embedding_model"], **model_state["embedding_model"]}
        emb = self.embedding_model.apply(ev, normed, lens, train=False)
        cv = {"params": params["classifier"], **model_state["classifier"]}
        log_probs = self.classifier.apply(cv, emb, train=False)
        score = jnp.max(log_probs, axis=-1)
        index = jnp.argmax(log_probs, axis=-1)
        return log_probs, score, index

    def classify_feats(self, feats, lens=None):
        """(B, T, D) fbanks -> (log_probs (B, C), score (B,), index (B,))."""
        return self._jit_classify(self.params, self.model_state, self.norm_state, feats, lens)

    __call__ = classify_feats

    @classmethod
    def from_checkpoint(
        cls,
        save_dir: str,
        emb_dim: int = 128,
        n_mels: int = 80,
        n_classes: int = 2,
        min_key: str | None = "error",
    ) -> "FeatureClassifier":
        """Load the frozen evaluator from a gender-recipe checkpoint dir.

        ``save_dir`` is the recipe's ``<save_folder>/ckpts``. Model
        hyperparams mirror evaluator_inference.yaml:34-48.
        """
        embedding_model = Xvector(in_channels=n_mels, lin_neurons=emb_dim)
        classifier = XvectorClassifier(lin_neurons=emb_dim, out_neurons=n_classes)
        # build templates
        rng = jax.random.PRNGKey(0)
        feats = jnp.zeros((1, 8, n_mels))
        ev = embedding_model.init(rng, feats, train=False)
        emb = embedding_model.apply(ev, feats, train=False)
        cv = classifier.init(rng, emb, train=False)
        normalizer = InputNormalizer(dim=n_mels)
        holder: dict[str, Any] = {
            "embedding_model": ev["params"],
            "classifier": cv["params"],
            "norm": normalizer.init_state(),
            "model_state": {
                "embedding_model": {k: v for k, v in ev.items() if k != "params"},
                "classifier": {k: v for k, v in cv.items() if k != "params"},
            },
        }
        ckptr = Checkpointer(
            save_dir,
            {
                "embedding_model": PytreeRecoverable(
                    lambda: holder["embedding_model"],
                    lambda p: holder.__setitem__("embedding_model", p),
                ),
                "classifier": PytreeRecoverable(
                    lambda: holder["classifier"], lambda p: holder.__setitem__("classifier", p)
                ),
                "normalizer": PytreeRecoverable(
                    lambda: holder["norm"], lambda s: holder.__setitem__("norm", s)
                ),
                "model_state": PytreeRecoverable(
                    lambda: holder["model_state"],
                    lambda s: holder.__setitem__("model_state", s),
                ),
            },
        )
        found = ckptr.recover_if_possible(min_key=min_key)
        if found is None:
            raise FileNotFoundError(f"no evaluator checkpoint under {save_dir}")
        params = {
            "embedding_model": holder["embedding_model"],
            "classifier": holder["classifier"],
        }
        model_state = holder["model_state"]
        norm_state = NormalizerState(*[jnp.asarray(x) for x in holder["norm"]])
        return cls(embedding_model, classifier, params, model_state, norm_state, normalizer)
