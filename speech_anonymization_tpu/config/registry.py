"""Constructor registry for the YAML config system.

The reference's HyperPyYAML instantiates ARBITRARY python objects from YAML
tags (``!new:speechbrain.lobes.features.Fbank`` — convae.yaml:289). That is
an arbitrary-code-execution config format. Here tags resolve only against:

  * explicitly registered names (the ``register`` decorator), and
  * dotted paths inside the ``speech_anonymization_tpu`` package.

This keeps the declarative object-graph power (the config IS the DI
container, SURVEY.md §5 config system) without evaluating arbitrary code.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

REGISTRY: dict[str, Any] = {}

_ALLOWED_PREFIXES = ("speech_anonymization_tpu.",)


def register(name: str | None = None):
    def deco(obj):
        REGISTRY[name or obj.__name__] = obj
        return obj

    return deco


def resolve_path(path: str) -> Any:
    """Resolve a tag path to a callable/class via registry or package import."""
    if path in REGISTRY:
        return REGISTRY[path]
    if path.startswith(_ALLOWED_PREFIXES):
        module_path, _, attr = path.rpartition(".")
        mod = importlib.import_module(module_path)
        return getattr(mod, attr)
    raise KeyError(
        f"config tag '{path}' is not registered and not inside "
        f"{_ALLOWED_PREFIXES}; register it with config.register()"
    )


def _register_builtins():
    """Names usable directly in configs (mirrors what the reference's yamls
    pull from torch/speechbrain, mapped to our equivalents)."""
    import math

    from .. import losses as L
    from ..ops.augment import EnvCorrupt, TimeDomainSpecAugment, speed_perturb
    from ..ops.specaugment import SpecAugment
    from ..ops.fbank import Fbank, FbankConfig
    from ..ops.normalization import InputNormalizer
    from ..train.schedulers import NoamScheduler, ReduceLROnPlateau
    from ..train.epoch_loop import EpochCounter
    from ..train.logger import FileTrainLogger
    from ..train.checkpoint import Checkpointer
    from ..eval.metrics import AccuracyStats, MetricStats, SimilarityMetricsStats
    from ..eval.wer import ErrorRateStats
    from ..data.encoder import CategoricalEncoder
    from ..models import (
        ConvAutoencoder,
        ConvReconstruction,
        CycleGANGenerator,
        FullyConnectedAutoencoder,
        Xvector,
        XvectorClassifier,
    )

    def fbank(sample_rate=16000, n_fft=400, n_mels=80, **kw):
        return Fbank(FbankConfig(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels, **kw))

    builtins = {
        "Fbank": fbank,
        "InputNormalization": InputNormalizer,
        "EnvCorrupt": EnvCorrupt,
        "TimeDomainSpecAugment": TimeDomainSpecAugment,
        "SpecAugment": SpecAugment,
        # standalone speed perturbation (convae.yaml:285-287); a factory so
        # configs can bind speeds, callable as f(key, wavs, lens)
        "SpeedPerturb": lambda sample_rate=16000, speeds=(95, 100, 105): (
            lambda key, wavs, lens: speed_perturb(key, wavs, lens, tuple(speeds))
        ),
        "NoamScheduler": NoamScheduler,
        "ReduceLROnPlateau": ReduceLROnPlateau,
        "EpochCounter": EpochCounter,
        "FileTrainLogger": FileTrainLogger,
        "Checkpointer": Checkpointer,
        "AccuracyStats": AccuracyStats,
        "MetricStats": MetricStats,
        "SimilarityMetricsStats": SimilarityMetricsStats,
        "ErrorRateStats": ErrorRateStats,
        "CategoricalEncoder": CategoricalEncoder,
        "ConvAutoencoder": ConvAutoencoder,
        "ConvReconstruction": ConvReconstruction,
        "CycleGANGenerator": CycleGANGenerator,
        "FullyConnectedAutoencoder": FullyConnectedAutoencoder,
        "Xvector": Xvector,
        "XvectorClassifier": XvectorClassifier,
        "mse_loss": lambda **kw: L.mse_loss,
        "l1_loss": lambda **kw: L.l1_loss,
        "nll_loss": lambda **kw: L.nll_loss,
        "kldiv_loss": L.kldiv_loss,
        "ctc_loss": L.ctc_loss,
        "classification_error": lambda **kw: L.classification_error,
        "cosine_similarity_loss": lambda **kw: L.cosine_similarity_loss,
        "confusion_loss": lambda **kw: L.confusion_loss,
        "MILoss": L.MILoss,
        "min": min,
        "max": max,
        "math.sqrt": math.sqrt,
    }
    REGISTRY.update(builtins)


_register_builtins()
