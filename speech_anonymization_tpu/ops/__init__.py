from .fbank import FbankConfig, Fbank, frame_signal, mel_filterbank_matrix
from .grl import grad_reverse
from .pooling import statistics_pooling
from .normalization import InputNormalizer, NormalizerState

__all__ = [
    "FbankConfig",
    "Fbank",
    "frame_signal",
    "mel_filterbank_matrix",
    "grad_reverse",
    "statistics_pooling",
    "InputNormalizer",
    "NormalizerState",
]
