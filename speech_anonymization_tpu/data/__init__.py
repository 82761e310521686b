from .audio import read_audio, write_wav
from .encoder import CategoricalEncoder
from .dataset import DynamicItemDataset, PaddedBatch, SaveableDataLoader
from .librispeech import prepare_librispeech

__all__ = [
    "read_audio",
    "write_wav",
    "CategoricalEncoder",
    "DynamicItemDataset",
    "PaddedBatch",
    "SaveableDataLoader",
    "prepare_librispeech",
]
