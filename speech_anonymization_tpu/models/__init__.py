from .components import GLU, glu, InstanceNorm, PixelShuffle1D
from .classifiers import (
    TDNNSexClassifier,
    SexClassifier1D,
    FullyConnSexClassifier,
    DummyFullyConnSexClassifier,
)
from .autoencoders import (
    ConvAutoencoder,
    FullyConnectedAutoencoder,
    DummyFullyConnectedAutoencoder,
)
from .cyclegan import CycleGANGenerator, ResidualLayer, DownSampleGenerator
from .endtoend import ConvReconstruction
from .xvector import Xvector, XvectorClassifier

__all__ = [
    "GLU",
    "glu",
    "InstanceNorm",
    "PixelShuffle1D",
    "TDNNSexClassifier",
    "SexClassifier1D",
    "FullyConnSexClassifier",
    "DummyFullyConnSexClassifier",
    "ConvAutoencoder",
    "FullyConnectedAutoencoder",
    "DummyFullyConnectedAutoencoder",
    "CycleGANGenerator",
    "ResidualLayer",
    "DownSampleGenerator",
    "ConvReconstruction",
    "Xvector",
    "XvectorClassifier",
]
