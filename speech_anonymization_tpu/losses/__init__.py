from .basic import (
    mse_loss,
    l1_loss,
    nll_loss,
    kldiv_loss,
    ctc_loss,
    classification_error,
    cosine_similarity_loss,
    confusion_loss,
)
from .mi import ClusterMI, GroupSamplingMI, MILoss, cosine_distance_matrix

__all__ = [
    "mse_loss",
    "l1_loss",
    "nll_loss",
    "kldiv_loss",
    "ctc_loss",
    "classification_error",
    "cosine_similarity_loss",
    "confusion_loss",
    "ClusterMI",
    "GroupSamplingMI",
    "MILoss",
    "cosine_distance_matrix",
]
