from .port_weights import (
    linear_from_torch,
    conv1d_from_torch,
    conv2d_from_torch,
    batchnorm_from_torch,
    embedding_from_torch,
    port_state_dict,
)

__all__ = [
    "linear_from_torch",
    "conv1d_from_torch",
    "conv2d_from_torch",
    "batchnorm_from_torch",
    "embedding_from_torch",
    "port_state_dict",
]
