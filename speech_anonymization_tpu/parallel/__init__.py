from .mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    is_main_process,
    run_on_main,
    initialize_distributed,
    global_barrier,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "is_main_process",
    "run_on_main",
    "initialize_distributed",
    "global_barrier",
]
