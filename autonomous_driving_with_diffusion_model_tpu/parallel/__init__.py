from .distributed import initialize_distributed, local_batch_slice
from .mesh import (
    batch_sharding,
    make_multislice_mesh,
    is_main_process,
    make_mesh,
    replicate_global,
    replicated,
    shard_batch,
    shard_global_batch,
)

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_global_batch",
    "replicate_global",
    "is_main_process",
    "initialize_distributed",
    "local_batch_slice",
]
