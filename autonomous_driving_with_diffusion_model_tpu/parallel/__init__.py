from .distributed import initialize_distributed, local_batch_slice
from .mesh import batch_sharding, is_main_process, make_mesh, replicated, shard_batch

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "is_main_process",
    "initialize_distributed",
    "local_batch_slice",
]
