"""Multi-host / multi-slice initialization.

The single-program SPMD train step scales past one host via
``jax.distributed``: every host runs the same ``train.py``, JAX stitches the
global device mesh (ICI within a slice, DCN across slices), and the existing
``make_mesh()`` + batch sharding work unchanged — each host feeds its local
shard (reference equivalent: ``accelerate launch --multi_gpu``, train.py:114-125).
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["initialize_distributed", "local_batch_slice"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or standard env vars.

    Reads ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` when args are None. On managed TPU pods
    ``jax.distributed.initialize()`` auto-discovers everything. Returns True
    if a multi-process runtime was started.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        try:  # TPU pod auto-discovery; harmless no-op single-host failure
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of the global batch."""
    import jax

    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
