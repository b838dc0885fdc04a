"""Device mesh and sharding utilities.

The reference scales with NCCL data-parallel DDP via HF accelerate
(reference: train.py:114-125,176-178). The TPU-native equivalent is SPMD over
a ``jax.sharding.Mesh``: batches sharded over the ``data`` axis, parameters
replicated, with XLA inserting the gradient all-reduce over ICI. Multi-host
(multi-slice over DCN) uses the same program under ``jax.distributed``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_global_batch",
    "replicate_global",
    "is_main_process",
]


def make_mesh(num_devices: int = -1, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices (-1 = all)."""
    devices = jax.devices()
    if num_devices is None or num_devices < 0:
        num_devices = len(devices)
    return Mesh(np.asarray(devices[:num_devices]), (axis_name,))


def make_multislice_mesh(
    num_slices: int,
    devices_per_slice: int = -1,
    axis_names: Tuple[str, str] = ("dcn", "data"),
) -> Mesh:
    """2-D data-parallel mesh for multislice pods: the outer axis maps to DCN
    (cross-slice) and the inner to ICI (intra-slice), so XLA's gradient
    all-reduce decomposes into fast in-slice reduce-scatter/all-gather plus a
    small cross-slice exchange — the standard multislice DP recipe.

    On real multislice hardware, devices are grouped by ``slice_index`` (so
    each mesh row IS one slice); elsewhere (tests, CPU meshes) devices are
    split contiguously. Batches shard over BOTH axes via
    ``batch_sharding(mesh, axis_name=axis_names)``.
    """
    devices = jax.devices()
    if devices_per_slice < 0:
        assert len(devices) % num_slices == 0, (len(devices), num_slices)
        devices_per_slice = len(devices) // num_slices
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        by_slice: dict = {}
        for d in devices:
            by_slice.setdefault(d.slice_index, []).append(d)
        assert len(by_slice) == num_slices, (sorted(by_slice), num_slices)
        grid = [sorted(by_slice[s], key=lambda d: d.id)[:devices_per_slice]
                for s in sorted(by_slice)]
    else:
        flat = devices[: num_slices * devices_per_slice]
        grid = [
            flat[i * devices_per_slice : (i + 1) * devices_per_slice]
            for i in range(num_slices)
        ]
    return Mesh(np.asarray(grid), axis_names)


def batch_sharding(mesh: Mesh, axis_name="data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh. ``axis_name`` may be a
    tuple of axes (multislice: shard the batch over DCN x ICI jointly)."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put every array in the pytree with its batch dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_global_batch(local_batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Assemble the GLOBAL batch-sharded arrays from each process's local
    shard (multi-host: every host loaded a disjoint slice via the per-host
    sharded Loader, data/dataset.py:73-101). Single-process this is plain
    ``shard_batch``; under ``jax.distributed`` the global batch is the
    concatenation of the hosts' local shards in process order (the
    accelerate-DDP per-rank loader equivalent, reference train.py:176-178).

    Arrays already on device (e.g. the jit-augmented images in train.py) are
    assembled from per-device slices without a host round-trip; host numpy
    arrays go through ``make_array_from_process_local_data``."""
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, axis_name)
    sharding = batch_sharding(mesh, axis_name)
    flat = list(mesh.devices.flat)
    positions = [
        i for i, d in enumerate(flat) if d.process_index == jax.process_index()
    ]
    if not positions:
        raise ValueError(
            f"process {jax.process_index()} owns no devices in this mesh; "
            "shard_global_batch requires every participating process to "
            "contribute a batch shard"
        )
    # the device-side path assumes this process's devices sit contiguously in
    # mesh order (true for make_data_parallel_mesh / make_multislice_mesh); a
    # custom interleaved mesh would silently permute which global rows each
    # host's samples land on, breaking the documented process-order contract
    if positions != list(range(positions[0], positions[0] + len(positions))):
        raise ValueError(
            "shard_global_batch requires each process's devices to be "
            f"contiguous in mesh.devices.flat; process {jax.process_index()} "
            f"occupies positions {positions}"
        )
    local_devices = [flat[i] for i in positions]

    def put(x):
        if isinstance(x, jax.Array):
            # device-side path: slice the local batch across this host's mesh
            # devices (mesh order == global shard order for P(axis)) and
            # declare the global array over all hosts' single-device shards
            n = len(local_devices)
            B = x.shape[0]
            assert B % n == 0, f"local batch {B} not divisible by {n} local devices"
            per = B // n
            shards = [
                jax.device_put(x[i * per : (i + 1) * per], d)
                for i, d in enumerate(local_devices)
            ]
            global_shape = (B * jax.process_count(),) + tuple(x.shape[1:])
            return jax.make_array_from_single_device_arrays(
                global_shape, sharding, shards
            )
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, local_batch)


def replicate_global(tree: Any, mesh: Mesh) -> Any:
    """Replicate a host-local pytree over every device of a (possibly
    multi-process) mesh. All hosts must hold the same values (e.g. params
    initialized from the same PRNG key)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, replicated(mesh))
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        tree, mesh, jax.sharding.PartitionSpec()
    )


def is_main_process() -> bool:
    """Host-0 guard for side effects (replaces accelerate ``is_main_process``)."""
    return jax.process_index() == 0
