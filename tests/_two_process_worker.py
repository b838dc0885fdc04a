"""Worker for the two-process jax.distributed train test.

Launched twice by tests/test_multiprocess_train.py (process_id 0 and 1), each
with 2 virtual CPU devices -> a 4-device global data-parallel mesh across two
processes. Runs the REAL train step (fwd+bwd+AdamW+EMA) with the per-host
sharded Loader and writes the final (replicated) params + per-step losses to
an .npz for the parent to compare against a single-process run
(reference equivalent: ``accelerate launch --multi_gpu --num_processes=2``,
README.md:83-88, train.py:114-178).

Usage: python _two_process_worker.py <process_id> <coordinator_port> <data_root> <out_npz>
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    port = int(sys.argv[2])
    data_root = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    # align the two processes and bootstrap the Gloo context over the full
    # 4-device clique BEFORE the (possibly cache-skewed) train-step compile:
    # without this, a process that hits the compile cache reaches its first
    # collective ~minutes before the other and the Gloo rendezvous times out
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("worker_setup")

    import numpy as np
    import jax.numpy as jnp

    from autonomous_driving_with_diffusion_model_tpu.data.dataset import get_loader
    from autonomous_driving_with_diffusion_model_tpu.diffusion import (
        make_schedule_from_cfg,
    )
    from autonomous_driving_with_diffusion_model_tpu.models import build_model
    from autonomous_driving_with_diffusion_model_tpu.parallel import (
        make_mesh,
        replicate_global,
        shard_global_batch,
    )
    from autonomous_driving_with_diffusion_model_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg

    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.TRAIN.ROOT = data_root
    cfg.TRAIN.BATCH_SIZE = 2  # per-host -> global batch 4
    cfg.TRAIN.NUM_WORKERS = 1
    cfg.TRAIN.TIME_STEPS = 10

    # the per-host sharded loader: jax.distributed is up, so get_loader picks
    # shard_index = process_index automatically (data/dataset.py:157-170)
    loader = get_loader(cfg, train=True, seed=0)
    assert loader.shard_index == process_id and loader.shard_count == 2

    mesh = make_mesh()  # all 4 global devices
    model = build_model(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 24, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    state = create_train_state(model, variables, cfg)
    state = replicate_global(state, mesh)

    schedule = make_schedule_from_cfg(cfg)
    step = jax.jit(make_train_step(model, schedule, cfg), donate_argnums=(0,))

    losses = []
    it = iter(loader)
    for i in range(3):
        local = next(it)
        local = {
            # device array, like train.py's jit-augmented images: exercises
            # shard_global_batch's no-host-roundtrip device assembly path
            "image": jnp.asarray(local["image"].astype(np.float32) / 255.0),
            "trajs": local["trajs"],
            "target": local["target"],
        }
        batch = shard_global_batch(local, mesh)
        assert batch["image"].shape[0] == 4  # global batch across both hosts
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))

    flat, _ = jax.tree_util.tree_flatten(state.params)
    out = {f"p{i}": np.asarray(jax.device_get(p)) for i, p in enumerate(flat)}
    out["losses"] = np.asarray(losses)
    np.savez(out_path, **out)
    print(f"worker {process_id}: losses={losses}")


if __name__ == "__main__":
    main()
