"""Two-process jax.distributed training correctness.

Launches two real OS processes, each with 2 virtual CPU devices, joined via
``jax.distributed.initialize`` into one 4-device data-parallel mesh — the
multi-HOST configuration (reference: accelerate multi-GPU launch,
README.md:83-88). Asserts:

1. both processes run the real train step over the per-host sharded Loader
   (disjoint dataset shards, global batch assembled across hosts);
2. the replicated final params agree between the two processes;
3. the params match a SINGLE-process run on the same global batches
   (same step rngs), i.e. multi-host changes the schedule of the gradient
   all-reduce but not the optimization trajectory.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_two_process_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_dataset(root, n=16, h=24, w=32, seed=7):
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "front"), exist_ok=True)
    os.makedirs(os.path.join(root, "waypoints"), exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(root, "front", f"{i:06d}.png"), img)
        target = rng.uniform(-1, 1, 2)
        rows = rng.uniform(-1, 1, (16, 7))
        lines = [" ".join(f"{v:.6f}" for v in target)]
        lines += [" ".join(f"{v:.6f}" for v in r) for r in rows]
        with open(os.path.join(root, "waypoints", f"{i:06d}.txt"), "w") as f:
            f.write("\n".join(lines))


def test_two_process_distributed_matches_single_process(tmp_path):
    root = str(tmp_path / "data")
    _make_dataset(root)
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # each worker uses its own compile cache dir to avoid write races
    procs = []
    outs = []
    for pid in (0, 1):
        out = str(tmp_path / f"params_{pid}.npz")
        outs.append(out)
        wenv = dict(env)
        # NO persistent compile cache: XLA:CPU executables loaded from the AOT
        # cache fail Gloo collective-context setup (GetKeyValue/connect
        # timeouts) — the workers must compile cold (verified empirically;
        # cold ~2 min, parallel across the two workers)
        wenv.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(port), root, out],
                env=wenv,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        log, _ = p.communicate(timeout=600)
        logs.append(log)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"

    packs = [np.load(o) for o in outs]
    keys = sorted(k for k in packs[0].files if k.startswith("p"))

    # (2) replication consistency across processes
    for k in keys:
        np.testing.assert_array_equal(packs[0][k], packs[1][k])
    np.testing.assert_array_equal(packs[0]["losses"], packs[1]["losses"])

    # (3) single-process ground truth on the same global batches
    import jax
    import jax.numpy as jnp

    from autonomous_driving_with_diffusion_model_tpu.data.dataset import (
        Loader,
        TrajDataset,
    )
    from autonomous_driving_with_diffusion_model_tpu.diffusion import (
        make_schedule_from_cfg,
    )
    from autonomous_driving_with_diffusion_model_tpu.models import build_model
    from autonomous_driving_with_diffusion_model_tpu.parallel import (
        make_mesh,
        replicated,
        shard_batch,
    )
    from autonomous_driving_with_diffusion_model_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg

    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.TRAIN.ROOT = root
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.NUM_WORKERS = 1
    cfg.TRAIN.TIME_STEPS = 10

    dataset = TrajDataset(root)
    # reproduce each host's loader stream, then concatenate in process order
    # (= the global array layout of shard_global_batch over the 2-host mesh)
    shards = [
        iter(
            Loader(dataset, batch_size=2, shuffle=True, drop_last=True,
                   num_workers=1, seed=0, shard_index=i, shard_count=2)
        )
        for i in (0, 1)
    ]

    mesh = make_mesh(4)  # conftest provides 8 virtual devices; use 4 like the pair
    model = build_model(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 24, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    state = create_train_state(model, variables, cfg)
    state = jax.device_put(state, replicated(mesh))
    schedule = make_schedule_from_cfg(cfg)
    step = jax.jit(make_train_step(model, schedule, cfg), donate_argnums=(0,))

    losses = []
    for i in range(3):
        locals_ = [next(s) for s in shards]
        batch = {
            "image": np.concatenate(
                [l["image"].astype(np.float32) / 255.0 for l in locals_]
            ),
            "trajs": np.concatenate([l["trajs"] for l in locals_]),
            "target": np.concatenate([l["target"] for l in locals_]),
        }
        state, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses, packs[0]["losses"], rtol=1e-5, atol=1e-6)
    flat, _ = jax.tree_util.tree_flatten(state.params)
    assert len(flat) == len(keys)
    for i, p in enumerate(flat):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(p)), packs[0][f"p{i}"], rtol=1e-5, atol=1e-6
        )
