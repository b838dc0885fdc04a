"""Shard-parallel collection: quota split, per-shard supervision, merge."""

import os
import os.path as osp

import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.sim.collect_loop import (
    collect_sharded,
    merge_shards,
)


def _make_shard(root, n, start=0, with_bev=True, drop_waypoints_for=()):
    import cv2

    for sub in ("front", "bev", "waypoints"):
        os.makedirs(osp.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(start)
    for i in range(start, start + n):
        cv2.imwrite(
            osp.join(root, "front", f"{i:06d}.png"),
            rng.integers(0, 255, (8, 12, 3), np.uint8),
        )
        if with_bev:
            cv2.imwrite(
                osp.join(root, "bev", f"{i:06d}.png"), np.zeros((8, 8, 3), np.uint8)
            )
        if i in drop_waypoints_for:
            continue
        rows = rng.uniform(-1, 1, (16, 7))
        lines = ["0.1 0.2"] + [" ".join(f"{v:.4f}" for v in r) for r in rows]
        with open(osp.join(root, "waypoints", f"{i:06d}.txt"), "w") as f:
            f.write("\n".join(lines))


def test_merge_shards_renumbers_and_skips_incomplete(tmp_path):
    s0, s1 = str(tmp_path / "shard_0"), str(tmp_path / "shard_1")
    _make_shard(s0, 3)
    _make_shard(s1, 3, start=5, drop_waypoints_for=(6,))  # one incomplete
    dest = str(tmp_path)
    n = merge_shards([s0, s1], dest)
    assert n == 5  # 3 + (3 - 1 incomplete)
    fronts = sorted(os.listdir(osp.join(dest, "front")))
    assert fronts == [f"{i:06d}.png" for i in range(5)]
    wps = sorted(os.listdir(osp.join(dest, "waypoints")))
    assert wps == [f"{i:06d}.txt" for i in range(5)]
    # merged dataset loads through the real loader contract
    from autonomous_driving_with_diffusion_model_tpu.data.dataset import TrajDataset

    ds = TrajDataset(dest)
    assert len(ds) == 5
    sample = ds[4]
    assert sample["trajs"].shape == (16, 7)


def test_collect_sharded_fake_env_end_to_end(tmp_path):
    """Two fake-env shards collect their quota split concurrently (real
    subprocesses under the crash-restart supervisor), then merge into one
    contiguous dataset."""
    out = str(tmp_path / "data")
    n = collect_sharded(
        3,  # -> quotas [2, 1]
        out,
        num_shards=2,
        extra_args=["--fake-env", "--save-every-n-frame", "1",
                    "--max-env-steps", "600"],
    )
    assert n == 3
    from autonomous_driving_with_diffusion_model_tpu.data.dataset import TrajDataset

    ds = TrajDataset(out)
    assert len(ds) == 3
    for i in range(3):
        sample = ds[i]
        assert sample["trajs"].shape == (16, 7)
        assert np.all(np.abs(sample["trajs"]) <= 1.0)
    # per-shard artifacts remain for resume/debugging
    assert os.path.isdir(osp.join(out, "shard_0"))
    assert os.path.isdir(osp.join(out, "shard_1"))


def test_merge_truncates_stale_samples_from_prior_merge(tmp_path):
    """Re-merging with fewer samples must remove leftovers a loader would see
    (code-review r3 finding)."""
    s0, s1 = str(tmp_path / "shard_0"), str(tmp_path / "shard_1")
    _make_shard(s0, 3)
    _make_shard(s1, 3, start=5)
    dest = str(tmp_path)
    assert merge_shards([s0, s1], dest) == 6
    # drop a whole shard and re-merge
    assert merge_shards([s0], dest) == 3
    fronts = sorted(os.listdir(osp.join(dest, "front")))
    assert fronts == [f"{i:06d}.png" for i in range(3)]
    assert sorted(os.listdir(osp.join(dest, "waypoints"))) == [
        f"{i:06d}.txt" for i in range(3)
    ]
    from autonomous_driving_with_diffusion_model_tpu.data.dataset import TrajDataset

    assert len(TrajDataset(dest)) == 3


def test_collect_loop_always_passes_off_screen(monkeypatch, tmp_path):
    """The supervisor launches headless by default (review-fix regression:
    sharded mode must not silently start rendering servers)."""
    import importlib

    # the package re-exports the collect_loop FUNCTION under the same name,
    # shadowing the module on attribute import
    cl = importlib.import_module(
        "autonomous_driving_with_diffusion_model_tpu.sim.collect_loop"
    )

    calls = []

    class _P:
        def __init__(self, argv, **kw):
            calls.append(argv)

        def wait(self):
            return 0

    monkeypatch.setattr(cl.subprocess, "Popen", _P)
    counts = iter([0, 5])
    monkeypatch.setattr(cl, "count_current_saved", lambda d: next(counts))
    cl.collect_loop(5, str(tmp_path))
    assert len(calls) == 1
    assert "--off-screen" in calls[0]
    # caller-specified flag isn't duplicated
    calls.clear()
    counts = iter([0, 5])
    cl.collect_loop(5, str(tmp_path), ["--off-screen", "--fake-env"])
    assert calls[0].count("--off-screen") == 1
