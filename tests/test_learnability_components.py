"""Unit tests for learnability.py's dataset generator + env hook (the full
TPU run is driver-level; these pin the pieces: on-disk format contract,
image/curvature encoding, trajectory schema, FakeDrivingEnv image_fn)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from learnability import (  # noqa: E402
    CLASSES,
    MAGIC,
    expert_trajectory,
    render_frame,
    write_dataset,
)


def test_render_frame_encodes_curvature():
    rng = np.random.default_rng(0)
    left = render_frame(-0.05, rng, (64, 96)).astype(np.int32)
    rng = np.random.default_rng(0)
    straight = render_frame(0.0, rng, (64, 96)).astype(np.int32)
    rng = np.random.default_rng(0)
    right = render_frame(0.05, rng, (64, 96)).astype(np.int32)
    # the marking (bright yellow-ish band) moves with curvature: compare the
    # column centroid of bright pixels in the upper road half
    def centroid(img):
        band = img[24:40].sum(axis=-1)
        cols = np.argmax(band, axis=-1)
        return float(np.mean(cols))

    assert centroid(left) < centroid(straight) < centroid(right)
    assert left.shape == (64, 96, 3)


def test_expert_trajectory_schema():
    rng = np.random.default_rng(0)
    t = expert_trajectory(0.05, rng)
    assert t.shape == (16, 7)
    # forward motion: stored y = -fwd/MAGIC decreases monotonically
    assert np.all(np.diff(t[:, 1]) < 0)
    # right curvature bends stored x (lateral) positive and yaw grows
    assert t[-1, 0] > 0 and t[-1, 2] > 0
    # actions: constant throttle 0.6, steer matching curvature sign, no brake
    assert np.allclose(t[:, 4], 0.6) and np.all(t[:, 5] > 0) and np.allclose(t[:, 6], 0.0)
    # everything within the dataset's [-1, 1] clip range
    assert np.all(np.abs(t) <= 1.0)


def test_write_dataset_is_loader_compatible(tmp_path):
    from autonomous_driving_with_diffusion_model_tpu.data.dataset import TrajDataset

    samples = write_dataset(str(tmp_path), n_per_class=2, seed=0, hw=(64, 96))
    assert len(samples) == 2 * len(CLASSES)
    ds = TrajDataset(str(tmp_path))
    assert len(ds) == len(samples)
    item = ds[0]
    assert item["image"].shape == (64, 96, 3) and item["image"].dtype == np.uint8
    assert item["trajs"].shape == (16, 7)
    assert item["target"].shape == (2,)
    # the txt round-trips the float trajectory exactly (within clip)
    np.testing.assert_allclose(item["trajs"], samples[0]["traj"], atol=1e-6)
    # decode cache: second read returns the cached object
    assert ds[0] is item


def test_fake_env_image_fn_hook():
    from autonomous_driving_with_diffusion_model_tpu.driving.fake_env import (
        FakeDrivingEnv,
    )

    marker = np.full((8, 12, 3), 7, np.uint8)
    env = FakeDrivingEnv(image_hw=(8, 12), image_fn=lambda e: marker)
    obs = env.reset()
    assert np.asarray(obs["camera"][0]).sum() == marker.sum()
    obs, _, _, _ = env.step({0: np.array([0.5, 0.0, 0.0])})
    assert np.asarray(obs["camera"][0]).sum() == marker.sum()
    # default behavior unchanged: random frames
    env2 = FakeDrivingEnv(image_hw=(8, 12))
    assert np.asarray(env2.reset()["camera"][0]).std() > 0
