"""Sim-layer tests: collector produces loader-compatible datasets."""

import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.data import TrajDataset
from autonomous_driving_with_diffusion_model_tpu.driving import FakeDrivingEnv
from autonomous_driving_with_diffusion_model_tpu.sim import (
    DataCollector,
    count_current_saved,
    world_to_agent,
)


def test_world_to_agent_roundtrip(rng):
    agent_pos = np.array([10.0, -5.0])
    theta = 0.7
    for _ in range(5):
        world = rng.standard_normal(2) * 20
        x, y = world_to_agent(world.copy(), agent_pos, theta)
        # invert: world = R @ local + agent_pos
        R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
        back = R.dot(np.array([x, y])) + agent_pos
        np.testing.assert_allclose(back, world, atol=1e-9)


def test_collector_end_to_end(tmp_path):
    env = FakeDrivingEnv(image_hw=(32, 48), bev_hw=(512, 512))
    collector = DataCollector(
        env,
        str(tmp_path),
        total_to_save=2,
        save_every_n_frame=1,
        buffer_frames=2,
        step_to_reset=10000,
    )
    saved = collector.run(max_env_steps=500)
    assert saved == 2
    assert count_current_saved(str(tmp_path)) == 2

    # the produced dataset loads through the training pipeline
    ds = TrajDataset(str(tmp_path))
    item = ds[0]
    assert item["trajs"].shape == (16, 7)
    # frame-0 transition is anchored at the origin (own frame), yaw delta 0
    np.testing.assert_allclose(item["trajs"][0, :3], 0.0, atol=1e-6)
    # actions are the next frame's control: throttle in [0, 1]
    assert (item["trajs"][:, 4] >= 0).all()
    assert item["target"].shape == (2,)


def test_collector_resume_counts(tmp_path):
    env = FakeDrivingEnv(image_hw=(32, 48), bev_hw=(512, 512))
    c1 = DataCollector(env, str(tmp_path), total_to_save=1, save_every_n_frame=1, buffer_frames=1)
    c1.run(max_env_steps=300)
    # a second collector resumes from the on-disk count
    c2 = DataCollector(env, str(tmp_path), total_to_save=1, save_every_n_frame=1, buffer_frames=1)
    assert c2.cur_save == 1
    assert c2.run(max_env_steps=5) == 1  # quota already met
