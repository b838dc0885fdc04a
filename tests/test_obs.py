"""Observation computation tests: obs managers + state-vector assembly feed
the hazard predicates and agents end-to-end."""

import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.sim import (
    ActorState,
    control_obs,
    lbc_hazard_vehicle,
    object_finder_obs,
    process_obs,
    speed_obs,
    velocity_obs,
)


def test_speed_obs():
    obs = speed_obs((3.0, 4.0, 0.0), (1.0, 0.0, 0.0), yaw_deg=90.0)
    assert obs["speed"][0] == pytest.approx(5.0)
    assert obs["speed_xy"][0] == pytest.approx(5.0)
    assert obs["forward_speed"][0] == pytest.approx(3.0)
    assert obs["yaw"][0] == 90.0


def test_object_finder_sorting_and_frame():
    actors = [
        ActorState(1, (10.0, 0.0, 0.0), (0, 0, 0.0), (1.0, 0.0, 0.0)),
        ActorState(2, (3.0, 0.0, 0.0), (0, 0, 90.0), (0.0, 0.0, 0.0)),
        ActorState(3, (100.0, 0.0, 0.0), (0, 0, 0.0), (0.0, 0.0, 0.0)),  # too far
    ]
    obs = object_finder_obs((0.0, 0.0, 0.0), 0.0, actors, distance_threshold=15.0,
                            max_detection_number=4)
    assert obs["binary_mask"].tolist() == [1, 1, 0, 0]  # 2 nearby, sorted
    np.testing.assert_allclose(obs["location"][0][:2], [3.0, 0.0])  # nearest first
    assert obs["rotation"][0][2] == pytest.approx(90.0)
    # ego yaw rotates into the ego frame
    obs_rot = object_finder_obs((0.0, 0.0, 0.0), 90.0, actors[:1], 15.0, 2)
    np.testing.assert_allclose(obs_rot["location"][0][:2], [0.0, -10.0], atol=1e-6)


def test_object_finder_feeds_hazard_predicate():
    # a vehicle straight ahead, same heading -> hazard fires
    actors = [ActorState(5, (6.0, 0.0, 0.0), (0, 0, 10.0), (0, 0, 0))]
    obs = object_finder_obs((0.0, 0.0, 0.0), 0.0, actors, 15.0, 10)
    loc = lbc_hazard_vehicle(obs)
    assert loc is not None
    np.testing.assert_allclose(loc[:2], [6.0, 0.0])
    # opposite heading (|yaw diff| > 150) -> no hazard
    actors2 = [ActorState(5, (6.0, 0.0, 0.0), (0, 0, 180.0), (0, 0, 0))]
    assert lbc_hazard_vehicle(object_finder_obs((0, 0, 0), 0.0, actors2, 15.0, 10)) is None


def test_process_obs_state_vector_order():
    raw = {
        "speed": speed_obs((2.0, 0.0, 0.0), (1, 0, 0), 15.0),
        "control": control_obs(0.5, -0.1, 0.0, 2.5),
        "velocity": velocity_obs((2.0, 0.0, 0.0), (0.1, 0.0, 0.0), 0.01, 0.0),
        "camera": {"data": np.zeros((4, 6, 3), np.uint8),
                   "bev_data": np.zeros((4, 4, 3), np.uint8), "compass": [[0.1]]},
        "traffic_light": {"at_red_light": [0]},
        "cur_waypoint": np.zeros((1, 2)),
        "target_waypoint": np.zeros(2),
        "next_waypoint": np.zeros(2),
        "next_command": 4,
    }
    # collector config order (configs/agent/collector.yaml input_states)
    out = process_obs(raw, ["yaw", "speed_norm", "control", "vel_xy"], train=False)
    state = out["state"][0]
    # [yaw, speed, throttle, steer, brake, gear/5, vel_x, vel_y]
    np.testing.assert_allclose(
        state, [15.0, 2.0, 0.5, -0.1, 0.0, 0.5, 2.0, 0.0], atol=1e-6
    )
    assert out["camera"].shape == (1, 4, 6, 3)  # eval mode adds batch dim
    assert out["next_command"].shape == (1,)
