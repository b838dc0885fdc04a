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


def test_waypoint_plan_obs_window():
    from types import SimpleNamespace

    from autonomous_driving_with_diffusion_model_tpu.sim.obs import waypoint_plan_obs

    def wp(x, road=1, lane=-1, junction=False):
        return SimpleNamespace(
            transform=SimpleNamespace(location=SimpleNamespace(x=float(x), y=0.0)),
            road_id=road, lane_id=lane, is_junction=junction,
        )

    plan = [(wp(10 + i, junction=(i == 3)), 4) for i in range(5)]
    obs = waypoint_plan_obs((10.0, 0.0), 0.0, plan, steps=8)
    assert obs["location"].shape == (8, 2)
    # ego-frame x increases along the route; short plan pads with the last wp
    np.testing.assert_allclose(obs["location"][:5, 0], np.arange(5.0), atol=1e-6)
    np.testing.assert_allclose(obs["location"][5:, 0], 4.0, atol=1e-6)
    assert obs["is_junction"][3] == 1 and obs["is_junction"][0] == 0
    assert (obs["command"] == 4).all()

    # 90-degree ego yaw rotates the plan into the ego frame
    obs_rot = waypoint_plan_obs((10.0, 0.0), 90.0, plan, steps=2)
    np.testing.assert_allclose(obs_rot["location"][1], [0.0, -1.0], atol=1e-6)


def test_gnss_plan_tracker_advances_and_defers_lane_change():
    from autonomous_driving_with_diffusion_model_tpu.driving.gps import xyz2gps
    from autonomous_driving_with_diffusion_model_tpu.sim.obs import GnssPlanTracker

    def gps_at(x, y=0.0):
        return xyz2gps(x, y, 0.0, lat_ref=0.0, lon_ref=0.0)

    # plan along +x: lane change at entry defers to the following command
    plan = [(gps_at(0.0), 5), (gps_at(50.0), 4), (gps_at(100.0), 4)]
    tracker = GnssPlanTracker(plan)
    imu = np.zeros(7)
    imu[-1] = np.pi / 2  # compass north-referenced: heading +x

    obs = tracker.tick(gps_at(0.0), imu)
    assert obs["command"][0] == 5 or obs["command"][0] == 4
    # drive past the first target: index advances, command becomes LANEFOLLOW
    obs = tracker.tick(gps_at(5.0), imu)   # target 0 now behind & within 12 m
    obs = tracker.tick(gps_at(55.0), imu)  # target 1 behind
    obs = tracker.tick(gps_at(60.0), imu)
    assert obs["command"][0] == 4
    tx, _, _ = obs["target_gps"]
    assert np.isfinite(tx)
