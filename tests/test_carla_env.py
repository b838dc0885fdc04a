"""CarlaDrivingEnv adapter exercised against the mock carla API."""

import sys

import numpy as np
import pytest


@pytest.fixture
def carla_env(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    # fresh import of the adapter against the mock
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv

    return CarlaDrivingEnv(seed=0)


def test_reset_observation_contract(carla_env):
    obs = carla_env.reset()
    for key in (
        "state",
        "camera",
        "bev",
        "compass",
        "cur_waypoint",
        "next_waypoint",
        "next_command",
        "at_red_light",
    ):
        assert key in obs, key
    assert obs["camera"].shape == (1, 256, 900, 3)
    assert obs["bev"].shape == (512, 512, 3)
    assert obs["state"].shape == (1, 8)  # [yaw, speed, t, s, b, gear/5, vx, vy]


def test_expert_drives_forward(carla_env):
    carla_env.reset()
    loc0 = carla_env.ego.get_location()
    start = np.array([loc0.x, loc0.y])
    for _ in range(30):
        obs, reward, done, info = carla_env.step({0: None})  # expert autopilot
        assert not done
    assert carla_env.ego.speed > 0.5  # accelerated toward target speed
    loc1 = carla_env.ego.get_location()
    # moved along its (possibly reversed) route by a meaningful distance
    assert np.linalg.norm(np.array([loc1.x, loc1.y]) - start) > 1.0
    assert np.isfinite(reward)


def test_explicit_control_and_collision_termination(carla_env):
    carla_env.reset()
    obs, reward, done, info = carla_env.step({0: np.array([0.7, 0.0, 0.0])})
    assert carla_env.ego.control.throttle == pytest.approx(0.7)
    assert not done

    # inject a collision event through the sensor callback path
    from types import SimpleNamespace

    loc = carla_env.ego.get_location()
    carla_env.collision.on_collision(
        (loc.x, loc.y, loc.z), 999, "vehicle.other.car", (100, 0, 0),
        carla_env.steps, carla_env.sim_time,
    )
    obs, reward, done, info = carla_env.step({0: np.array([0.0, 0.0, 0.0])})
    assert done  # collision terminates (valeo terminal)
    assert info["counters"].collisions_vehicle == 1
    assert reward < 0  # -1 - speed terminal penalty dominates


def test_zombie_vehicles_spawned(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv

    env = CarlaDrivingEnv(seed=0, num_zombie_vehicles=3)
    env.reset()
    vehicles = env.world.get_actors().filter("*vehicle*")
    assert len(vehicles) >= 3  # ego + zombies (away from the ego spawn)
    # zombies appear in the object-finder obs feeding hazard predicates
    others = env._surrounding("vehicle")
    assert len(others) >= 2


def test_close_restores_async(carla_env):
    carla_env.reset()
    carla_env.close()
    assert carla_env.world.get_settings().synchronous_mode is False


def test_birdview_obs_modality(monkeypatch, tmp_path):
    """Live chauffeurnet birdview obs: masks rendered from the generated town
    .h5 + the traffic-light registry's per-color stop lines."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv
    from autonomous_driving_with_diffusion_model_tpu.sim.map_raster import main as map_main

    map_main(["--towns", "MockTown", "--save-dir", str(tmp_path)])
    env = CarlaDrivingEnv(seed=11, birdview_h5=str(tmp_path / "MockTown.h5"))
    env.world.actors.append(mock_carla.TrafficLight(x=57.0, state="Red"))
    obs = env.reset()
    assert "birdview" in obs
    frame = obs["birdview"]
    assert frame["rendered"].shape[2] == 3
    assert frame["masks"].dtype == np.uint8
    # road drawn around the ego
    assert (frame["rendered"].sum(axis=-1) > 0).mean() > 0.05

    # drive near the light: the red stop line enters the rendered view
    env.ego.transform.location.x = 55.0
    env.tracker = None
    env.route = [((float(x), 0.0), 4) for x in range(55, 120)]
    env._route_idx = 0
    obs, *_ = env.step({0: np.array([0.3, 0.0, 0.0])})
    rendered = obs["birdview"]["rendered"]
    # COLOR_RED stop line pixels present (pure red (255,0,0) tint family)
    red_px = (rendered[..., 0] > 120) & (rendered[..., 1] < 80) & (rendered[..., 2] < 80)
    assert red_px.any()
    env.close()
