"""Config-driven obs composition: the reference's own obs_configs YAMLs drive
our pure obs functions over the native env (reference obs_manager_handler)."""

import os
import sys

import numpy as np
import pytest
import yaml

CAMERA_YAML = "/root/reference/configs/agent/obs_configs/camera.yaml"


@pytest.fixture
def env(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv

    e = CarlaDrivingEnv(seed=11)
    e.world.actors.append(mock_carla.TrafficLight(x=57.0, state="Red"))
    e.reset()
    yield e
    e.close()


@pytest.mark.skipif(not os.path.exists(CAMERA_YAML), reason="reference configs absent")
def test_reference_camera_obs_config_composes(env):
    from autonomous_driving_with_diffusion_model_tpu.sim.obs_handler import ObsHandler

    with open(CAMERA_YAML) as f:
        obs_configs = yaml.safe_load(f)
    handler = ObsHandler(obs_configs)
    obs = handler.get_observation(env)
    assert set(obs) == {"camera", "speed", "control", "velocity", "traffic_light"}
    assert obs["camera"]["data"].shape == (256, 900, 3)
    assert obs["camera"]["bev_data"].shape == (512, 512, 3)
    assert "speed" in obs["speed"] and "throttle" in obs["control"]
    assert obs["traffic_light"]["at_red_light"] in ([0], [1])


def test_plan_and_finder_modules(env):
    from autonomous_driving_with_diffusion_model_tpu.sim.obs_handler import ObsHandler

    handler = ObsHandler({
        "route_plan": {"module": "navigation.waypoint_plan", "steps": 6},
        "vehicles": {"module": "object_finder.vehicle", "max_detection_number": 5},
        "stop": {"module": "object_finder.stop_sign"},
    })
    obs = handler.get_observation(env)
    assert obs["route_plan"]["location"].shape == (6, 2)
    assert obs["vehicles"]["location"].shape[0] == 5
    assert obs["stop"]["at_stop_sign"] == 0


def test_unknown_module_raises_early():
    from autonomous_driving_with_diffusion_model_tpu.sim.obs_handler import ObsHandler

    with pytest.raises(KeyError, match="unknown obs module"):
        ObsHandler({"x": {"module": "nonexistent.thing"}})


def test_register_custom_module(env):
    from autonomous_driving_with_diffusion_model_tpu.sim.obs_handler import (
        ObsHandler,
        register_obs_module,
    )

    @register_obs_module("custom.step_count")
    def _steps(e, cfg):
        return {"steps": e.steps}

    obs = ObsHandler({"n": {"module": "custom.step_count"}}).get_observation(env)
    assert obs["n"]["steps"] == env.steps


def test_route_module(env):
    from autonomous_driving_with_diffusion_model_tpu.sim.obs_handler import ObsHandler

    obs = ObsHandler({"route": {"module": "actor_state.route"}}).get_observation(env)
    r = obs["route"]
    assert r["route_locs"].shape == (10,)
    assert 0.0 <= r["lateral_dist"][0] <= 2.0
    assert r["dist_remaining"][0] >= 0.0
