"""Scripted scenario actors: spawn from task configs, route following,
hazard yielding (reference: scenario_actor_handler.py + agents/)."""

import sys

import numpy as np
import pytest


@pytest.fixture
def mock(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    return mock_carla


def _task_with_scenario_actor(mock, agent_entry, target_speed=5.0):
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import TransformSpec

    return {
        "weather": "ClearNoon",
        "num_zombie_vehicles": 0,
        "num_zombie_walkers": 0,
        "ego_route": [TransformSpec(x=5.0, y=0.0), TransformSpec(x=40.0, y=0.0)],
        "endless": False,
        "target_speed": 6.0,
        "scenario_actors": {
            "sa0": [TransformSpec(x=90.0, y=0.0), TransformSpec(x=140.0, y=0.0)]
        },
        "scenario_actor_configs": {
            "sa0": {
                "model": "vehicle.*",
                "agent_entry_point": agent_entry,
                "agent_kwargs": {"target_speed": target_speed},
            }
        },
    }


def test_constant_speed_actor_drives_route(mock):
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv

    env = CarlaDrivingEnv(
        seed=0, tasks=[_task_with_scenario_actor(
            mock, "constant_speed_agent:ConstantSpeedAgent")],
    )
    env.reset()
    assert env.scenario_handler is not None and len(env.scenario_handler.actors) == 1
    sv = env.scenario_handler.actors["sa0"]
    assert sv.vehicle.get_location().x == pytest.approx(90.0)
    for _ in range(120):
        env.step({0: np.array([0.0, 0.0, 1.0])})  # ego holds still
    x = sv.vehicle.get_location().x
    assert x > 95.0, "scenario vehicle should advance along its route"
    # keeps driving until near the destination, then brakes to a stop
    for _ in range(300):
        env.step({0: np.array([0.0, 0.0, 1.0])})
        if sv.vehicle.speed < 0.05 and sv.vehicle.get_location().x > 130.0:
            break
    assert 130.0 < sv.vehicle.get_location().x < 142.0
    env.close()


def test_basic_agent_yields_to_blocker(mock):
    """BasicAgent brakes for a vehicle parked directly ahead (the LBC
    vehicle-hazard cone, basic_agent.py:64-86)."""
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv

    env = CarlaDrivingEnv(
        seed=0, tasks=[_task_with_scenario_actor(mock, "basic_agent:BasicAgent")],
    )
    env.reset()
    sv = env.scenario_handler.actors["sa0"]
    # park a blocker 6 m ahead of the scenario actor, same heading
    blocker = mock._Vehicle(env.world, mock.Transform(mock.Location(x=96.0, y=0.0)))
    env.world.actors.append(blocker)
    for _ in range(40):
        env.step({0: np.array([0.0, 0.0, 1.0])})
    assert sv.vehicle.speed < 0.2, "hazard cone must hold the actor stopped"
    assert sv.vehicle.get_location().x < 92.0
    # remove the blocker: the actor proceeds
    env.world.actors.remove(blocker)
    for _ in range(80):
        env.step({0: np.array([0.0, 0.0, 1.0])})
    assert sv.vehicle.get_location().x > 93.0
    env.close()


def test_unknown_entry_point_falls_back(mock, caplog):
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv

    task = _task_with_scenario_actor(mock, "weird_agent:Nope")
    env = CarlaDrivingEnv(seed=0, tasks=[task])
    env.reset()
    from autonomous_driving_with_diffusion_model_tpu.sim.scenario_actors import (
        ConstantSpeedAgent,
    )

    assert type(env.scenario_handler.agents["sa0"]) is ConstantSpeedAgent
    env.close()
