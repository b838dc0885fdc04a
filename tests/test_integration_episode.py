"""Full-episode integration: fixed route + red light + walkers + scenario
actor + expert ego, end to end through the native env.

The expert must hold at the red light (no infraction), proceed when it turns
green, complete the route, and the episode stats must come out clean — the
interaction test across registries, criteria, scoring, scenario actors, and
the route tracker that the per-module tests can't see."""

import sys

import numpy as np
import pytest


@pytest.fixture
def mock(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    return mock_carla


def test_expert_full_episode_with_light_walkers_and_adversary(mock):
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import TransformSpec

    task = {
        "weather": "ClearNoon",
        "route_id": 0,
        "num_zombie_vehicles": 0,
        "num_zombie_walkers": 3,
        "ego_route": [TransformSpec(x=5.0, y=0.0), TransformSpec(x=100.0, y=0.0)],
        "endless": False,
        "target_speed": 6.0,
        "scenario_actors": {
            "adv": [TransformSpec(x=110.0, y=0.0), TransformSpec(x=140.0, y=0.0)]
        },
        "scenario_actor_configs": {
            "adv": {
                "model": "vehicle.*",
                "agent_entry_point": "basic_agent:BasicAgent",
                "agent_kwargs": {"target_speed": 4.0},
            }
        },
    }
    env = CarlaDrivingEnv(seed=0, tasks=[task])
    light = mock.TrafficLight(x=57.0, state="Red")
    env.world.actors.append(light)
    env.reset()

    held_at_light = False
    done, info = False, {}
    for step in range(600):
        obs, reward, done, info = env.step({0: None})  # expert autopilot
        x = env.ego.get_location().x
        # while red: the expert must never pass the junction entrance
        if light.state == "Red":
            assert x < 62.0, f"expert ran the red light at step {step}"
            if 40.0 < x < 62.0 and env.ego.speed < 0.1:
                held_at_light = True
                if step > 40:  # held long enough: turn green
                    light.state = "Green"
        if done:
            break

    assert held_at_light, "expert never reached/held at the red light"
    assert done, "episode must terminate by route completion"
    stat = info["episode_stat"]
    assert stat["is_route_completed"] == 1.0
    assert stat["score_route"] == 1.0
    # clean drive: encountered the light but no infractions of any kind
    assert env.counters.encounter_light == 1
    assert env.counters.red_light == 0
    assert env.counters.collisions_vehicle == 0
    assert env.counters.collisions_pedestrian == 0
    assert stat["score_penalty"] == pytest.approx(1.0, abs=1e-6)
    assert stat["score_composed"] == pytest.approx(1.0, abs=1e-6)

    # the adversary drove its own route meanwhile
    adv = env.scenario_handler.actors["adv"]
    assert adv.vehicle.get_location().x > 112.0
    env.close()
