"""Task suites (Endless/NoCrash/CoRL2017/LeaderBoard) + walkers + fixed routes."""

import os
import sys

import numpy as np
import pytest

DESC_ROOT = "/root/reference/carla_gym/envs/scenario_descriptions"
needs_descriptions = pytest.mark.skipif(
    not os.path.isdir(DESC_ROOT), reason="published scenario descriptions not mounted"
)


@pytest.fixture
def mock(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    return mock_carla


def test_endless_tasks_weather_rotation():
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import build_endless_tasks

    tasks = build_endless_tasks(
        num_zombie_vehicles=10, num_zombie_walkers=20, weather_group="train",
        target_speed=6.0,
    )
    assert len(tasks) == 4  # one per train weather
    assert {t["weather"] for t in tasks} == {
        "ClearNoon", "WetNoon", "HardRainNoon", "ClearSunset",
    }
    assert all(t["endless"] and not t["ego_route"] for t in tasks)
    assert tasks[0]["num_zombie_walkers"] == 20


@needs_descriptions
def test_nocrash_tasks_from_published_descriptions():
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import build_suite_tasks

    tasks = build_suite_tasks(
        "NoCrash-v1", carla_map="Town01", weather_group="train_eval",
        route_description="lbc",
    )
    routes = {t["route_id"] for t in tasks}
    assert len(tasks) == 2 * len(routes)  # weathers x routes
    t0 = tasks[0]
    assert t0["num_zombie_vehicles"] == 20 and t0["num_zombie_walkers"] == 50
    assert len(t0["ego_route"]) == 2  # NoCrash: start + destination
    assert not t0["endless"]
    assert t0["ego_model"] == "vehicle.lincoln.mkz2017"
    # dense Town02 densities differ (nocrash_env.py:66-73)
    dense = build_suite_tasks(
        "NoCrash-v2", carla_map="Town02", weather_group="simple",
        route_description="lbc",
    )
    assert dense[0]["num_zombie_vehicles"] == 70
    assert dense[0]["num_zombie_walkers"] == 150


@needs_descriptions
def test_corl2017_and_leaderboard_tasks():
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import build_suite_tasks

    straight = build_suite_tasks(
        "CoRL2017-v0", carla_map="Town01", weather_group="simple",
        route_description="lbc",
    )
    assert straight and straight[0]["num_zombie_vehicles"] == 0
    dyn = build_suite_tasks(
        "CoRL2017-v3", carla_map="Town02", weather_group="simple",
        route_description="lbc",
    )
    assert dyn[0]["num_zombie_vehicles"] == 15 and dyn[0]["num_zombie_walkers"] == 50

    lb = build_suite_tasks("LeaderBoard-v0", carla_map="Town02", weather_group="simple")
    assert lb and lb[0]["num_zombie_vehicles"] == 70
    assert len(lb[0]["ego_route"]) >= 2


def test_all_env_ids_registered():
    from autonomous_driving_with_diffusion_model_tpu.sim.create_agent import ENV_FACTORIES
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import SUITES

    for env_id in SUITES:
        assert env_id in ENV_FACTORIES, env_id


def test_fixed_route_task_env(mock):
    """A NoCrash-style fixed-route task on the mock town: ego spawns at the
    route start, walkers spawn off-lane, completion ends the episode."""
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import CarlaDrivingEnv
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import TransformSpec

    task = {
        "weather": "ClearNoon",
        "route_id": 7,
        "num_zombie_vehicles": 0,
        "num_zombie_walkers": 4,
        "ego_route": [TransformSpec(x=5.0, y=0.0), TransformSpec(x=80.0, y=0.0)],
        "endless": False,
        "target_speed": 6.0,
    }
    env = CarlaDrivingEnv(seed=0, tasks=[task])
    env.reset()
    loc = env.ego.get_location()
    assert loc.x == pytest.approx(5.0) and loc.y == pytest.approx(0.0)
    walkers = env.world.get_actors().filter("*walker.pedestrian*")
    assert len(walkers) == 4
    controllers = [a for a in env.world.get_actors() if a.type_id == "controller.ai.walker"]
    assert len(controllers) == 4
    assert all(c.started and 1.0 <= c.max_speed <= 2.0 for c in controllers)
    assert not env._endless
    assert 70.0 <= env.tracker.route_length <= 80.0

    done, info = False, {}
    for _ in range(300):
        obs, reward, done, info = env.step({0: np.array([1.0, 0.0, 0.0])})
        if done:
            break
    assert done
    stat = info["episode_stat"]
    assert stat["is_route_completed"] == 1.0
    assert stat["score_route"] == 1.0  # fixed route completed => full route score
    env.close()
