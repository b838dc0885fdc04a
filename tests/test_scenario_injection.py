"""Leaderboard adversarial-scenario injection (sim/scenario_injection.py).

Covers, in order of increasing integration:

1. trigger matching + subtype math verified AGAINST THE VENDORED
   RouteParser.scan_route_for_scenarios (the reference implementation,
   imported read-only from /root/reference) on a synthetic route;
2. prioritized sampling semantics (route_scenario.py:337-415);
3. class -> native-behavior translation (build_injection);
4. end-to-end in the mock env: a LeaderBoard-style task with a scenarios
   JSON spawns the adversaries at the JSON's trigger points, and the injected
   DynamicObjectCrossing walker causes a pedestrian collision infraction.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.sim.scenario_injection import (
    ControlLossEvent,
    build_injection,
    load_annotations,
    sample_scenarios,
    scan_route_for_scenarios,
)

LEADERBOARD = "/root/reference/leaderboard"
SRUNNER = "/root/reference/scenario_runner"


@pytest.fixture
def mock(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    return mock_carla


def _straight_route(mock, n=120, step=1.0, yaw=0.0):
    """Dense route along +x at 1 m resolution: [(Transform, cmd)]."""
    return [
        (
            mock.Transform(mock.Location(x=i * step, y=0.0), mock.Rotation(yaw=yaw)),
            4,  # LANEFOLLOW
        )
        for i in range(n)
    ]


def _annotations(triggers):
    """{town: [scenario]} from [(scenario_name, x, y, yaw[, other_actors])]."""
    by_name = {}
    for t in triggers:
        name, x, y, yaw = t[:4]
        event = {"transform": {"x": str(x), "y": str(y), "z": "0.0", "yaw": str(yaw)}}
        if len(t) > 4:
            event["other_actors"] = t[4]
        by_name.setdefault(name, []).append(event)
    return {
        "Town01": [
            {"scenario_type": name, "available_event_configurations": evs}
            for name, evs in by_name.items()
        ]
    }


# ---------------------------------------------------------------- 1. oracle


@pytest.mark.skipif(not os.path.isdir(LEADERBOARD), reason="reference not mounted")
def test_scan_matches_vendored_route_parser(monkeypatch, mock):
    """Our scan == the vendored RouteParser on matched/missed/deduped triggers."""
    for name in list(sys.modules):
        if name == "leaderboard" or name.startswith(("leaderboard.", "srunner")):
            monkeypatch.delitem(sys.modules, name, raising=False)
    for p in (SRUNNER, LEADERBOARD):
        monkeypatch.syspath_prepend(p)
    from autonomous_driving_with_diffusion_model_tpu.sim.expert import RoadOption

    agents = types.ModuleType("agents"); agents.__path__ = []
    nav = types.ModuleType("agents.navigation"); nav.__path__ = []
    lp = types.ModuleType("agents.navigation.local_planner")
    lp.RoadOption = RoadOption
    for m in (agents, nav, lp):
        monkeypatch.setitem(sys.modules, m.__name__, m)

    from leaderboard.utils.route_parser import RouteParser

    route = _straight_route(mock)
    # a LEFT turn decision at index 80 so Scenario4 subtypes resolve
    route[80] = (route[80][0], 1)  # RoadOption.LEFT
    annotations = _annotations(
        [
            ("Scenario1", 30.0, 0.5, 0.0),     # on-route (1.12 m, 0 deg): match
            ("Scenario3", 50.0, 0.0, 0.0),     # exact: match
            ("Scenario3", 50.5, 0.5, 0.0),     # dedups into the same trigger
            ("Scenario4", 70.0, 0.0, 0.0),     # match; LEFT ahead -> S4left
            ("Scenario1", 40.0, 3.5, 0.0),     # 3.5 m off-route: miss
            ("Scenario1", 60.0, 0.0, 25.0),    # yaw off by 25 deg: miss
        ]
    )

    ours = scan_route_for_scenarios("Town01", route, annotations)

    ref_route = [(tf, RoadOption(cmd)) for tf, cmd in route]
    ref, _ = RouteParser.scan_route_for_scenarios("Town01", ref_route, annotations)

    assert len(ours) == len(ref) == 3
    for tid in ref:
        our_defs = ours[tid]
        ref_defs = ref[tid]
        assert [d["name"] for d in our_defs] == [d["name"] for d in ref_defs]
        assert [d["scenario_type"] for d in our_defs] == [
            d["scenario_type"] for d in ref_defs
        ]
        for a, b in zip(our_defs, ref_defs):
            assert a["trigger_position"] == b["trigger_position"]


@pytest.mark.skipif(not os.path.isdir(LEADERBOARD), reason="reference not mounted")
def test_scan_published_scenarios_on_synthetic_route(mock):
    """The published all_towns file parses and its Town01 triggers land on a
    route built through one of its own Scenario3 trigger points."""
    path = os.path.join(LEADERBOARD, "data/scenarios/all_towns_traffic_scenarios.json")
    annotations = load_annotations(path)
    assert set(annotations) >= {"Town01", "Town02", "Town03"}
    s3 = [s for s in annotations["Town01"] if s["scenario_type"] == "Scenario3"]
    wp = s3[0]["available_event_configurations"][0]["transform"]
    x0, y0, yaw = float(wp["x"]), float(wp["y"]), float(wp["yaw"])
    # drive straight through the trigger along its own heading
    f = np.array([np.cos(np.deg2rad(yaw)), np.sin(np.deg2rad(yaw))])
    route = [
        (
            mock.Transform(
                mock.Location(x=x0 + d * f[0], y=y0 + d * f[1], z=float(wp["z"])),
                mock.Rotation(yaw=yaw),
            ),
            4,
        )
        for d in range(-10, 40)
    ]
    potential = scan_route_for_scenarios("Town01", route, annotations)
    names = [d["name"] for defs in potential.values() for d in defs]
    assert "Scenario3" in names


# ------------------------------------------------------------- 2. sampling


def test_sampling_prioritizes_highest_scenario_number(mock):
    route = _straight_route(mock)
    annotations = _annotations(
        [("Scenario1", 30.0, 0.0, 0.0), ("Scenario3", 30.0, 0.0, 0.0)]
    )
    potential = scan_route_for_scenarios("Town01", route, annotations)
    assert len(potential) == 1  # same position -> one trigger
    sampled = sample_scenarios(potential)
    assert [d["name"] for d in sampled] == ["Scenario3"]


def test_sampling_dedups_used_positions(mock):
    route = _straight_route(mock)
    annotations = _annotations(
        [
            ("Scenario3", 30.0, 0.0, 0.0),
            # distinct trigger at 60 whose other_actors position overlaps the
            # Scenario3 trigger -> compare_scenarios rejects it, no fallback
            ("Scenario1", 60.0, 0.0, 0.0,
             {"front": [{"x": "30.0", "y": "0.0", "z": "0.0", "yaw": "0"}]}),
            ("Scenario1", 90.0, 0.0, 0.0),   # clean position: sampled
        ]
    )
    potential = scan_route_for_scenarios("Town01", route, annotations)
    assert len(potential) == 3
    sampled = sample_scenarios(potential)
    names = sorted(d["name"] for d in sampled)
    assert names == ["Scenario1", "Scenario3"]
    xs = sorted(round(d["trigger_position"]["x"]) for d in sampled)
    assert xs == [30, 90]


# ---------------------------------------------------------- 3. translation


def test_build_injection_class_translation():
    defs = []
    for i, name in enumerate(
        ["Scenario1", "Scenario2", "Scenario3", "Scenario4", "Scenario5",
         "Scenario6", "Scenario7", "Scenario10"]
    ):
        defs.append(
            {
                "name": name,
                "other_actors": None,
                "trigger_position": {"x": 10.0 * i, "y": 0.0, "z": 0.0, "yaw": 0.0},
                "scenario_type": "valid",
            }
        )
    inj = build_injection(defs)
    assert len(inj["control_loss"]) == 1          # S1
    assert len(inj["walker_specs"]) == 2          # S3, S4
    assert len(inj["vehicle_routes"]) == 5        # S2, S5, S6, S7, S10
    # lead vehicle ahead of its trigger along +x
    lead = inj["vehicle_routes"]["injected_Scenario2_1"]
    assert lead[0].x == pytest.approx(10.0 + 25.0)
    assert lead[0].y == pytest.approx(0.0)
    # oncoming vehicle: left lane, yaw flipped
    opp = inj["vehicle_routes"]["injected_Scenario6_5"]
    assert opp[0].yaw == pytest.approx(180.0)
    assert opp[0].y == pytest.approx(-3.5)
    # crossing walker: right shoulder, crossing left (-y)
    walker = inj["walker_specs"][0]
    assert walker["spawn_xy"][1] == pytest.approx(3.5)
    assert walker["cross_dir"][1] == pytest.approx(-1.0)


def test_control_loss_event_pulse():
    ev = ControlLossEvent((50.0, 0.0), radius=5.0, duration=2.0, seed=3)
    assert ev.steer_offset((10.0, 0.0), 5.0, 0.0) == 0.0  # far: inactive
    on_trigger = ev.steer_offset((48.0, 0.0), 5.0, 1.0)   # arms at the trigger
    mid = ev.steer_offset((49.0, 0.0), 5.0, 2.0)          # peak of the pulse
    assert abs(mid) > 0.0
    assert abs(mid) >= abs(on_trigger)
    assert ev.steer_offset((52.0, 0.0), 5.0, 3.5) == 0.0  # pulse over
    assert ev.done


# ------------------------------------------------------------ 4. end-to-end


def test_injected_walker_causes_pedestrian_collision(mock, tmp_path):
    """LeaderBoard-style task + scenarios JSON: the env samples the Scenario3
    trigger on its route, spawns the crossing walker, and the walker crossing
    in front of the expert ego yields a pedestrian-collision infraction."""
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import (
        CarlaDrivingEnv,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import TransformSpec

    scenarios = {
        "available_scenarios": [
            {
                "Town01": [
                    {
                        "scenario_type": "Scenario3",
                        "available_event_configurations": [
                            {"transform": {"x": "40.0", "y": "0.0", "z": "0.0",
                                           "yaw": "0"}}
                        ],
                    },
                    {
                        "scenario_type": "Scenario1",
                        "available_event_configurations": [
                            # past the crossing point so its steer pulse can't
                            # deflect the approach below
                            {"transform": {"x": "90.0", "y": "0.0", "z": "0.0",
                                           "yaw": "0"}}
                        ],
                    },
                ]
            }
        ]
    }
    json_path = tmp_path / "scenarios.json"
    json_path.write_text(json.dumps(scenarios))

    task = {
        "weather": "ClearNoon",
        "route_id": 0,
        "town": "Town01",
        "scenarios_json": str(json_path),
        "num_zombie_vehicles": 0,
        "num_zombie_walkers": 0,
        "ego_route": [TransformSpec(x=5.0, y=0.0), TransformSpec(x=100.0, y=0.0)],
        "endless": False,
        "target_speed": 6.0,
        "scenario_actors": {},
        "scenario_actor_configs": {},
        # srunner-matched defaults (14 m / 3.8 m/s) let the walker clear the
        # lane before the slow-accelerating mock ego arrives; a lingering
        # hazard exercises the collision/infraction plumbing this test is for
        "walker_speed": 1.8,
        "walker_trigger_dist": 18.0,
    }
    env = CarlaDrivingEnv(seed=0, tasks=[task])
    env.reset()

    # both scenario kinds were injected from the JSON
    assert len(env._control_loss_events) == 1
    handler = env.scenario_handler
    assert handler is not None and len(handler.walkers) == 1
    walker = next(iter(handler.walkers.values()))
    # spawned one lane right of the trigger, ahead of it
    loc0 = walker.walker.get_location()
    assert loc0.x == pytest.approx(48.0)
    assert loc0.y == pytest.approx(3.5)
    assert walker.state == "waiting"

    # a non-yielding ego (the expert would correctly brake for the walker):
    # full throttle straight down the lane
    collided, stat = False, None
    for _ in range(600):
        obs, reward, done, info = env.step({0: [1.0, 0.0, 0.0]})
        if env.counters.collisions_pedestrian > 0:
            collided = True
        if done:
            stat = info["episode_stat"]
            break

    assert walker.state in ("crossing", "done")  # the ego armed the trigger
    assert collided, "crossing walker must cause a pedestrian collision"
    if stat is not None:  # terminal variant may end the episode on collision
        assert stat["score_penalty"] <= 0.50  # pedestrian penalty factor
    env.close()


def test_s4left_walker_crosses_from_the_left():
    d = {
        "name": "Scenario4", "other_actors": None, "scenario_type": "S4left",
        "trigger_position": {"x": 0.0, "y": 0.0, "z": 0.0, "yaw": 0.0},
    }
    inj = build_injection([d])
    walker = inj["walker_specs"][0]
    assert walker["spawn_xy"][1] == pytest.approx(-3.5)  # left shoulder
    assert walker["cross_dir"][1] == pytest.approx(1.0)  # crossing rightward


def test_leaderboard_suite_stamps_scenarios_json(tmp_path, monkeypatch):
    """build_leaderboard_tasks carries town + scenarios_json into every task
    (flag and ADM_SCENARIOS_JSON env var)."""
    import os

    from autonomous_driving_with_diffusion_model_tpu.sim.suites import (
        build_suite_tasks,
        default_description_root,
    )

    if default_description_root() is None:
        pytest.skip("scenario descriptions not mounted")
    sj = str(tmp_path / "s.json")
    open(sj, "w").write("{}")
    tasks = build_suite_tasks("LeaderBoard-v0", scenarios_json=sj)
    assert tasks and all(t["town"] == "Town01" for t in tasks)
    assert all(t["scenarios_json"] == sj for t in tasks)
    monkeypatch.setenv("ADM_SCENARIOS_JSON", sj)
    tasks2 = build_suite_tasks("LeaderBoard-v0")
    assert all(t["scenarios_json"] == sj for t in tasks2)


def test_injected_lead_vehicle_stops_and_ego_yields(mock, tmp_path):
    """Scenario2 (FollowLeadingVehicle): the injected lead drives its stretch
    then holds a stop; the expert ego must brake behind it without colliding
    (the scenario's actual adversarial interaction, not a drive-away)."""
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import (
        CarlaDrivingEnv,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import TransformSpec

    scenarios = {
        "available_scenarios": [
            {
                "Town01": [
                    {
                        "scenario_type": "Scenario2",
                        "available_event_configurations": [
                            {"transform": {"x": "30.0", "y": "0.0", "z": "0.0",
                                           "yaw": "0"}}
                        ],
                    }
                ]
            }
        ]
    }
    json_path = tmp_path / "scenarios.json"
    json_path.write_text(json.dumps(scenarios))
    task = {
        "weather": "ClearNoon",
        "route_id": 0,
        "town": "Town01",
        "scenarios_json": str(json_path),
        "num_zombie_vehicles": 0,
        "num_zombie_walkers": 0,
        "ego_route": [TransformSpec(x=5.0, y=0.0), TransformSpec(x=140.0, y=0.0)],
        "endless": False,
        "target_speed": 6.0,
        "scenario_actors": {},
        "scenario_actor_configs": {},
    }
    env = CarlaDrivingEnv(seed=0, tasks=[task])
    env.reset()
    assert len(env.scenario_handler.actors) == 1
    lead = next(iter(env.scenario_handler.actors.values())).vehicle
    assert lead.get_location().x == pytest.approx(55.0)  # trigger + 25 m

    ego_held = False
    for _ in range(400):
        obs, reward, done, info = env.step({0: None})  # expert
        if done:
            break
        # once the lead holds its stop and the ego has closed in, the expert
        # must hold too (hazard cone), short of the lead
        if lead.speed < 0.05 and env.ego.speed < 0.05 and env.ego.get_location().x > 70:
            ego_held = True
            break
    assert lead.get_location().x == pytest.approx(95.0, abs=3.0)  # 40 m stretch
    assert ego_held, "expert never yielded behind the stopped lead"
    assert env.ego.get_location().x < lead.get_location().x - 2.0
    assert env.counters.collisions_vehicle == 0
    env.close()


def test_injection_infractions_land_in_evaluator_checkpoint(mock, tmp_path):
    """Injection + evaluator integration: a non-yielding agent on a
    LeaderBoard-style task with a scenarios JSON collides with the injected
    crossing walker, and the pedestrian infraction + penalty land in the
    leaderboard _checkpoint record with the failure properly scored."""
    from autonomous_driving_with_diffusion_model_tpu.driving.evaluator import (
        RouteEvaluator,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import (
        CarlaDrivingEnv,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import TransformSpec

    scenarios = {
        "available_scenarios": [
            {
                "Town01": [
                    {
                        "scenario_type": "Scenario3",
                        "available_event_configurations": [
                            {"transform": {"x": "40.0", "y": "0.0", "z": "0.0",
                                           "yaw": "0"}}
                        ],
                    }
                ]
            }
        ]
    }
    json_path = tmp_path / "scenarios.json"
    json_path.write_text(json.dumps(scenarios))
    task = {
        "weather": "ClearNoon",
        "route_id": 0,
        "town": "Town01",
        "scenarios_json": str(json_path),
        "num_zombie_vehicles": 0,
        "num_zombie_walkers": 0,
        "ego_route": [TransformSpec(x=5.0, y=0.0), TransformSpec(x=100.0, y=0.0)],
        "endless": False,
        "target_speed": 6.0,
        "scenario_actors": {},
        "scenario_actor_configs": {},
        "walker_speed": 1.8,  # lingering hazard (see collision test above)
        "walker_trigger_dist": 18.0,
    }
    env = CarlaDrivingEnv(seed=0, tasks=[task], eval_mode=True)

    class FullThrottleAgent:
        def compute_control(self, state):
            return np.array([1.0, 0.0, 0.0])

    def env_factory(route):
        env._task_idx = route["index"] - 1
        return env

    ev = RouteEvaluator(
        agent_factory=FullThrottleAgent,
        env_factory=env_factory,
        routes=[{"id": "LeaderBoard-v0/000", "index": 0, "length_m": 95.0}],
        checkpoint_path=str(tmp_path / "ckpt.json"),
        max_steps_per_route=500,
        counters_fn=lambda e: e.counters,
        route_length_fn=lambda e: e._route_length_m(),
        env_kind="carla",
    )
    data = ev.run(resume=False)
    rec = data["_checkpoint"]["records"][0]
    assert rec["infractions"]["collisions_pedestrian"] == ["event"]
    assert rec["scores"]["score_penalty"] <= 0.5  # pedestrian penalty factor
    assert data["_checkpoint"]["global_record"]["infractions"][
        "collisions_pedestrian"
    ] > 0
    env.close()
