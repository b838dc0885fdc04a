"""Score reconciliation against the VENDORED leaderboard StatisticsManager.

Feeds the same synthetic route outcomes through
(a) our consumer path — ``driving.evaluator.RouteEvaluator`` over a scripted
    env/agent + ``driving.scoring`` + ``driving.leaderboard_stats`` — and
(b) the reference's actual ``StatisticsManager.compute_route_statistics`` /
    ``compute_global_statistics`` (imported read-only from
    /root/reference/leaderboard/leaderboard/utils/statistics_manager.py,
    driven by real srunner ``TrafficEvent`` objects),
then asserts the ``_checkpoint`` records, scores, statuses, and per-km
infraction rates match. This converts "constants verified" into "consumer
verified": the vendored implementation is the oracle, not re-derived math.
"""

import os
import sys
import types
from dataclasses import dataclass, field

import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.driving.evaluator import RouteEvaluator
from autonomous_driving_with_diffusion_model_tpu.driving.leaderboard_stats import (
    GLOBAL_INFRACTION_KEYS,
    compute_global_record,
    finalize_checkpoint,
)
from autonomous_driving_with_diffusion_model_tpu.driving.scoring import EpisodeCounters
from autonomous_driving_with_diffusion_model_tpu.driving.statistics import aggregate

LEADERBOARD = "/root/reference/leaderboard"
SRUNNER = "/root/reference/scenario_runner"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LEADERBOARD), reason="vendored harness not mounted"
)


@pytest.fixture
def vendored(monkeypatch):
    """Import the real StatisticsManager with only its pip-absent helper
    (dictor) stubbed; srunner TrafficEvent/TrafficEventType are the real
    classes."""

    def _dictor(data, path, default=None):
        cur = data
        for part in path.split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                return default
        return cur

    dictor_mod = types.ModuleType("dictor")
    dictor_mod.dictor = _dictor
    monkeypatch.setitem(sys.modules, "dictor", dictor_mod)
    for name in list(sys.modules):
        if name == "leaderboard" or name.startswith(("leaderboard.", "srunner")):
            monkeypatch.delitem(sys.modules, name, raising=False)
    for p in (SRUNNER, LEADERBOARD):
        monkeypatch.syspath_prepend(p)

    from leaderboard.utils.statistics_manager import StatisticsManager
    from srunner.scenariomanager.traffic_events import TrafficEvent, TrafficEventType

    return StatisticsManager, TrafficEvent, TrafficEventType


# --------------------------------------------------------------- outcome spec


@dataclass
class Outcome:
    route_id: str
    length_m: float
    steps: int
    step_m: float  # per-step odometry (exactly representable floats)
    completed: bool = False
    counters: EpisodeCounters = field(default_factory=EpisodeCounters)
    crash_at_step: int = -1  # agent raises on this compute_control call
    vendored_failure: str = ""  # failure= arg for crash-style outcomes

    @property
    def completed_m(self) -> float:
        n = self.crash_at_step if self.crash_at_step >= 0 else self.steps
        return n * self.step_m

    @property
    def completed_pct(self) -> float:
        if self.completed:
            return 100.0
        return min(1.0, self.completed_m / self.length_m) * 100.0


# five adversarial mixes: clean completion, multi-infraction partial,
# blocked terminal, agent crash mid-route, deviation + off-road percentage
OUTCOMES = [
    Outcome("clean", length_m=1000.0, steps=10, step_m=100.0, completed=True),
    Outcome(
        "multi_infraction",
        length_m=1000.0,
        steps=10,
        step_m=25.0,  # 250 m -> 25%
        counters=EpisodeCounters(collisions_vehicle=2, red_light=1, route_dev=1),
    ),
    Outcome(
        "blocked",
        length_m=2000.0,
        steps=8,
        step_m=62.5,  # 500 m -> 25%
        counters=EpisodeCounters(
            collisions_pedestrian=1, stop_infraction=1, vehicle_blocked=1
        ),
    ),
    Outcome(
        "agent_crash",
        length_m=1000.0,
        steps=10,
        step_m=50.0,
        crash_at_step=4,  # 200 m -> 20%
        vendored_failure="Agent crashed",
    ),
    Outcome(
        "deviation_offroad",
        length_m=1000.0,
        steps=10,
        step_m=50.0,  # 500 m -> 50%
        counters=EpisodeCounters(
            route_dev=1, collisions_layout=1, outside_lane_m=25.0, wrong_lane_m=25.0
        ),  # (25+25)/500 = 10% off-lane
    ),
]


# ----------------------------------------------------- our side (consumer path)


class ScriptedEnv:
    """Moves the ego exactly ``step_m`` along +x per step; ``done`` at the
    final step iff the outcome completed its route."""

    def __init__(self, outcome: Outcome):
        self.oc = outcome
        self.counters = outcome.counters
        self._i = 0

    def reset(self):
        self._i = 0
        return {"cur_waypoint": np.array([[0.0, 0.0]])}

    def step(self, action):
        # stop moving after the scripted distance so a harness step bound
        # larger than `steps` doesn't inflate the odometry
        self._i = min(self._i + 1, self.oc.steps)
        state = {"cur_waypoint": np.array([[self._i * self.oc.step_m, 0.0]])}
        done = self.oc.completed and self._i >= self.oc.steps
        return state, 0.0, done, {}


class ScriptedAgent:
    def __init__(self, outcome: Outcome):
        self.oc = outcome
        self._calls = 0

    def compute_control(self, state):
        if self.oc.crash_at_step >= 0 and self._calls >= self.oc.crash_at_step:
            raise RuntimeError("scripted agent crash")
        self._calls += 1
        return np.zeros(3, np.float32)


def run_ours(tmp_path, outcomes):
    envs = {}

    def env_factory(route):
        oc = outcomes[route["index"]]
        env = ScriptedEnv(oc)
        envs[route["index"]] = env
        return env

    agents = iter([ScriptedAgent(oc) for oc in outcomes])
    ev = RouteEvaluator(
        agent_factory=lambda: next(agents),
        env_factory=env_factory,
        routes=[
            {"id": oc.route_id, "index": i, "length_m": oc.length_m}
            for i, oc in enumerate(outcomes)
        ],
        checkpoint_path=str(tmp_path / "reconcile.json"),
        max_steps_per_route=max(oc.steps for oc in outcomes),
        counters_fn=lambda env: env.counters,
        route_length_fn=lambda env: env.oc.length_m,
        env_kind="scripted",
    )
    return ev.run(resume=False)


# ------------------------------------------------- vendored side (the oracle)


def vendored_events(oc: Outcome, TrafficEvent, TrafficEventType):
    ev = []
    for _ in range(oc.counters.collisions_layout):
        ev.append(TrafficEvent(TrafficEventType.COLLISION_STATIC, "hit layout"))
    for _ in range(oc.counters.collisions_vehicle):
        ev.append(TrafficEvent(TrafficEventType.COLLISION_VEHICLE, "hit vehicle"))
    for _ in range(oc.counters.collisions_pedestrian):
        ev.append(TrafficEvent(TrafficEventType.COLLISION_PEDESTRIAN, "hit walker"))
    for _ in range(oc.counters.red_light):
        ev.append(TrafficEvent(TrafficEventType.TRAFFIC_LIGHT_INFRACTION, "ran red"))
    for _ in range(oc.counters.stop_infraction):
        ev.append(TrafficEvent(TrafficEventType.STOP_INFRACTION, "ran stop"))
    off_m = oc.counters.outside_lane_m + oc.counters.wrong_lane_m
    if off_m > 0:
        pct = off_m / oc.completed_m * 100.0
        e = TrafficEvent(TrafficEventType.OUTSIDE_ROUTE_LANES_INFRACTION, "off lane")
        e.set_dict({"distance": off_m, "percentage": pct})
        ev.append(e)
    for _ in range(oc.counters.route_dev):
        ev.append(TrafficEvent(TrafficEventType.ROUTE_DEVIATION, "deviated"))
    for _ in range(oc.counters.vehicle_blocked):
        ev.append(TrafficEvent(TrafficEventType.VEHICLE_BLOCKED, "blocked"))
    if oc.completed:
        ev.append(TrafficEvent(TrafficEventType.ROUTE_COMPLETED, "done"))
    else:
        e = TrafficEvent(TrafficEventType.ROUTE_COMPLETION, "partial")
        e.set_dict({"route_completed": oc.completed_pct})
        ev.append(e)
    return ev


def run_vendored(outcomes, StatisticsManager, TrafficEvent, TrafficEventType):
    class Loc:
        def __init__(self, x, y=0.0, z=0.0):
            self.x, self.y, self.z = x, y, z

    sm = StatisticsManager()
    records = []
    for i, oc in enumerate(outcomes):
        criterion = types.SimpleNamespace(
            list_traffic_events=vendored_events(oc, TrafficEvent, TrafficEventType)
        )
        scenario = types.SimpleNamespace(
            timeout_node=types.SimpleNamespace(timeout=False),
            get_criteria=lambda c=criterion: [c],
        )
        config = types.SimpleNamespace(
            index=i,
            trajectory=[Loc(0.0), Loc(oc.length_m)],
            agent=types.SimpleNamespace(step=oc.steps),
        )
        sm.set_route(oc.route_id, i)
        sm.set_scenario(scenario)
        records.append(
            sm.compute_route_statistics(config, failure=oc.vendored_failure)
        )
    global_record = sm.compute_global_statistics(len(outcomes))
    return records, global_record


# -------------------------------------------------------------------- asserts


def test_route_records_reconcile(tmp_path, vendored):
    StatisticsManager, TrafficEvent, TrafficEventType = vendored
    ours = run_ours(tmp_path, OUTCOMES)["_checkpoint"]["records"]
    theirs, _ = run_vendored(OUTCOMES, StatisticsManager, TrafficEvent, TrafficEventType)

    assert len(ours) == len(theirs) == len(OUTCOMES)
    for oc, rec, ref in zip(OUTCOMES, ours, theirs):
        # scores: ours are 0-1 scaled to 0-100 in the record, theirs 0-100
        for key in ("score_route", "score_penalty", "score_composed"):
            assert rec["scores"][key] == pytest.approx(
                ref.scores[key], rel=1e-12, abs=1e-12
            ), (oc.route_id, key)
        # infraction event lists: identical counts for every leaderboard key
        for key in GLOBAL_INFRACTION_KEYS:
            assert len(rec["infractions"][key]) == len(ref.infractions[key]), (
                oc.route_id,
                key,
            )
        # route length meta: the vendored compute_route_length of the same
        # trajectory equals our traced length
        assert rec["meta"]["route_length"] == pytest.approx(
            ref.meta["route_length"], rel=1e-12
        )
        assert rec["status"] == ref.status, oc.route_id
        assert rec["meta"]["env_kind"] == "scripted"


def test_global_record_reconciles(tmp_path, vendored):
    StatisticsManager, TrafficEvent, TrafficEventType = vendored
    data = run_ours(tmp_path, OUTCOMES)
    _, ref_global = run_vendored(
        OUTCOMES, StatisticsManager, TrafficEvent, TrafficEventType
    )

    ours_global = data["_checkpoint"]["global_record"]
    for key in ("score_route", "score_penalty", "score_composed"):
        assert ours_global["scores"][key] == pytest.approx(
            ref_global.scores[key], rel=1e-12, abs=1e-12
        ), key
    for key in GLOBAL_INFRACTION_KEYS:
        assert ours_global["infractions"][key] == pytest.approx(
            ref_global.infractions[key], rel=1e-12, abs=1e-12
        ), key
    assert ours_global["status"] == ref_global.status
    assert len(ours_global["meta"].get("exceptions", [])) == len(
        ref_global.meta.get("exceptions", [])
    )
    # values[] mirrors save_global_record's column format exactly
    # (statistics_manager.py:283-310)
    expect = ["{:.3f}".format(ref_global.scores[k]) for k in
              ("score_composed", "score_route", "score_penalty")]
    expect += ["{:.3f}".format(ref_global.infractions[k]) for k in [
        "collisions_pedestrian", "collisions_vehicle", "collisions_layout",
        "red_light", "stop_infraction", "outside_route_lanes",
        "route_dev", "route_timeout", "vehicle_blocked"]]
    assert data["values"] == expect
    assert data["entry_status"] == "Finished with agent errors"  # crash route
    assert data["eligible"] is True


def test_resume_keeps_reconciled_records(tmp_path, vendored):
    StatisticsManager, TrafficEvent, TrafficEventType = vendored
    data1 = run_ours(tmp_path, OUTCOMES)
    # re-run against the same checkpoint: finished routes are skipped and the
    # global record recomputes to the identical artifact
    envs_seen = []

    def env_factory(route):
        envs_seen.append(route["index"])
        return ScriptedEnv(OUTCOMES[route["index"]])

    ev = RouteEvaluator(
        agent_factory=lambda: ScriptedAgent(OUTCOMES[0]),
        env_factory=env_factory,
        routes=[
            {"id": oc.route_id, "index": i, "length_m": oc.length_m}
            for i, oc in enumerate(OUTCOMES)
        ],
        checkpoint_path=str(tmp_path / "reconcile.json"),
        max_steps_per_route=10,
        counters_fn=lambda env: env.counters,
        env_kind="scripted",
    )
    data2 = ev.run(resume=True)
    assert envs_seen == []  # nothing re-ran
    assert data2["_checkpoint"]["records"] == data1["_checkpoint"]["records"]
    assert data2["values"] == data1["values"]

    # the 15-record aggregate protocol still consumes the checkpoint
    padded = {"_checkpoint": {"records": data1["_checkpoint"]["records"] * 3}}
    out = aggregate(padded)
    assert np.isfinite(out["score_composed"])
    assert out["env_kinds"] == ["scripted"]


def test_injected_infraction_episodes_reconcile(tmp_path, vendored, monkeypatch):
    """END-TO-END reconciliation on infraction-bearing EPISODES: the
    infractions come from EXECUTED machinery over mock CARLA — route 0's
    pedestrian collision from an injected Scenario3 crossing walker
    (sim/scenario_injection.py), route 1's red-light run from the real
    RunRedLight criterion — scored by our RouteEvaluator, then the same
    measured outcome (our criteria's counters + our odometry's completion)
    scored by the vendored StatisticsManager. Per-route score_composed,
    score_penalty, infraction counts, statuses, and the global record must
    match (statistics_manager.py:121-230). One infraction per episode is the
    native env's semantics: its valeo terminal ends the episode at the first
    collision / red-light run (sim/terminal.py), unlike the endless
    leaderboard tick — hence two episodes rather than one with both."""
    import copy
    import json as _json

    StatisticsManager, TrafficEvent, TrafficEventType = vendored
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    from autonomous_driving_with_diffusion_model_tpu.sim.carla_env import (
        CarlaDrivingEnv,
    )
    from autonomous_driving_with_diffusion_model_tpu.sim.suites import TransformSpec

    # -- route 0: LeaderBoard-style task, Scenario3 crossing walker injected
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
    json_path.write_text(_json.dumps(scenarios))
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
        "walker_speed": 1.8,  # lingering hazard (see test_scenario_injection)
        "walker_trigger_dist": 18.0,
    }

    class FullThrottleAgent:
        def compute_control(self, state):
            return np.zeros(3, np.float32) + np.array([1.0, 0.0, 0.0])

    envs = {}

    def env_factory(route):
        if route["index"] == 0:
            env = CarlaDrivingEnv(seed=0, tasks=[task], eval_mode=True)
            env._task_idx = -1
            envs[0] = env
            return env
        # -- route 1: default town, a red light the full-throttle ego runs
        env = CarlaDrivingEnv(seed=0)
        env.world.actors.append(mock_carla.TrafficLight(x=57.0, state="Red"))
        envs[1] = env

        class _Proxy:  # scripted straight route through the junction
            @property
            def counters(self):
                return env.counters

            def reset(self):
                env.reset()
                env.ego.transform.location.x = 30.0
                env.ego.transform.location.y = 0.0
                env.ego.transform.rotation.yaw = 0.0
                env.ego.speed = 0.0
                env.tracker = None
                env.route = [((float(x), 0.0), 4) for x in range(30, 230)]
                env._route_idx = 0
                env._prev_loc_xy = np.array([30.0, 0.0])
                env.completed_m = 0.0
                env.world.tick()
                return env._observe()

            def step(self, control):
                return env.step(control)

        envs[1] = env
        return _Proxy()

    snapshots = {}

    def counters_fn(env):
        src = env.counters
        idx = 0 if len(snapshots) == 0 else 1
        snapshots[idx] = copy.copy(src)
        return src

    ev = RouteEvaluator(
        agent_factory=FullThrottleAgent,
        env_factory=env_factory,
        routes=[
            {"id": "walker_collision", "index": 0, "length_m": 95.0},
            {"id": "red_light_run", "index": 1, "length_m": 100.0},
        ],
        checkpoint_path=str(tmp_path / "episodes.json"),
        max_steps_per_route=600,
        counters_fn=counters_fn,
        env_kind="carla",
    )
    data = ev.run(resume=False)
    records = data["_checkpoint"]["records"]

    # the episodes really produced the targeted infractions via the criteria
    assert snapshots[0].collisions_pedestrian >= 1
    assert snapshots[1].red_light == 1

    # -- vendored oracle on the SAME measured outcome: our criteria counters
    # as TrafficEvents, our odometry's completion pct (== score_route, the
    # leaderboard identity) as the ROUTE_COMPLETION payload
    class Loc:
        def __init__(self, x, y=0.0, z=0.0):
            self.x, self.y, self.z = x, y, z

    sm = StatisticsManager()
    for i, rec in enumerate(records):
        oc = types.SimpleNamespace(
            counters=snapshots[i],
            completed=False,
            completed_m=max(
                rec["scores"]["score_route"] / 100.0 * rec["meta"]["route_length"],
                1e-9,
            ),
            completed_pct=rec["scores"]["score_route"],
        )
        criterion = types.SimpleNamespace(
            list_traffic_events=vendored_events(oc, TrafficEvent, TrafficEventType)
        )
        scenario = types.SimpleNamespace(
            timeout_node=types.SimpleNamespace(timeout=False),
            get_criteria=lambda c=criterion: [c],
        )
        config = types.SimpleNamespace(
            index=i,
            trajectory=[Loc(0.0), Loc(rec["meta"]["route_length"])],
            agent=types.SimpleNamespace(step=100),
        )
        sm.set_route(rec["route_id"], i)
        sm.set_scenario(scenario)
        ref = sm.compute_route_statistics(config, failure="")
        for key in ("score_route", "score_penalty", "score_composed"):
            assert rec["scores"][key] == pytest.approx(
                ref.scores[key], rel=1e-9, abs=1e-9
            ), (rec["route_id"], key)
        for key in GLOBAL_INFRACTION_KEYS:
            assert len(rec["infractions"][key]) == len(ref.infractions[key]), (
                rec["route_id"],
                key,
            )
        assert rec["status"] == ref.status, rec["route_id"]

    ref_global = sm.compute_global_statistics(len(records))
    ours_global = data["_checkpoint"]["global_record"]
    for key in ("score_route", "score_penalty", "score_composed"):
        assert ours_global["scores"][key] == pytest.approx(
            ref_global.scores[key], rel=1e-9, abs=1e-9
        ), key
    for key in GLOBAL_INFRACTION_KEYS:
        assert ours_global["infractions"][key] == pytest.approx(
            ref_global.infractions[key], rel=1e-9, abs=1e-9
        ), key
    for env in envs.values():
        env.close()


def test_global_math_on_synthetic_records(vendored):
    """compute_global_record == vendored compute_global_statistics on records
    NOT produced by our evaluator (pure-math cross-check, incl. the 0.001 km
    floor on a zero-completion route)."""
    StatisticsManager, TrafficEvent, TrafficEventType = vendored
    outcomes = [
        Outcome("zero", length_m=500.0, steps=4, step_m=0.0),  # 0% -> km floor
        Outcome(
            "partial",
            length_m=800.0,
            steps=8,
            step_m=50.0,
            counters=EpisodeCounters(red_light=3, collisions_layout=1),
        ),
    ]
    theirs, ref_global = run_vendored(
        outcomes, StatisticsManager, TrafficEvent, TrafficEventType
    )
    ours_records = [
        {
            "route_id": r.route_id,
            "index": r.index,
            "status": r.status,
            "scores": dict(r.scores),
            "meta": dict(r.meta),
            "infractions": {k: list(v) for k, v in r.infractions.items()},
        }
        for r in theirs
    ]
    ours_global = compute_global_record(ours_records, len(outcomes))
    for key in ("score_route", "score_penalty", "score_composed"):
        assert ours_global["scores"][key] == pytest.approx(
            ref_global.scores[key], rel=1e-12, abs=1e-12
        )
    for key in GLOBAL_INFRACTION_KEYS:
        assert ours_global["infractions"][key] == pytest.approx(
            ref_global.infractions[key], rel=1e-12, abs=1e-12
        )

    data = {"_checkpoint": {"records": ours_records, "progress": [2, 2]}}
    finalize_checkpoint(data, 2)
    assert data["entry_status"] == "Finished"
    assert data["labels"][0] == "Avg. driving score"
