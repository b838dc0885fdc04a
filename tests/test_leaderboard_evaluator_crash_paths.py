"""The VENDORED LeaderboardEvaluator's crash-classification paths
(leaderboard_evaluator.py:282-431) driven over mock CARLA.

Completes round-3 verdict item #2: the ScenarioManager tick loop runs in
tests/test_scenario_manager_loop.py; here the evaluator's _load_and_run_
scenario except-blocks execute for real with our agent module loaded through
the evaluator's own reflection path:

* sensor-config violation  -> "Agent's sensors were invalid", entry_status
  "Rejected", sys.exit(-1);
* agent-setup failure      -> "Agent couldn't be set up", route recorded,
  evaluation continues;
* world/scenario load crash -> "Simulation crashed", entry_status "Crashed",
  sys.exit(-1);

and each outcome's official ``_checkpoint`` JSON (written by the real
StatisticsManager.save_record/save_entry_status) carries the matching
``Failed - <crash message>`` status — the same strings driving/evaluator.py
reconciles against in tests/test_statistics_reconcile.py.
"""

import json
import os
import sys
import types

import pytest

LEADERBOARD = "/root/reference/leaderboard"
SRUNNER = "/root/reference/scenario_runner"
AGENT_PATH = (
    "/root/repo/autonomous_driving_with_diffusion_model_tpu/driving/leaderboard_agent.py"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LEADERBOARD), reason="vendored harness not mounted"
)


@pytest.fixture
def evaluator(monkeypatch, tmp_path):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name == "leaderboard" or name.startswith(("leaderboard.", "srunner")):
            monkeypatch.delitem(sys.modules, name, raising=False)
    # the evaluator reloads the agent module by path; purge a cached import
    monkeypatch.delitem(
        sys.modules,
        "autonomous_driving_with_diffusion_model_tpu.driving.leaderboard_agent",
        raising=False,
    )
    monkeypatch.delitem(sys.modules, "leaderboard_agent", raising=False)
    for p in (SRUNNER, LEADERBOARD):
        monkeypatch.syspath_prepend(p)

    # VehicleLightState consumed at evaluator init
    mock_carla.VehicleLightState = types.SimpleNamespace(Position=1, LowBeam=2)

    class _Behaviour:
        def __init__(self, name="b"):
            self.name = name

    pt = types.ModuleType("py_trees")
    pt_blackboard = types.ModuleType("py_trees.blackboard")
    pt_blackboard.Blackboard = type(
        "Blackboard", (), {"set": lambda self, *a, **k: None, "get": lambda self, *a, **k: None}
    )
    pt.blackboard = pt_blackboard
    pt.behaviour = types.SimpleNamespace(Behaviour=_Behaviour)
    pt.common = types.SimpleNamespace(
        Status=types.SimpleNamespace(SUCCESS="S", FAILURE="F", RUNNING="R"),
        ParallelPolicy=types.SimpleNamespace(
            SUCCESS_ON_ONE="one", SUCCESS_ON_ALL="all"
        ),
    )
    pt.composites = types.SimpleNamespace(Parallel=object, Sequence=object)
    pt.meta = types.SimpleNamespace(timeout=lambda *a, **k: (lambda f: f))
    monkeypatch.setitem(sys.modules, "py_trees", pt)
    monkeypatch.setitem(sys.modules, "py_trees.blackboard", pt_blackboard)

    def _dictor(data, path, default=None):
        cur = data
        for part in str(path).split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                return default
        return cur

    dictor_mod = types.ModuleType("dictor")
    dictor_mod.dictor = _dictor
    monkeypatch.setitem(sys.modules, "dictor", dictor_mod)

    from autonomous_driving_with_diffusion_model_tpu.sim.expert import RoadOption
    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
        GlobalRoutePlanner,
    )

    def auto_module(modname):
        """PEP-562 module returning a fresh no-op class per attribute (the
        srunner atomic behaviors/criteria RouteScenario imports; their
        execution stays harness-side per contract)."""
        mod = types.ModuleType(modname)

        def __getattr__(attr):
            if attr.startswith("__"):
                raise AttributeError(attr)
            return type(attr, (), {"__init__": lambda self, *a, **k: None})

        mod.__getattr__ = __getattr__
        return mod

    agents = types.ModuleType("agents"); agents.__path__ = []
    nav = types.ModuleType("agents.navigation"); nav.__path__ = []
    tools = types.ModuleType("agents.tools"); tools.__path__ = []
    misc = types.ModuleType("agents.tools.misc")
    misc.vector = lambda a, b: [b.x - a.x, b.y - a.y, 0.0]
    grp = types.ModuleType("agents.navigation.global_route_planner")
    grp.GlobalRoutePlanner = GlobalRoutePlanner
    dao = types.ModuleType("agents.navigation.global_route_planner_dao")
    dao.GlobalRoutePlannerDAO = object
    lp = types.ModuleType("agents.navigation.local_planner")
    lp.RoadOption = RoadOption
    lp.LocalPlanner = type("LocalPlanner", (), {})
    ba = types.ModuleType("agents.navigation.basic_agent")
    ba.BasicAgent = type("BasicAgent", (), {})
    ba.LocalPlanner = lp.LocalPlanner
    for m in (agents, nav, tools, misc, grp, dao, lp, ba):
        monkeypatch.setitem(sys.modules, m.__name__, m)
    shp = types.ModuleType("shapely")
    shp.geometry = types.ModuleType("shapely.geometry")
    shp.affinity = types.ModuleType("shapely.affinity")
    for m in (shp, shp.geometry, shp.affinity):
        monkeypatch.setitem(sys.modules, m.__name__, m)
    # srunner weather_sim wants the `ephem` astronomy lib (sun position)
    monkeypatch.setitem(sys.modules, "ephem", auto_module("ephem"))

    atomics_pkg = types.ModuleType("srunner.scenariomanager.scenarioatomics")
    atomics_pkg.__path__ = []
    monkeypatch.setitem(
        sys.modules, "srunner.scenariomanager.scenarioatomics", atomics_pkg
    )
    for leaf in ("atomic_behaviors", "atomic_criteria", "atomic_trigger_conditions"):
        modname = f"srunner.scenariomanager.scenarioatomics.{leaf}"
        mod = auto_module(modname)
        monkeypatch.setitem(sys.modules, modname, mod)
        setattr(atomics_pkg, leaf, mod)

    monkeypatch.setenv(
        "AGENT_OPTS",
        "MODEL.DIM 8 MODEL.PERCEPTION tiny EVAL.SAMPLE_STEPS 2 ENV.AGENT_WARMUP 0",
    )

    from leaderboard.leaderboard_evaluator import LeaderboardEvaluator
    from leaderboard.utils.statistics_manager import StatisticsManager

    checkpoint = str(tmp_path / "_checkpoint.json")
    args = types.SimpleNamespace(
        host="localhost", port=2000, trafficManagerPort=8000, timeout=10.0,
        debug=0, agent=AGENT_PATH, agent_config=None, track="SENSORS",
        checkpoint=checkpoint, record="", resume=False, repetitions=1,
    )
    sm = StatisticsManager()
    ev = LeaderboardEvaluator(args, sm)

    def config(town="Town01"):
        class Loc:
            def __init__(self, x, y=0.0, z=0.0):
                self.x, self.y, self.z = x, y, z

        return types.SimpleNamespace(
            name="RouteScenario_0", index=0, repetition_index=0, town=town,
            trajectory=[Loc(0.0), Loc(100.0)],
            # pre-setup crash paths compute statistics before the evaluator
            # assigns config.agent = agent_instance; the stats meta reads
            # config.agent.step (statistics_manager.py:145)
            agent=types.SimpleNamespace(step=0),
            ego_vehicles=[], weather=types.SimpleNamespace(sun_altitude_angle=45.0),
        )

    yield types.SimpleNamespace(
        ev=ev, args=args, sm=sm, config=config, checkpoint=checkpoint,
        mock=mock_carla,
    )
    # the exception paths leave the agent watchdog armed (it stops only on
    # the success path, leaderboard_evaluator.py:319) — disarm before the
    # 11 s timer interrupts a later test
    try:
        ev._agent_watchdog.stop()
    except AttributeError:
        pass
    # prevent __del__'s _cleanup from touching harness state after teardown
    ev.manager = None


def _records(checkpoint):
    with open(checkpoint) as f:
        return json.load(f)


def test_sensor_config_violation_is_rejected(evaluator, monkeypatch):
    """An agent declaring a sensor off the allowed SENSORS-track list makes
    validate_sensor_configuration raise -> 'Rejected' + sys.exit(-1)
    (leaderboard_evaluator.py:321-333)."""
    ev = evaluator.ev
    cfg = evaluator.config()
    evaluator.sm.set_route(cfg.name, cfg.index)

    import importlib

    module = ev.module_agent
    agent_cls = getattr(module, module.get_entry_point())
    real_sensors = agent_cls.sensors

    def bad_sensors(self):
        # opendrive_map is MAP-track only (agent_wrapper.py:289-293)
        specs = real_sensors(self)
        specs.append({"type": "sensor.opendrive_map", "id": "odr",
                      "reading_frequency": 1})
        return specs

    monkeypatch.setattr(agent_cls, "sensors", bad_sensors)
    with pytest.raises(SystemExit):
        ev._load_and_run_scenario(evaluator.args, cfg)
    data = _records(evaluator.checkpoint)
    assert data["entry_status"] == "Rejected"
    rec = data["_checkpoint"]["records"][0]
    assert "Agent's sensors were invalid" in rec["status"]


def test_agent_setup_failure_records_and_continues(evaluator, monkeypatch):
    """A constructor crash -> 'Agent couldn't be set up' record; evaluation
    proceeds to the next route (no exit, leaderboard_evaluator.py:335-346)."""
    ev = evaluator.ev
    cfg = evaluator.config()
    evaluator.sm.set_route(cfg.name, cfg.index)
    module = ev.module_agent
    agent_cls = getattr(module, module.get_entry_point())

    def boom(self, *a, **k):
        raise RuntimeError("no checkpoint")

    monkeypatch.setattr(agent_cls, "__init__", boom)
    ev._load_and_run_scenario(evaluator.args, cfg)  # returns, no SystemExit
    rec = _records(evaluator.checkpoint)["_checkpoint"]["records"][0]
    assert "Agent couldn't be set up" in rec["status"]
    assert rec["scores"]["score_composed"] == 0.0


def test_world_load_crash_is_classified_crashed(evaluator, monkeypatch):
    """A failure while loading the world/scenario -> 'Simulation crashed',
    entry_status 'Crashed', sys.exit(-1) (leaderboard_evaluator.py:370-385)."""
    ev = evaluator.ev
    cfg = evaluator.config(town="Town99")
    evaluator.sm.set_route(cfg.name, cfg.index)

    def no_such_town(town):
        raise RuntimeError(f"map {town} not found")

    monkeypatch.setattr(ev.client, "load_world", no_such_town)
    with pytest.raises(SystemExit):
        ev._load_and_run_scenario(evaluator.args, cfg)
    data = _records(evaluator.checkpoint)
    assert data["entry_status"] == "Crashed"
    rec = data["_checkpoint"]["records"][0]
    assert "Simulation crashed" in rec["status"]
