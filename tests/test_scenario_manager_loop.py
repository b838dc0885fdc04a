"""The VENDORED ScenarioManager's real tick loop driven end-to-end over mock
CARLA with our DiffusionAgent.

Round-3 verdict item #2: the agent was validated under AgentWrapper /
SensorInterface, but nothing drove
``leaderboard/leaderboard/scenarios/scenario_manager.py:118-183`` — the loop
where GameTime / CarlaDataProvider updates, ``agent()`` (queue-synced
SensorInterface.get_data -> run_step), ego ``apply_control``, the behaviour
tree tick, ``world.tick``, and BOTH watchdogs actually meet.  Here that exact
code runs unmodified: the simulator is tests/mock_carla.py, sensors are
spawned by the real ``AgentWrapper.setup_sensors`` and parsed by the real
``CallBack``s (raw bytes -> arrays), the speedometer is the real threaded
``SpeedometerReader`` ticking off GameTime, and the scenario tree is a
scripted py_trees stub (the srunner behaviour library stays harness-side per
the BASELINE.json contract).

Also covered: the manager's agent-crash wrapping (``AgentError``), the
sensor-timeout path (``SensorReceivedNoData`` -> RuntimeError), and
``stop_scenario``'s analyze/ResultOutputProvider output.
"""

import os
import sys
import types

import numpy as np
import pytest

LEADERBOARD = "/root/reference/leaderboard"
SRUNNER = "/root/reference/scenario_runner"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LEADERBOARD), reason="vendored harness not mounted"
)


class _Status:
    """Distinct sentinels mirroring py_trees.common.Status."""

    SUCCESS = "SUCCESS"
    FAILURE = "FAILURE"
    RUNNING = "RUNNING"
    INVALID = "INVALID"


class _ScriptedTree:
    """py_trees-free behaviour tree: RUNNING for n_running ticks, then done."""

    def __init__(self, n_running, final=_Status.SUCCESS, name="RouteScenario_0"):
        self.name = name
        self.n_running = n_running
        self.final = final
        self.status = _Status.RUNNING
        self.ticks = 0

    def tick_once(self):
        self.ticks += 1
        if self.ticks >= self.n_running:
            self.status = self.final


class _Criterion:
    def __init__(self, name="CollisionTest", status="SUCCESS", actual=0):
        self.name = name
        self.test_status = status
        self.actual_value = actual
        self.expected_value_success = 0
        self.optional = False


class _ScenarioStub:
    """The slice of srunner's Scenario the manager + result writer touch."""

    def __init__(self, tree, criteria):
        self.scenario_tree = tree
        self.timeout = 60.0
        self.timeout_node = types.SimpleNamespace(timeout=False)
        self._criteria = criteria
        self.terminated = False

    def get_criteria(self):
        return self._criteria

    def terminate(self):
        self.terminated = True


class _RouteStub:
    """Stands in for RouteScenario at the manager's load_scenario surface."""

    def __init__(self, scenario, ego):
        self.scenario = scenario
        self.ego_vehicles = [ego]
        self.other_actors = []


@pytest.fixture
def vendored(monkeypatch):
    """Mock carla + stub py_trees/agents, import the real harness modules
    fresh (so GameTime/CarlaDataProvider static state is per-test)."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    for name in list(sys.modules):
        if name == "leaderboard" or name.startswith(("leaderboard.", "srunner")):
            monkeypatch.delitem(sys.modules, name, raising=False)
    for p in (SRUNNER, LEADERBOARD):
        monkeypatch.syspath_prepend(p)

    class _Behaviour:
        def __init__(self, name="b"):
            self.name = name

    pt = types.ModuleType("py_trees")
    pt.blackboard = types.SimpleNamespace(Blackboard=object)
    pt.behaviour = types.SimpleNamespace(Behaviour=_Behaviour)
    pt.common = types.SimpleNamespace(Status=_Status)
    pt.display = types.SimpleNamespace(print_ascii_tree=lambda *a, **k: None)
    monkeypatch.setitem(sys.modules, "py_trees", pt)

    from autonomous_driving_with_diffusion_model_tpu.sim.expert import RoadOption
    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
        GlobalRoutePlanner,
    )

    agents = types.ModuleType("agents"); agents.__path__ = []
    nav = types.ModuleType("agents.navigation"); nav.__path__ = []
    grp = types.ModuleType("agents.navigation.global_route_planner")
    grp.GlobalRoutePlanner = GlobalRoutePlanner
    dao = types.ModuleType("agents.navigation.global_route_planner_dao")
    dao.GlobalRoutePlannerDAO = object
    lp = types.ModuleType("agents.navigation.local_planner")
    lp.RoadOption = RoadOption
    for m in (agents, nav, grp, dao, lp):
        monkeypatch.setitem(sys.modules, m.__name__, m)

    from srunner.scenariomanager.carla_data_provider import CarlaDataProvider
    from srunner.scenariomanager.timer import GameTime

    from leaderboard.scenarios.scenario_manager import ScenarioManager

    world = mock_carla._World()
    world.settings.fixed_delta_seconds = 0.05  # 20 Hz, leaderboard_evaluator.py:77
    world.settings.synchronous_mode = True
    CarlaDataProvider.set_world(world)

    ego_bp = world.get_blueprint_library().find("vehicle.lincoln.mkz2017")
    ego = world.spawn_actor(ego_bp, mock_carla.Transform(mock_carla.Location(5.0, 0.0)))

    yield types.SimpleNamespace(
        world=world,
        ego=ego,
        mock=mock_carla,
        ScenarioManager=ScenarioManager,
        CarlaDataProvider=CarlaDataProvider,
        GameTime=GameTime,
    )
    CarlaDataProvider.cleanup()


def _make_agent(monkeypatch):
    monkeypatch.setenv(
        "AGENT_OPTS",
        "MODEL.DIM 8 MODEL.PERCEPTION tiny EVAL.SAMPLE_STEPS 2 ENV.AGENT_WARMUP 0",
    )
    import importlib

    import autonomous_driving_with_diffusion_model_tpu.driving.leaderboard_agent as la

    importlib.reload(la)
    agent = getattr(la, la.get_entry_point())(None)

    from autonomous_driving_with_diffusion_model_tpu.sim.expert import RoadOption
    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
        location_to_gps,
    )

    class _Loc:
        def __init__(self, x, y):
            self.x, self.y, self.z = float(x), float(y), 0.0

    plan_world = [(_Loc(x, 0.0), RoadOption.LANEFOLLOW) for x in range(0, 200, 25)]
    plan_gps = [
        ({"lat": g[0], "lon": g[1], "z": g[2]}, opt)
        for (loc, opt) in plan_world
        for g in [location_to_gps(loc)]
    ]
    agent.set_global_plan(plan_gps, plan_world)
    return agent


def test_manager_runs_full_tick_loop(vendored, monkeypatch, capsys):
    """scenario_manager.py:118-183 executes unmodified: N agent plans are
    applied to the ego, the tree ticks, GameTime tracks the mock clock,
    watchdogs stay green, and stop_scenario analyzes + prints results."""
    agent = _make_agent(monkeypatch)
    tree = _ScriptedTree(n_running=4)
    scenario = _RouteStub(
        _ScenarioStub(tree, [_Criterion(), _Criterion("RouteCompletionTest", actual=100)]),
        vendored.ego,
    )

    manager = vendored.ScenarioManager(timeout=10.0)
    manager.load_scenario(scenario, agent, rep_number=0)

    applied = []
    orig_apply = vendored.ego.apply_control
    monkeypatch.setattr(
        vendored.ego, "apply_control", lambda c: (applied.append(c), orig_apply(c))
    )

    manager.run_scenario()

    assert tree.ticks == 4
    assert len(applied) == 4  # one agent() -> apply_control per manager tick
    for control in applied:
        for field in ("throttle", "steer", "brake"):
            assert np.isfinite(getattr(control, field))
    # GameTime tracked the mock world's 20 Hz clock through on_carla_tick
    assert vendored.GameTime.get_frame() == vendored.world.frame
    assert vendored.GameTime.get_time() > 0.0
    assert manager.get_running_status()  # neither watchdog fired

    manager.stop_scenario()
    assert scenario.scenario.terminated
    assert manager.scenario_duration_game > 0.0
    out = capsys.readouterr().out
    assert "Results of RouteScenario_0" in out  # ResultOutputProvider table
    assert "CollisionTest" in out and "SUCCESS" in out
    agent.destroy()


def test_agent_crash_is_wrapped_as_agent_error(vendored, monkeypatch):
    """An exception inside run_step surfaces as AgentError from the manager
    loop (scenario_manager.py:151-159), which the evaluator maps to the
    'Agent crashed' record — mirrored by driving/evaluator.py's
    'Failed - Agent crashed' status."""
    from leaderboard.autoagents.agent_wrapper import AgentError

    agent = _make_agent(monkeypatch)

    def _boom(input_data, timestamp):
        raise RuntimeError("planner exploded")

    monkeypatch.setattr(agent, "run_step", _boom)
    tree = _ScriptedTree(n_running=10)
    scenario = _RouteStub(_ScenarioStub(tree, [_Criterion()]), vendored.ego)
    manager = vendored.ScenarioManager(timeout=10.0)
    manager.load_scenario(scenario, agent, rep_number=0)
    with pytest.raises(AgentError):
        manager.run_scenario()
    manager._running = False
    manager.stop_scenario()
    agent.destroy()


def test_sensor_silence_raises_runtime_error(vendored, monkeypatch):
    """A sensor that stops delivering makes SensorInterface.get_data raise
    SensorReceivedNoData, which the manager re-raises as RuntimeError
    (scenario_manager.py:153-156) so the sim watchdog path attributes it."""
    agent = _make_agent(monkeypatch)
    tree = _ScriptedTree(n_running=10)
    scenario = _RouteStub(_ScenarioStub(tree, [_Criterion()]), vendored.ego)
    manager = vendored.ScenarioManager(timeout=10.0)
    manager.load_scenario(scenario, agent, rep_number=0)

    # silence the front camera (its CallBack never fires again) and shrink
    # the queue timeout so the test doesn't sit out the full 10 s
    for s in vendored.world.sensors:
        if s.bp.id == "sensor.camera.rgb" and int(s.bp.attrs.get("image_size_x", 0)) == 900:
            s.callback = None
    agent.sensor_interface._queue_timeout = 0.5
    # drain data already queued by the load_scenario spawn tick
    try:
        agent.sensor_interface.get_data()
    except Exception:
        pass

    with pytest.raises(RuntimeError):
        manager.run_scenario()
    manager._running = False
    manager.stop_scenario()
    agent.destroy()


def test_timeout_marks_failure_in_analysis(vendored, monkeypatch, capsys):
    """A tree that ends in FAILURE (or a fired timeout node) turns the
    analyze_scenario verdict to FAILURE (scenario_manager.py:215-227)."""
    agent = _make_agent(monkeypatch)
    tree = _ScriptedTree(n_running=2, final=_Status.FAILURE)
    stub = _ScenarioStub(tree, [_Criterion(status="FAILURE", actual=2)])
    stub.timeout_node.timeout = True
    scenario = _RouteStub(stub, vendored.ego)
    manager = vendored.ScenarioManager(timeout=10.0)
    manager.load_scenario(scenario, agent, rep_number=0)
    manager.run_scenario()
    manager.stop_scenario()
    out = capsys.readouterr().out
    assert "FAILURE" in out
    agent.destroy()
