"""DiffusionAgent exercised under the VENDORED leaderboard harness.

Imports the reference's real AgentWrapper / SensorInterface / GameTime
(read-only from /root/reference) and drives our agent through:

1. ``AgentWrapper.validate_sensor_configuration`` — the sensor-spec and
   track-enum validation the evaluator applies before a run
   (agent_wrapper.py:263-311);
2. the evaluator's reflection contract (``get_entry_point`` ->
   ``AgentClass(path_to_conf_file)``, leaderboard_evaluator.py:106-117);
3. ``AgentWrapper.__call__`` -> ``agent()`` -> SensorInterface.get_data ->
   run_step -> VehicleControl (autonomous_agent.py:101-121).

The simulator is mocked (tests/mock_carla.py) and srunner's py_trees / the
carla ``agents`` package are stubbed — our first-party route planner stands in
for the latter.
"""

import sys
import types

import numpy as np
import pytest

LEADERBOARD = "/root/reference/leaderboard"
SRUNNER = "/root/reference/scenario_runner"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(LEADERBOARD), reason="vendored harness not mounted"
)


@pytest.fixture
def harness(monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    # other tests put /root/reference itself on sys.path, under which
    # `leaderboard`/`srunner` resolve as empty namespace packages — purge any
    # such stale imports and make the real package roots win
    for name in list(sys.modules):
        if name == "leaderboard" or name.startswith(("leaderboard.", "srunner")):
            monkeypatch.delitem(sys.modules, name, raising=False)
    for p in (SRUNNER, LEADERBOARD):
        monkeypatch.syspath_prepend(p)

    # srunner's timer module subclasses py_trees.behaviour.Behaviour
    class _Behaviour:
        def __init__(self, name="b"):
            self.name = name

    pt = types.ModuleType("py_trees")
    pt.blackboard = types.SimpleNamespace(Blackboard=object)
    pt.behaviour = types.SimpleNamespace(Behaviour=_Behaviour)
    pt.common = types.SimpleNamespace(
        Status=types.SimpleNamespace(SUCCESS="S", FAILURE="F", RUNNING="R")
    )
    monkeypatch.setitem(sys.modules, "py_trees", pt)

    # the harness imports carla's `agents` package; our first-party planner
    # implements the same surface
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

    from leaderboard.autoagents.agent_wrapper import AgentWrapper

    return AgentWrapper


def _make_agent(monkeypatch):
    monkeypatch.setenv(
        "AGENT_OPTS",
        "MODEL.DIM 8 MODEL.PERCEPTION tiny EVAL.SAMPLE_STEPS 2 ENV.AGENT_WARMUP 0",
    )
    import importlib

    import autonomous_driving_with_diffusion_model_tpu.driving.leaderboard_agent as la

    importlib.reload(la)  # re-resolve Track against the now-importable harness
    return la


def test_sensor_configuration_validates_under_harness(harness, monkeypatch):
    la = _make_agent(monkeypatch)
    from leaderboard.autoagents.autonomous_agent import Track

    agent_cls = getattr(la, la.get_entry_point())  # evaluator reflection
    agent = agent_cls(None)
    assert agent.track == Track.SENSORS
    # raises SensorConfigurationInvalid on any violation
    harness.validate_sensor_configuration(agent.sensors(), agent.track, "SENSORS")
    agent.destroy()


def test_agent_wrapper_call_path(harness, monkeypatch):
    la = _make_agent(monkeypatch)
    agent = getattr(la, la.get_entry_point())(None)
    wrapper = harness(agent)

    # leaderboard-format global plan: GPS + world-coord pairs along +x
    from autonomous_driving_with_diffusion_model_tpu.sim.expert import RoadOption
    from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
        location_to_gps,
    )

    class _Loc:
        def __init__(self, x, y):
            self.x, self.y, self.z = float(x), float(y), 0.0

    plan_world = [(_Loc(x, 0.0), RoadOption.LANEFOLLOW) for x in range(0, 200, 50)]
    plan_gps = [
        ({"lat": g[0], "lon": g[1], "z": g[2]}, opt)
        for (loc, opt) in plan_world
        for g in [location_to_gps(loc)]
    ]
    agent.set_global_plan(plan_gps, plan_world)

    # register the agent's sensors with the REAL SensorInterface and feed one
    # synthetic frame per tag, as the harness CallBacks would
    rng = np.random.default_rng(0)
    frames = {
        "rgb": rng.integers(0, 255, (256, 900, 4), np.uint8),
        "bev": rng.integers(0, 255, (512, 512, 4), np.uint8),
        "imu": np.array([0, 0, 0, 0, 0, 0, 0.1], np.float64),  # [-1] = compass
        "gps": np.array([0.0, 0.0, 0.0], np.float64),
        "speed": {"speed": 3.0},
    }
    for spec in agent.sensors():
        agent.sensor_interface.register_sensor(spec["id"], spec["type"], object())
    for step in range(2):
        for tag, data in frames.items():
            agent.sensor_interface.update_sensor(tag, data, frame := 100 + step)
        control = wrapper()  # AgentWrapper.__call__ -> agent() -> run_step
        # raw planner outputs (untrained weights): the contract is a finite
        # VehicleControl — CARLA clamps ranges on apply, as with the reference
        for field in ("throttle", "steer", "brake"):
            assert np.isfinite(getattr(control, field))
        assert control.manual_gear_shift is False
    agent.destroy()
