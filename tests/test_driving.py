"""Driving layer tests: PID/controller/planner parity vs the reference oracle,
plus closed-loop agent runs on the fake env."""

import sys

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from autonomous_driving_with_diffusion_model_tpu.driving import (
    Controller,
    DiffusionAgent,
    DiffusionPlanner,
    FakeDrivingEnv,
    InteractAgent,
    PIDController,
    RoutePlanner,
    aggregate,
    cal_std,
    process_next_waypoint,
)
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg


def tiny_cfg(use_cond="NO_GUIDANCE"):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.TRAIN.USE_COND = use_cond
    cfg.GUIDANCE.USE_COND = use_cond
    cfg.EVAL.SAMPLE_STEPS = 2
    cfg.TRAIN.IMAGE_HEIGHT = 32
    cfg.TRAIN.IMAGE_WIDTH = 48
    return cfg


def test_pid_parity_vs_reference(rng):
    from control.pid import PIDController as RefPID

    ours = PIDController(K_P=1.0, K_I=0.5, K_D=1.0, n=40)
    ref = RefPID(K_P=1.0, K_I=0.5, K_D=1.0, n=40)
    for e in rng.standard_normal(100):
        assert ours.step(float(e)) == pytest.approx(ref.step(float(e)), rel=1e-9)


def test_controller_parity_vs_reference(rng):
    import torch
    from control.controller import Controller as RefController

    cfg = create_cfg()
    ours = Controller(cfg)
    ref = RefController(cfg)
    for _ in range(25):
        wps = rng.standard_normal((4, 2)) * 5
        target = rng.standard_normal(2) * 5
        v = abs(rng.standard_normal()) * 5
        t1, s1, b1 = ours.control_pid(wps, v, target)
        t2, s2, b2 = ref.control_pid(
            torch.from_numpy(wps), torch.tensor([v]), torch.from_numpy(target)
        )
        assert float(t1) == pytest.approx(float(t2), rel=1e-6, abs=1e-9)
        assert float(s1) == pytest.approx(float(s2), rel=1e-6, abs=1e-9)
        assert bool(b1) == bool(b2)


def test_route_planner_parity_vs_reference(rng):
    from e2e_driving.planner import RoutePlanner as RefPlanner

    route = [((float(i * 3), float(np.sin(i))), i % 6) for i in range(30)]
    ours = RoutePlanner(7.0, 50.0)
    ours.set_route(route)
    ref = RefPlanner(7.0, 50.0)
    ref.route.clear()
    for pos, cmd in route:
        ref.route.append((np.array(pos), cmd))

    pos = np.array([0.0, 0.0])
    for step in range(25):
        pos = pos + np.array([2.5, 0.05])
        (wp1, cmd1) = ours.run_step(pos)
        (wp2, cmd2) = ref.run_step(pos)
        np.testing.assert_allclose(wp1, wp2)
        assert cmd1 == cmd2


def test_process_next_waypoint_formula():
    # yaw=0 => theta=pi/2; R.T rotates world delta into ego; axis swap + /23.315
    next_point = np.array([10.0, 5.0])
    cur = np.array([0.0, 0.0])
    out = process_next_waypoint(next_point, cur, 0.0)[0]
    theta = np.pi / 2
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    local = R.T.dot(next_point - cur)
    expected = np.array([local[1], -local[0]]) / 23.315
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    # NaN yaw handled (interact.py:186-187)
    out2 = process_next_waypoint(next_point, cur, float("nan"))[0]
    assert np.isfinite(out2).all()


def test_agent_to_world_inverts_ego_transform(rng):
    """agent_to_world (interact.py:249-260) inverts process_next_waypoint."""
    from autonomous_driving_with_diffusion_model_tpu.driving.plan import agent_to_world
    from autonomous_driving_with_diffusion_model_tpu.utils.constants import MAGIC_NUM

    w = rng.standard_normal((5, 2)) * 20
    c = rng.standard_normal(2) * 5
    yaw = 0.7
    ego = process_next_waypoint(w, c, yaw) * MAGIC_NUM
    back = agent_to_world(ego, yaw, c)
    np.testing.assert_allclose(back, w, atol=1e-5)


def test_interact_agent_closed_loop_fake_env():
    cfg = tiny_cfg("NO_GUIDANCE")
    env = FakeDrivingEnv(image_hw=(32, 48), bev_hw=(64, 64))
    agent = InteractAgent(cfg, env)
    steps = agent.run(max_steps=5)
    assert steps == 5
    # controls were applied: env advanced
    assert env.steps == 5


def test_fake_env_expert_progresses_along_route():
    """Regression: the expert autopilot must track the route FORWARD. The old
    waypoint scan ("first route point with dist > thresh") re-selected
    route[0] once the ego passed it by more than the threshold, U-turning the
    expert back toward the origin (~1 m net progress in 120 ticks instead of
    the ~55 m a 5 m/s cruise covers)."""
    env = FakeDrivingEnv(image_hw=(8, 8), bev_hw=(8, 8))
    env.reset()
    for _ in range(120):
        obs, _r, done, _ = env.step({0: None})
        # the advertised next waypoint never falls behind the ego's progress
        assert obs["next_waypoint"][0][0] >= env.pos[0] - 4.0
        if done:
            break
    assert env.pos[0] > 40.0  # ~5 m/s cruise for 12 s (old bug: ~1 m)
    assert abs(env.pos[1]) < 1.0  # stays on the straight +x route


def test_interact_agent_with_free_guidance():
    cfg = tiny_cfg("FREE_GUIDANCE")
    env = FakeDrivingEnv(image_hw=(32, 48), bev_hw=(64, 64))
    frames = []
    agent = InteractAgent(cfg, env, on_frame=lambda s, t, c: frames.append((t, c)))
    agent.run(max_steps=3)
    traj, control = frames[-1]
    assert traj.shape == (1, 16, 7)
    assert np.isfinite(traj).all() and np.isfinite(control).all()
    assert control.shape == (3,)


def test_plan_begin_fetch_matches_plan():
    """The async dispatch path (plan_begin/plan_fetch) returns exactly what
    the blocking plan() would for the same frame (fixed init noise)."""
    cfg = tiny_cfg("NO_GUIDANCE")
    planner = DiffusionPlanner(cfg)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (32, 48, 3), np.uint8)
    blocking = planner.plan(rgb)
    handle = planner.plan_begin(rgb)
    np.testing.assert_array_equal(planner.plan_fetch(handle), blocking)


def test_interact_agent_pipelined_one_frame_staleness():
    """Pipelined mode: control at step t comes from the frame-(t-1) plan
    (the first step acts on its own plan). On a replayed obs sequence the
    pipelined trajectory stream equals the sequential stream shifted by one."""
    from autonomous_driving_with_diffusion_model_tpu.driving.fake_env import ReplayEnv

    cfg = tiny_cfg("NO_GUIDANCE")
    rng = np.random.default_rng(3)
    obs = [
        {
            "camera": [rng.integers(0, 255, (32, 48, 3), np.uint8)],
            "bev": [np.zeros((64, 64, 3), np.uint8)],
            "compass": [[0.0]],
            "cur_waypoint": np.zeros((1, 2)),
            "next_waypoint": np.zeros((1, 2)),
            "next_command": [4],
            "state": [[0.0, 1.0, 0.5, 0.0, 0.0]],
            "at_red_light": [0],
        }
        for _ in range(4)
    ]
    planner = DiffusionPlanner(cfg)

    seq_frames, pipe_frames = [], []
    agent = InteractAgent(
        cfg, ReplayEnv(list(obs)), planner=planner,
        on_frame=lambda s, t, c: seq_frames.append(np.asarray(t)),
    )
    agent.run(max_steps=3)
    agent_p = InteractAgent(
        cfg, ReplayEnv(list(obs)), planner=planner, pipelined=True,
        on_frame=lambda s, t, c: pipe_frames.append(np.asarray(t)),
    )
    agent_p.run(max_steps=3)

    np.testing.assert_array_equal(pipe_frames[0], seq_frames[0])
    for t in range(1, 3):
        np.testing.assert_array_equal(pipe_frames[t], seq_frames[t - 1])


def test_interact_agent_plot_on_world(monkeypatch):
    """--plot-on-world draws the planned waypoints through the env world's
    debug surface in WORLD coordinates (reference interact.py:305-312)."""
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    cfg = tiny_cfg("NO_GUIDANCE")
    env = FakeDrivingEnv(image_hw=(32, 48), bev_hw=(64, 64))
    env.world = mock_carla._World()  # fake env + a mock debug surface
    agent = InteractAgent(cfg, env, plot_on_world=True)
    agent.run(max_steps=2)
    drawn = env.world.debug.strings
    # 16 waypoints per plan, one plan per step
    assert len(drawn) == 2 * 16
    # drawn near the ego's current world position (traj is meters, ego-frame)
    state = env.reset()
    cur = np.asarray(state["cur_waypoint"])[0]
    pts = np.array([[loc.x, loc.y] for loc, _text in drawn[:16]])
    assert np.linalg.norm(pts - np.asarray(cur)[None], axis=1).max() < 2 * 23.315


def test_interact_agent_2dim_model_pid_path():
    """TRANSITION_DIM=2 waypoint-only model: control comes from the PID
    controller over the first 4 waypoints (reference: interact.py:298-307)."""
    cfg = tiny_cfg("NO_GUIDANCE")
    cfg.MODEL.TRANSITION_DIM = 2
    env = FakeDrivingEnv(image_hw=(32, 48), bev_hw=(64, 64))
    frames = []
    agent = InteractAgent(cfg, env, on_frame=lambda s, t, c: frames.append((t, c)))
    agent.run(max_steps=3)
    traj, control = frames[-1]
    assert traj.shape == (1, 16, 2)
    assert control.shape == (3,)
    assert np.isfinite(control).all()
    assert 0.0 <= control[0] <= cfg.CONTROL.MAX_THROTTLE  # PID throttle clip


def test_leaderboard_agent_run_step(tmp_path, rng):
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        "MODEL:\n  DIM: 8\n  PERCEPTION: tiny\nEVAL:\n  SAMPLE_STEPS: 2\n"
        "TRAIN:\n  IMAGE_HEIGHT: 32\n  IMAGE_WIDTH: 48\n"
    )
    agent = DiffusionAgent()
    agent.setup(str(cfg_path))
    assert agent.sensors()[0]["width"] == 900  # reference sensor suite intact
    route = [((float(i * 5), 0.0), 4) for i in range(20)]
    agent.set_global_plan(None, route)

    def make_input(step):
        return {
            "rgb": (None, rng.integers(0, 255, (32, 48, 4), dtype=np.uint8)),
            "bev": (None, rng.integers(0, 255, (64, 64, 4), dtype=np.uint8)),
            "gps": (None, np.array([1.0 * step, 0.0, 0.0])),
            "speed": (None, {"speed": 1.0}),
            "imu": (None, np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.1])),
        }

    c0 = agent.run_step(make_input(0), 0.0)  # warmup frame
    assert c0.throttle == 0.0 and c0.brake == 0.0
    c1 = agent.run_step(make_input(1), 0.1)
    assert np.isfinite([c1.throttle, c1.steer, c1.brake]).all()
    # sampler clamps the trajectory to [-1, 1]; with untrained weights the raw
    # action can be negative (CARLA clamps on apply, like the reference)
    assert -1.0 <= c1.throttle <= 1.0 and -1.0 <= c1.steer <= 1.0


def test_statistics_aggregate():
    records = []
    for i in range(15):
        records.append(
            {
                "scores": {
                    "score_composed": 10.0 + i,
                    "score_penalty": 0.5,
                    "score_route": 50.0,
                },
                "meta": {"route_length": 2000.0},
                "infractions": {
                    k: (["x"] if i % 3 == 0 and k == "collisions_vehicle" else [])
                    for k in [
                        "collisions_layout",
                        "collisions_pedestrian",
                        "collisions_vehicle",
                        "red_light",
                        "stop_infraction",
                        "vehicle_blocked",
                        "outside_route_lanes",
                    ]
                },
            }
        )
    data = {"_checkpoint": {"records": records}}
    out = aggregate(data)
    assert out["score_composed"] == pytest.approx(np.mean([10.0 + i for i in range(15)]))
    assert out["score_penalty"] == pytest.approx(0.5)
    # run 0 (i=0,3,6,9,12) has 5 collisions over 5 routes * 1 km each
    assert out["collisions_vehicle"] == pytest.approx((5 / 5 + 0 + 0) / 3)
    assert cal_std([1.0] * 15) == pytest.approx(0.0)


def test_interact_cli_flag_plumbing(monkeypatch, tmp_path):
    """interact.py's --pipelined / --plot-on-world / --save-bev-path reach
    the InteractAgent constructor (CLI contract guard)."""
    import importlib.util
    import os
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "interact_cli", os.path.join(repo, "interact.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    captured = {}

    class _Agent:
        def __init__(self, cfg, env, planner=None, bev_save_path=None,
                     plot_on_world=False, pipelined=False):
            captured.update(
                bev_save_path=bev_save_path,
                plot_on_world=plot_on_world,
                pipelined=pipelined,
            )

        def run(self, max_steps=None):
            return 0

    import autonomous_driving_with_diffusion_model_tpu.driving as drv

    monkeypatch.setattr(drv, "InteractAgent", _Agent)
    monkeypatch.setattr(drv, "DiffusionPlanner", lambda cfg, seed=0: None)
    bev = str(tmp_path / "bev")
    monkeypatch.setattr(
        _sys, "argv",
        ["interact.py", "--fake-env", "--pipelined", "--plot-on-world",
         "--save-bev-path", bev, "--max-steps", "1",
         "--opts", "MODEL.DIM", "8", "MODEL.PERCEPTION", "tiny"],
    )
    mod.main()
    assert captured == {
        "bev_save_path": bev, "plot_on_world": True, "pipelined": True,
    }
