"""Scoring math, gps conversion, evaluator harness, tracker."""

import json
import sys

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from autonomous_driving_with_diffusion_model_tpu.driving import (
    EpisodeCounters,
    FakeDrivingEnv,
    InteractAgent,
    PENALTIES,
    RouteEvaluator,
    aggregate,
    episode_stats,
    gps2xyz,
    xyz2gps,
)


def test_penalty_constants_match_reference():
    """Literal constants from ego_vehicle_handler.py:8-12 (module imports carla,
    so values are pinned here instead of imported)."""
    assert PENALTIES["collisions_pedestrian"] == 0.50
    assert PENALTIES["collisions_vehicle"] == 0.60
    assert PENALTIES["collisions_layout"] == 0.65
    assert PENALTIES["red_light"] == 0.70
    assert PENALTIES["stop_infraction"] == 0.80


def test_episode_stats_formula():
    c = EpisodeCounters(collisions_vehicle=2, red_light=1, outside_lane_m=100.0)
    stats = episode_stats(
        c, route_length_m=2000.0, route_completed_m=1000.0, is_route_completed=False
    )
    assert stats["score_route"] == pytest.approx(0.5)
    expected_penalty = (1 - 0.1 / 1.0) * 0.6**2 * 0.7
    assert stats["score_penalty"] == pytest.approx(expected_penalty)
    assert stats["score_composed"] == pytest.approx(0.5 * expected_penalty)
    assert stats["collisions_vehicle"] == pytest.approx(2.0)  # per km
    # completed route overrides fraction
    stats2 = episode_stats(
        EpisodeCounters(), route_length_m=2000.0, route_completed_m=1500.0,
        is_route_completed=True,
    )
    assert stats2["score_route"] == 1.0
    assert stats2["is_route_completed_nocrash"] == 1.0
    # endless mode scores completed km
    stats3 = episode_stats(
        EpisodeCounters(), route_length_m=1.0, route_completed_m=3500.0,
        is_route_completed=False, endless=True,
    )
    assert stats3["score_route"] == pytest.approx(3.5)


def test_gps_roundtrip_matches_reference(rng):
    from carla_gym.utils import gps_utils as ref_gps

    for _ in range(10):
        x, y, z = rng.uniform(-5000, 5000, 3)
        lat, lon, z2 = xyz2gps(x, y, z)
        assert (lat, lon, z2) == pytest.approx(ref_gps.xyz2gps(x, y, z))
        bx, by, bz = gps2xyz(lat, lon, z2)
        assert (bx, by) == pytest.approx((x, y), abs=1e-6)
        assert (bx, by, bz) == pytest.approx(ref_gps.gps2xyz(lat, lon, z2))


def test_route_evaluator_end_to_end(tmp_path):
    from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg

    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.EVAL.SAMPLE_STEPS = 2
    cfg.TRAIN.IMAGE_HEIGHT = 32
    cfg.TRAIN.IMAGE_WIDTH = 48

    routes = [{"id": "r0", "length_m": 50.0}, {"id": "r1", "length_m": 50.0}]

    def env_factory(route):
        r = np.stack([np.arange(0.0, 50.0, 2.0), np.zeros(25)], axis=-1)
        return FakeDrivingEnv(route=r, image_hw=(32, 48), bev_hw=(64, 64))

    def agent_factory():
        return InteractAgent(cfg, env=None)

    ckpt = str(tmp_path / "eval.json")
    ev = RouteEvaluator(agent_factory, env_factory, routes, ckpt, max_steps_per_route=20)
    data = ev.run()
    records = data["_checkpoint"]["records"]
    assert len(records) == 2
    assert records[0]["route_id"] == "r0"
    # 20 ticks cannot cover the 50 m route, and a non-endless route that
    # missed its target is "Failed" per the leaderboard
    # (statistics_manager.py:224-232; reconciled in
    # tests/test_statistics_reconcile.py) — r5 status-semantics fix
    assert records[0]["status"] == "Failed"
    assert records[0]["scores"]["score_route"] < 100.0
    assert "score_composed" in records[0]["scores"]
    # resume: a second run skips finished routes (no duplicates)
    data2 = RouteEvaluator(agent_factory, env_factory, routes, ckpt, 20).run(resume=True)
    assert len(data2["_checkpoint"]["records"]) == 2
    # json on disk parses and feeds the statistics aggregator (pad to 15 first)
    with open(ckpt) as f:
        saved = json.load(f)
    saved["_checkpoint"]["records"] = saved["_checkpoint"]["records"] * 8
    out = aggregate(saved)
    assert np.isfinite(out["score_composed"])


def test_evaluator_crash_classification(tmp_path):
    class CrashingAgent:
        def compute_control(self, state):
            raise RuntimeError("boom")

    def env_factory(route):
        return FakeDrivingEnv(image_hw=(16, 16), bev_hw=(16, 16))

    ev = RouteEvaluator(
        lambda: CrashingAgent(), env_factory, [{"id": "r0", "length_m": 10.0}],
        str(tmp_path / "c.json"), 5,
    )
    data = ev.run()
    rec = data["_checkpoint"]["records"][0]
    assert rec["status"] == "Failed - Agent crashed"
    assert "boom" in rec["crash_message"]


def test_tracker(tmp_path):
    from autonomous_driving_with_diffusion_model_tpu.utils.tracker import Tracker

    tr = Tracker(str(tmp_path), "test")
    tr.log({"loss": 1.5, "lr": 1e-4}, step=10)
    tr.log({"loss": 1.2}, step=20)
    lines = [json.loads(ln) for ln in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["event"] == "run_start"
    assert lines[1]["loss"] == 1.5 and lines[1]["step"] == 10
    assert lines[2]["loss"] == 1.2


def test_evaluator_infraction_terminated_route_keeps_partial_score(tmp_path):
    """done != completed (code-review r3 finding #1): an env that terminates
    on an infraction reports is_route_completed=0 in its episode_stat — the
    record must keep the PARTIAL score_route and attribute the failure, not
    score 100% 'Completed'."""

    class BlockedEnv:
        """Terminates 'blocked' at step 3, 20% through a 100 m route."""

        def __init__(self):
            self.counters = EpisodeCounters(vehicle_blocked=1)

        def reset(self):
            return {"cur_waypoint": np.zeros((1, 2))}

        def step(self, control_dict):
            self._i = getattr(self, "_i", 0) + 1
            obs = {"cur_waypoint": np.asarray([[self._i * 5.0, 0.0]])}
            done = self._i >= 3
            info = {}
            if done:
                info["episode_stat"] = episode_stats(
                    self.counters, route_length_m=100.0, route_completed_m=20.0,
                    is_route_completed=False,
                )
            return obs, 0.0, done, info

    class StopAgent:
        def compute_control(self, state):
            return np.zeros(3)

    env = BlockedEnv()
    ev = RouteEvaluator(
        agent_factory=lambda: StopAgent(),
        env_factory=lambda route: env,
        routes=[{"id": "r0", "length_m": 100.0}],
        checkpoint_path=str(tmp_path / "c.json"),
        max_steps_per_route=10,
        counters_fn=lambda e: e.counters,
    )
    rec = ev.run()["_checkpoint"]["records"][0]
    assert rec["status"] == "Failed - Agent got blocked"
    assert rec["scores"]["score_route"] == pytest.approx(20.0)  # percent
    assert rec["scores"]["score_composed"] < 100.0


def test_finalize_checkpoint_handles_zero_routes():
    from autonomous_driving_with_diffusion_model_tpu.driving.leaderboard_stats import (
        finalize_checkpoint,
    )

    data = {"_checkpoint": {"records": [], "progress": [0, 0]}}
    out = finalize_checkpoint(data, 0)
    assert out["_checkpoint"]["global_record"]["scores"]["score_composed"] == 0.0
    assert out["entry_status"] == "Finished"


def test_evaluator_env_timeout_attributed(tmp_path):
    """An env timeout terminal becomes 'Failed - Agent timed out' with the
    leaderboard's route_timeout infraction event."""

    class TimeoutEnv:
        counters = EpisodeCounters()

        def reset(self):
            return {"cur_waypoint": np.zeros((1, 2))}

        def step(self, control_dict):
            stat = episode_stats(
                self.counters, route_length_m=100.0, route_completed_m=40.0,
                is_route_completed=False, timeout=True,
            )
            return (
                {"cur_waypoint": np.asarray([[40.0, 0.0]])},
                0.0,
                True,
                {"episode_stat": stat},
            )

    class StopAgent:
        def compute_control(self, state):
            return np.zeros(3)

    ev = RouteEvaluator(
        agent_factory=lambda: StopAgent(),
        env_factory=lambda route: TimeoutEnv(),
        routes=[{"id": "r0", "length_m": 100.0}],
        checkpoint_path=str(tmp_path / "c.json"),
        max_steps_per_route=10,
        counters_fn=lambda e: e.counters,
    )
    rec = ev.run()["_checkpoint"]["records"][0]
    assert rec["status"] == "Failed - Agent timed out"
    assert rec["infractions"]["route_timeout"] == ["Route timeout."]
    assert rec["scores"]["score_route"] == pytest.approx(40.0)
