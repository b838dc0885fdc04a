"""Route evaluation harness with leaderboard-format records.

A slim, simulator-agnostic equivalent of the leaderboard evaluator loop
(reference: leaderboard/leaderboard/leaderboard_evaluator.py:282-431 +
utils/statistics_manager.py): runs an agent closed-loop over a list of routes,
scores each episode (driving.scoring), and writes a ``_checkpoint`` JSON that
``driving.statistics.aggregate`` (and the reference's statistics CLI) consume
directly — including crash classification and ``--resume`` semantics (finished
routes are skipped on re-run).
"""

from __future__ import annotations

import json
import os
import traceback
from typing import Callable, Dict, List, Optional

import numpy as np

from .scoring import EpisodeCounters, episode_stats
from .statistics import INFRACTION_KEYS

__all__ = ["RouteEvaluator"]


class RouteEvaluator:
    def __init__(
        self,
        agent_factory: Callable[[], object],
        env_factory: Callable[[Dict], object],
        routes: List[Dict],
        checkpoint_path: str,
        max_steps_per_route: int = 1000,
        counters_fn: Optional[Callable[[object], EpisodeCounters]] = None,
        step_timeout: Optional[float] = None,
        route_length_fn: Optional[Callable[[object], float]] = None,
        env_kind: str = "unknown",
    ):
        """agent_factory() -> agent with ``compute_control(state)``;
        env_factory(route) -> env; routes: [{"id", "length_m", ...}].
        ``counters_fn(env)`` extracts infraction counters after an episode
        (defaults to zero counters for envs without criteria).
        ``route_length_fn(env)`` returns the traced road length after reset,
        replacing the straight-line lower bound from the route dict.
        ``env_kind`` stamps every record's meta (e.g. "carla" / "fake") so
        synthetic smoke runs are distinguishable from real evaluations."""
        self.agent_factory = agent_factory
        self.env_factory = env_factory
        self.routes = routes
        self.checkpoint_path = checkpoint_path
        self.max_steps = max_steps_per_route
        self.counters_fn = counters_fn or (lambda env: EpisodeCounters())
        self.step_timeout = step_timeout
        self.route_length_fn = route_length_fn
        self.env_kind = env_kind

    # ------------------------------------------------------------- checkpoint

    def _load(self) -> Dict:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                data = json.load(f)
            if not isinstance(data.get("_checkpoint"), dict) or "records" not in data["_checkpoint"]:
                raise ValueError(
                    f"{self.checkpoint_path} exists but is not an evaluator "
                    "checkpoint (expected a '_checkpoint.records' structure); "
                    "point --checkpoint-json at a fresh path or a previous run's file"
                )
            return data
        return {"_checkpoint": {"records": [], "progress": []}}

    def _save(self, data: Dict) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.checkpoint_path)), exist_ok=True)
        with open(self.checkpoint_path, "w") as f:
            json.dump(data, f, indent=2)

    # -------------------------------------------------------------------- run

    def run(self, resume: bool = True) -> Dict:
        data = self._load() if resume else {"_checkpoint": {"records": [], "progress": []}}
        done_ids = {r["route_id"] for r in data["_checkpoint"]["records"]}

        for index, route in enumerate(self.routes):
            route_id = route.get("id", f"route_{index}")
            if route_id in done_ids:
                continue
            record = self._run_one(route, route_id, index)
            data["_checkpoint"]["records"].append(record)
            data["_checkpoint"]["progress"] = [
                len(data["_checkpoint"]["records"]),
                len(self.routes),
            ]
            self._save(data)

        # publish the leaderboard global record + values/labels/entry_status
        # exactly like the vendored save_global_record/save_entry_status
        from .leaderboard_stats import finalize_checkpoint

        finalize_checkpoint(data, len(self.routes))
        self._save(data)
        return data

    def _run_one(self, route: Dict, route_id: str, index: int) -> Dict:
        status = "Completed"
        crash_message = ""
        steps = 0
        completed_m = 0.0
        counters = EpisodeCounters()
        is_completed = False
        env_timeout = False
        sim_watchdog = agent_watchdog = None
        if self.step_timeout is not None:
            # dual watchdogs like the leaderboard's scenario manager
            # (scenario_manager.py:63-69): the agent one is 1 s tighter so an
            # agent hang is attributed to the agent, not the simulation
            from ..utils.watchdog import Watchdog

            sim_watchdog = Watchdog(timeout=self.step_timeout)
            agent_watchdog = Watchdog(timeout=max(1.0, self.step_timeout - 1.0))
        traced_length_m = None
        agent = None
        try:
            env = self.env_factory(route)
            agent = self.agent_factory()
            state = env.reset()
            if self.route_length_fn is not None:
                # the env traced the real road route on reset — replace the
                # straight-line lower bound so score_route stays <= 1
                traced_length_m = float(self.route_length_fn(env))
            if sim_watchdog is not None:
                # the agent's first plan triggers the jit compile of the full
                # sampling program (30 s - minutes over a compile relay) —
                # warm it before arming the watchdogs, like the leaderboard's
                # separate setup-phase watchdog budget (scenario_manager.py)
                warmup = getattr(agent, "warmup", None)
                if warmup is not None:
                    warmup(state)
                sim_watchdog.start()
                agent_watchdog.start()
            start = np.asarray(state["cur_waypoint"])[0].astype(np.float64)
            pos = start
            while steps < self.max_steps:
                if sim_watchdog is not None:
                    if not agent_watchdog.get_status():
                        status = "Failed - Agent timed out"
                        break
                    if not sim_watchdog.get_status():
                        status = "Failed - Simulation crashed"
                        break
                control = agent.compute_control(state)
                if agent_watchdog is not None:
                    agent_watchdog.update()
                result = env.step({0: control})
                if sim_watchdog is not None:
                    sim_watchdog.update()
                state = result[0]
                done = bool(result[2]) if len(result) > 2 else False
                new_pos = np.asarray(state["cur_waypoint"])[0].astype(np.float64)
                completed_m += float(np.linalg.norm(new_pos - pos))
                pos = new_pos
                steps += 1
                if done:
                    # done != completed: the native env also terminates on
                    # blocked/collision/red-light/timeout (sim/terminal.py);
                    # its episode_stat says which (an infraction-terminated
                    # route must keep its partial score_route, like the
                    # leaderboard's RouteCompletionTest)
                    info = result[3] if len(result) > 3 else None
                    stat = info.get("episode_stat") if isinstance(info, dict) else None
                    if stat is not None:
                        is_completed = bool(stat.get("is_route_completed", 0.0))
                        stat_m = 1000.0 * float(
                            stat.get("route_completed_in_km", completed_m / 1000.0)
                        )
                        # scoring.episode_stats floors completed_km at 0.001;
                        # when the stat sits AT the floor our own odometry is
                        # the honest figure (a zero-progress route must report
                        # 0 m, not 1 m)
                        if not (stat_m <= 1.0 and completed_m < stat_m):
                            completed_m = stat_m
                        env_timeout = bool(stat.get("timeout", 0.0))
                    else:
                        is_completed = True  # simple envs: done == route end
                    break
            counters = self.counters_fn(env)
        except Exception:
            status = "Failed - Agent crashed"
            crash_message = traceback.format_exc(limit=3)
            # the leaderboard still scores criteria events on a crash
            # (leaderboard_evaluator.py -> compute_route_statistics(failure=...))
            try:
                counters = self.counters_fn(env)
            except Exception:
                pass
        finally:
            for wd in (sim_watchdog, agent_watchdog):
                if wd is not None:
                    wd.stop()
            # release per-route agent resources (e.g. the pipelined
            # InteractAgent's worker thread + in-flight plan)
            agent_close = getattr(agent, "close", None)
            if agent_close is not None:
                try:
                    agent_close()
                except Exception:
                    pass

        # leaderboard failure attribution (statistics_manager.py:224-232):
        # any route whose target was not reached is "Failed", with the
        # specific "- <reason>" suffix when a timeout/blocked/deviation named
        # it (reconciled against the vendored StatisticsManager on executed
        # infraction episodes, tests/test_statistics_reconcile.py). Endless
        # tasks are our extension with no route target: a step-capped
        # partial stays "Completed" there (route dict key "endless").
        if status == "Completed" and not is_completed:
            if env_timeout:
                status = "Failed - Agent timed out"
            elif counters.vehicle_blocked:
                status = "Failed - Agent got blocked"
            elif counters.route_dev:
                status = "Failed - Agent deviated from the route"
            elif not route.get("endless", False):
                status = "Failed"

        if traced_length_m is not None:
            length_m = traced_length_m
        else:
            length_m = float(route.get("length_m", max(completed_m, 1.0)))
        stats = episode_stats(
            counters,
            route_length_m=length_m,
            route_completed_m=completed_m,
            is_route_completed=is_completed,
            episode_length=steps,
        )
        # record shape mirrors the leaderboard RouteRecord
        # (statistics_manager.py:33-52) so the vendored consumers parse it
        infractions = {
            "collisions_layout": ["event"] * counters.collisions_layout,
            "collisions_pedestrian": ["event"] * counters.collisions_pedestrian,
            "collisions_vehicle": ["event"] * counters.collisions_vehicle,
            "red_light": ["event"] * counters.red_light,
            "stop_infraction": ["event"] * counters.stop_infraction,
            "vehicle_blocked": ["event"] * counters.vehicle_blocked,
            # the leaderboard's OutsideRouteLanesTest emits ONE terminate-time
            # event carrying the accumulated percentage
            # (atomic_criteria.py:1389-1412)
            "outside_route_lanes": (
                ["event"] if counters.outside_lane_m + counters.wrong_lane_m > 0 else []
            ),
            "route_dev": ["event"] * counters.route_dev,
            # the leaderboard's single terminate-time timeout event
            # (atomic_criteria ActorSpeedAboveThresholdTest / route timeout)
            "route_timeout": ["Route timeout."] if env_timeout else [],
        }
        assert set(INFRACTION_KEYS) <= set(infractions)
        return {
            "route_id": route_id,
            "index": index,
            "status": status,
            "crash_message": crash_message,
            "num_steps": steps,
            "scores": {
                "score_composed": stats["score_composed"] * 100.0,
                "score_route": stats["score_route"] * 100.0,
                "score_penalty": stats["score_penalty"],
            },
            "meta": {"route_length": length_m, "env_kind": self.env_kind},
            "infractions": infractions,
        }
