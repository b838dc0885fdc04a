"""Episode termination logic (reference: ego_vehicle/terminal/valeo_no_det_px.py:21-140).

Pure-state re-design of the roach "valeo" terminal handler: done on
blocked / red-light / collision / (eval) timeout, terminal reward
-1 - speed on infractions, and the exploration-suggestion hints used by RL
training. Lateral-distance and leave-target conditions are computed (with the
reference's hysteresis) but, as in the reference, commented out of ``done``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["ValeoTerminal"]


class ValeoTerminal:
    def __init__(self, exploration_suggest: bool = True, eval_mode: bool = False,
                 eval_time: float = 1200.0):
        self._exploration_suggest = exploration_suggest
        self._eval_mode = eval_mode
        self._eval_time = eval_time
        self._last_lat_dist = 0.0
        self._min_thresh_lat_dist = 3.5
        self._prev_next_waypoint = None
        self._prev_distance = None

    def get(
        self,
        sim_time: float,
        ev_loc,
        ev_speed: float,
        wp_loc,
        wp_yaw: float,
        next_waypoint_loc,
        info_blocked: Optional[dict],
        info_run_red_light: Optional[dict],
        info_collision: Optional[dict],
        info_run_stop_sign: Optional[dict],
        collision_px: bool = False,
    ) -> Tuple[bool, bool, float, Dict]:
        c_blocked = info_blocked is not None

        # lateral distance with growth hysteresis (valeo_no_det_px.py:25-41)
        d_vec = np.asarray(ev_loc, np.float64)[:2] - np.asarray(wp_loc, np.float64)[:2]
        yaw_rad = np.deg2rad(wp_yaw)
        wp_unit_right = np.array([-np.sin(yaw_rad), np.cos(yaw_rad)])
        lat_dist = abs(float(np.dot(wp_unit_right, d_vec)))
        if lat_dist - self._last_lat_dist > 0.8:
            thresh_lat_dist = lat_dist + 0.5
        else:
            thresh_lat_dist = max(self._min_thresh_lat_dist, self._last_lat_dist)
        c_lat_dist = lat_dist > thresh_lat_dist + 1e-2
        self._last_lat_dist = lat_dist

        c_run_rl = info_run_red_light is not None
        c_collision = info_collision is not None
        c_run_stop = (
            info_run_stop_sign is not None and info_run_stop_sign.get("event") == "run"
        )
        c_collision_px = False if self._eval_mode else collision_px

        # leave-target detection (valeo_no_det_px.py:62-82) — tracked, unused in done
        c_leave_target = False
        nwp = np.asarray(next_waypoint_loc, np.float64)[:2]
        d_next = float(np.linalg.norm(nwp - np.asarray(ev_loc, np.float64)[:2]))
        if self._prev_next_waypoint is None:
            self._prev_next_waypoint = nwp
            self._prev_distance = d_next
        else:
            if np.allclose(self._prev_next_waypoint, nwp):
                if d_next > self._prev_distance + 0.1:
                    c_leave_target = True
                    self._prev_next_waypoint = None
                    self._prev_distance = None
                else:
                    self._prev_distance = d_next
            else:
                self._prev_next_waypoint = nwp
                self._prev_distance = d_next

        timeout = self._eval_mode and sim_time > self._eval_time

        # done mask matches the reference exactly (lat_dist/run_stop/leave_target
        # commented out upstream, valeo_no_det_px.py:92-100)
        done = c_blocked or c_run_rl or c_collision or c_collision_px or timeout

        terminal_reward = -1.0 if done else 0.0
        if c_run_rl or c_collision or c_run_stop or c_collision_px:
            terminal_reward -= ev_speed
        if c_leave_target:
            terminal_reward -= d_next

        exploration_suggest = {"n_steps": 0, "suggest": ("", "")}
        if self._exploration_suggest:
            if c_blocked:
                exploration_suggest = {"n_steps": 100, "suggest": ("go", "")}
            if c_lat_dist:
                exploration_suggest = {"n_steps": 100, "suggest": ("go", "turn")}
            if c_run_rl or c_collision or c_run_stop or c_collision_px:
                exploration_suggest = {"n_steps": 100, "suggest": ("stop", "")}

        debug = {
            "c_blocked": c_blocked,
            "c_lat_dist": c_lat_dist,
            "c_run_rl": c_run_rl,
            "c_collision": c_collision,
            "c_run_stop": c_run_stop,
            "c_leave_target": c_leave_target,
            "lat_dist": lat_dist,
            "exploration_suggest": exploration_suggest,
        }
        return done, timeout, terminal_reward, debug
