"""Terminal variants (leaderboard / dagger / valeo-stuck), expert noiser,
stop-sign obs flag (reference: ego_vehicle/terminal/*.py, utils/expert_noiser.py,
obs_manager/object_finder/stop_sign.py)."""

import numpy as np

from autonomous_driving_with_diffusion_model_tpu.sim import (
    ExpertNoiser,
    LeaderboardDaggerTerminal,
    LeaderboardTerminal,
    ValeoStuckTerminal,
)
from autonomous_driving_with_diffusion_model_tpu.sim.obs import stop_sign_obs


def test_leaderboard_terminal():
    term = LeaderboardTerminal(max_time=100.0)
    done, timeout, r, _ = term.get(10.0, False, None, None)
    assert not done and r == 0.0
    done, *_ = term.get(10.0, True, None, None)
    assert done  # route completed
    done, *_ = term.get(10.0, False, {"step": 1}, None)
    assert done  # blocked
    done, timeout, *_ = term.get(101.0, False, None, None)
    assert done and timeout


def test_leaderboard_dagger_terminal_gating():
    term = LeaderboardDaggerTerminal(no_collision=False)
    done, *_ = term.get(1.0, None, None, {"step": 1}, None, None)
    assert not done  # collision done gated off
    term2 = LeaderboardDaggerTerminal()
    done, _, r, debug = term2.get(1.0, None, None, {"step": 1}, None, None)
    assert done and r == 0.0 and debug["traffic_rule_violated"]
    # stop-sign "encounter" events never terminate, "run" does
    done, *_ = term2.get(1.0, None, None, None, None, {"event": "encounter"})
    assert not done
    done, *_ = term2.get(1.0, None, None, None, None, {"event": "run"})
    assert done


def test_valeo_stuck_terminal_counts_free_road_only():
    term = ValeoStuckTerminal(stuck_steps=5)
    args = dict(ev_loc=(0.0, 0.0), ev_speed=0.0, wp_loc=(0.0, 0.0), wp_yaw=0.0,
                info_blocked=None, info_run_red_light=None, info_collision=None,
                info_run_stop_sign=None)
    # blocked road (hazard ahead): stuck counter must NOT advance
    for i in range(8):
        done, *_ = term.get(sim_time=float(i), is_free_road=False, **args)
    assert not done
    # free road at zero speed: counts up to the stuck threshold
    for i in range(5):
        done, timeout, r, debug = term.get(sim_time=10.0 + i, is_free_road=True, **args)
    assert done and r == -1.0
    assert debug["exploration_suggest"]["suggest"] == ("go", "")


def test_valeo_stuck_terminal_infractions():
    term = ValeoStuckTerminal()
    done, _, r, _ = term.get(
        sim_time=1.0, ev_loc=(0, 0), ev_speed=4.0, wp_loc=(0, 0), wp_yaw=0.0,
        is_free_road=True, info_blocked=None,
        info_run_red_light={"id": 7}, info_collision=None, info_run_stop_sign=None,
    )
    assert done and r == -5.0  # -1 - speed


def test_expert_noiser_triangular_episode():
    noiser = ExpertNoiser("Spike", frequency=60.0, intensity=10.0,
                          rng=np.random.default_rng(0))
    clean = np.array([0.5, 0.0, 0.0])
    steers, actives = [], []
    for step in range(200):
        noisy, active = noiser.compute_noise(clean, speed=5.0, sim_time=step * 0.1)
        steers.append(noisy[1])
        actives.append(active)
        assert 0.0 <= noisy[0] <= 1.0 and -1.0 <= noisy[1] <= 1.0
    assert any(actives), "frequency=60/min must trigger an episode"
    peak = np.max(np.abs(steers))
    assert 0.0 < peak  # steering actually perturbed
    # triangular: comes back to (near) zero after the episode
    assert abs(steers[-1]) < peak or not actives[-1]
    # clean control object untouched (copy semantics)
    assert clean[1] == 0.0


def test_expert_noiser_none_and_throttle():
    none = ExpertNoiser("None")
    out, active = none.compute_noise(np.array([0.3, 0.1, 0.0]), 3.0, 0.0)
    assert not active and out[1] == 0.1

    thr = ExpertNoiser("Throttle", frequency=60.0, rng=np.random.default_rng(1))
    changed = False
    clean = np.array([0.3, 0.0, 0.0])
    for step in range(100):
        noisy, active = thr.compute_noise(clean, 3.0, step * 0.1)
        if active and (noisy[0] != 0.3 or noisy[2] != 0.0):
            changed = True
        assert noisy[1] == 0.0  # throttle mode never touches steer
    assert changed


def test_stop_sign_obs_flag():
    assert stop_sign_obs((0, 0), None, False)["at_stop_sign"] == 0
    assert stop_sign_obs((0, 0), (2.0, 0.0), False)["at_stop_sign"] == 1
    assert stop_sign_obs((0, 0), (2.0, 0.0), True)["at_stop_sign"] == 0  # already stopped
    assert stop_sign_obs((0, 0), (9.0, 0.0), False)["at_stop_sign"] == 0  # too far
