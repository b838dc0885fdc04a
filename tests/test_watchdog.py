"""Watchdog semantics (reference srunner watchdog behavior)."""

import time

from autonomous_driving_with_diffusion_model_tpu.utils.watchdog import Watchdog


def test_watchdog_stays_healthy_with_updates():
    w = Watchdog(timeout=0.2)
    w.start()
    for _ in range(5):
        time.sleep(0.05)
        w.update()
    assert w.get_status()
    w.stop()
    assert w.get_status()


def test_watchdog_fires_on_hang():
    fired = []
    w = Watchdog(timeout=0.05, on_timeout=lambda: fired.append(1))
    w._timeout = 0.1  # drop the 1 s slack for test speed
    w.start()
    time.sleep(0.4)  # no updates: hang
    assert not w.get_status()
    assert fired == [1]
    # stop after failure keeps failed status
    w.stop()
    assert not w.get_status()


def test_evaluator_dual_watchdogs_attribute_agent_hang(tmp_path):
    """A hanging agent trips the (tighter) agent watchdog, not the sim one
    (reference scenario_manager.py:63-69 dual-watchdog attribution)."""
    import time

    import numpy as np

    from autonomous_driving_with_diffusion_model_tpu.driving.evaluator import RouteEvaluator
    from autonomous_driving_with_diffusion_model_tpu.driving.fake_env import FakeDrivingEnv

    class HangingAgent:
        def __init__(self):
            self.calls = 0

        def compute_control(self, state):
            self.calls += 1
            if self.calls > 2:
                time.sleep(10.0)  # exceed the watchdog
            return np.array([0.3, 0.0, 0.0])

    ev = RouteEvaluator(
        agent_factory=HangingAgent,
        env_factory=lambda route: FakeDrivingEnv(seed=0),
        routes=[{"id": "r0", "length_m": 50.0}],
        checkpoint_path=str(tmp_path / "ck.json"),
        max_steps_per_route=50,
        step_timeout=2.0,
    )
    rec = ev.run(resume=False)["_checkpoint"]["records"][0]
    assert rec["status"] == "Failed - Agent timed out"
    assert rec["num_steps"] < 50
