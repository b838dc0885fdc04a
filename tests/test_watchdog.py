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
