"""Suite evaluation CLI: closed-loop routes -> _checkpoint JSON -> aggregate."""

import json
import sys

import numpy as np
import pytest

AGENT_OPTS = [
    "MODEL.DIM", "8", "MODEL.PERCEPTION", "tiny", "EVAL.SAMPLE_STEPS", "2",
]


def test_fake_env_smoke(tmp_path):
    from autonomous_driving_with_diffusion_model_tpu.driving.evaluate_cli import main

    ckpt = tmp_path / "ckpt.json"
    data = main([
        "--env-id", "Endless-v0", "--weather-group", "simple", "--fake-env",
        "--checkpoint-json", str(ckpt), "--max-steps", "15",
        "--opts", *AGENT_OPTS,
    ])
    records = data["_checkpoint"]["records"]
    assert len(records) == 1  # simple weather group -> one Endless task
    assert records[0]["status"] in ("Completed",)
    assert records[0]["num_steps"] > 0
    saved = json.loads(ckpt.read_text())
    assert saved["_checkpoint"]["progress"] == [1, 1]


def test_native_env_counts_infractions(tmp_path, monkeypatch):
    import mock_carla

    monkeypatch.setitem(sys.modules, "carla", mock_carla)
    from autonomous_driving_with_diffusion_model_tpu.driving.evaluate_cli import main

    ckpt = tmp_path / "ckpt.json"
    data = main([
        "--env-id", "Endless-v0", "--weather-group", "simple",
        "--checkpoint-json", str(ckpt), "--max-steps", "25",
        "--opts", *AGENT_OPTS,
    ])
    rec = data["_checkpoint"]["records"][0]
    # real counters_fn wired: infraction lists come from the env's counters
    assert set(rec["infractions"]) >= {"red_light", "collisions_vehicle"}
    assert np.isfinite(rec["scores"]["score_composed"])
    assert rec["status"] in ("Completed", "Failed - Agent crashed"), rec["crash_message"]
    assert rec["status"] == "Completed", rec["crash_message"]


def test_resume_skips_finished_routes(tmp_path):
    from autonomous_driving_with_diffusion_model_tpu.driving.evaluate_cli import main

    ckpt = tmp_path / "ckpt.json"
    args = [
        "--env-id", "Endless-v0", "--weather-group", "train_eval", "--fake-env",
        "--checkpoint-json", str(ckpt), "--max-steps", "10",
        "--opts", *AGENT_OPTS,
    ]
    data = main(args)
    assert len(data["_checkpoint"]["records"]) == 2  # train_eval = 2 weathers
    before = json.loads(ckpt.read_text())
    data2 = main(args)  # resume: nothing re-run, records unchanged
    assert [r["route_id"] for r in data2["_checkpoint"]["records"]] == [
        r["route_id"] for r in before["_checkpoint"]["records"]
    ]


def test_console_main_returns_zero(tmp_path):
    """The adm-evaluate console script wraps console_main: main() returns the
    route records (truthy), which a generated sys.exit(main()) would read as
    a failing exit status — console_main must return 0 on success."""
    from autonomous_driving_with_diffusion_model_tpu.driving.evaluate_cli import (
        console_main,
    )

    rc = console_main([
        "--env-id", "Endless-v0", "--weather-group", "simple", "--fake-env",
        "--checkpoint-json", str(tmp_path / "ckpt.json"), "--max-steps", "5",
        "--opts", *AGENT_OPTS,
    ])
    assert rc == 0


def test_build_routes_endless_default_mirrors_env():
    """A task without the 'endless' key is endless exactly when it has no
    ego_route — the same default CarlaDrivingEnv applies — so a step-capped
    partial on such a task is not mis-scored 'Failed'."""
    from types import SimpleNamespace

    from autonomous_driving_with_diffusion_model_tpu.driving.evaluate_cli import (
        build_routes,
    )

    pts = [SimpleNamespace(x=0.0, y=0.0), SimpleNamespace(x=3.0, y=4.0)]
    tasks = [
        {"route_id": 0, "weather": "ClearNoon"},                      # no key, no route
        {"route_id": 1, "weather": "ClearNoon", "ego_route": pts},    # no key, has route
        {"route_id": 2, "weather": "ClearNoon", "endless": True, "ego_route": pts},
        {"route_id": 3, "weather": "ClearNoon", "endless": False},
    ]
    routes = build_routes("Endless-v0", tasks)
    assert [r["endless"] for r in routes] == [True, False, True, False]
    assert routes[1]["length_m"] == pytest.approx(5.0)
