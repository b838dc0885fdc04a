"""Dataset validation CLI (data/validate.py) over a synthetic mini-dataset."""

import os
import subprocess
import sys

import numpy as np

from autonomous_driving_with_diffusion_model_tpu.data.validate import (
    format_report,
    validate_dataset,
)


def _write_sample(root, idx, rows=None, target=(0.1, -0.2), corrupt=False,
                  skip_waypoints=False):
    import cv2

    rng = np.random.default_rng(idx)
    os.makedirs(os.path.join(root, "front"), exist_ok=True)
    os.makedirs(os.path.join(root, "waypoints"), exist_ok=True)
    png = os.path.join(root, "front", f"{idx:06d}.png")
    if corrupt:
        with open(png, "wb") as f:
            f.write(b"not a png at all")
    else:
        cv2.imwrite(png, rng.integers(0, 255, (16, 24, 3), np.uint8))
    if skip_waypoints:
        return
    if rows is None:
        rows = rng.uniform(-0.9, 0.9, (16, 7))
    lines = [" ".join(f"{v:.6f}" for v in target)]
    lines += [" ".join(f"{v:.6f}" for v in r) for r in rows]
    with open(os.path.join(root, "waypoints", f"{idx:06d}.txt"), "w") as f:
        f.write("\n".join(lines))


def test_validate_clean_dataset(tmp_path):
    root = str(tmp_path)
    red_row = np.tile([0.3, -0.1, 0.0, 0.0, 0.0, 0.0, 1.0], (16, 1))
    for i in range(4):
        _write_sample(root, i)
    _write_sample(root, 4, rows=red_row)  # red-light synthesis sample
    clipped = np.full((16, 7), 1.5)
    _write_sample(root, 5, rows=clipped)  # out-of-range rows (pre-clip)

    report = validate_dataset(root)
    assert report["ok"]
    assert report["num_valid_samples"] == 6
    assert report["red_light_fraction"] == round(1 / 6, 4)
    assert report["clipped_row_rate"] == round(16 / (6 * 16), 4)
    assert report["target_stats"]["mean"] == [0.1, -0.2]
    text = format_report(report)
    assert "status: OK" in text


def test_validate_flags_problems(tmp_path):
    root = str(tmp_path)
    _write_sample(root, 0)
    _write_sample(root, 1, corrupt=True)
    _write_sample(root, 2, skip_waypoints=True)
    bad = np.zeros((7, 7))  # wrong row count
    _write_sample(root, 3, rows=bad)

    report = validate_dataset(root)
    assert not report["ok"]
    assert report["corrupt_images"] == ["000001.png"]
    assert report["missing_waypoints"] == ["000002"]
    assert report["bad_schema"] == ["000003.txt"]
    assert report["num_valid_samples"] == 2  # 0 and 1 parse fine


def test_validate_cli_entrypoint(tmp_path):
    root = str(tmp_path)
    for i in range(2):
        _write_sample(root, i)
    out = subprocess.run(
        [sys.executable, "-m",
         "autonomous_driving_with_diffusion_model_tpu.data.validate",
         "--root", root, "--json"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    import json

    report = json.loads(out.stdout)
    assert report["ok"] and report["num_valid_samples"] == 2
