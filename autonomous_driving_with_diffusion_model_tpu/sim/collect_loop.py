"""Crash-restart collection supervisor (reference: misc/collect_loop.py:7-44).

Re-launches the collector subprocess until the sample quota is met, resuming
from the on-disk counts.
"""

from __future__ import annotations

import argparse
import subprocess
import sys

from .collector import count_current_saved

__all__ = ["collect_loop"]


def collect_loop(num_to_collect: int, output_dir: str, extra_args=()):
    cur_num = count_current_saved(output_dir)
    while cur_num < num_to_collect:
        process = subprocess.Popen(
            [
                sys.executable,
                "-m",
                "autonomous_driving_with_diffusion_model_tpu.sim.collect_cli",
                "--save-path",
                output_dir,
                "--save-num",
                str(num_to_collect),
                "--off-screen",
                *extra_args,
            ]
        )
        process.wait()
        cur_num = count_current_saved(output_dir)
        print(f"Current collected: {cur_num}/{num_to_collect}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save-num", type=int, required=True)
    parser.add_argument("--save-path", type=str, required=True)
    args = parser.parse_args()
    collect_loop(args.save_num, args.save_path)
