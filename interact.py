"""Interactive closed-loop driving CLI (reference: interact.py:324-334).

Usage:
    python interact.py --config configs/guidance/free_guidance.yaml \
        [--opts EVAL.CHECKPOINT final.pth ...] [--save-bev-path out/] \
        [--fake-env --max-steps 100]

With a CARLA installation (``carla`` package importable + ``CARLA_SH_PATH``
pointing at CarlaUE4.sh) this starts the server and drives the live env; the
``--fake-env`` flag runs the identical agent stack against the synthetic
kinematics env for smoke/demo runs on any machine.
"""

import argparse


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--save-bev-path", default=None, type=str)
    parser.add_argument(
        "--plot-on-world", default=False, action="store_true",
        help="draw planned waypoints into the live simulator "
             "(reference interact.py:305-312)",
    )
    parser.add_argument(
        "--pipelined", default=False, action="store_true",
        help="act on the previous frame's plan while the TPU computes this "
             "frame's (hides plan latency; one frame of staleness)",
    )
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--fake-env", default=False, action="store_true")
    parser.add_argument(
        "--env-factory", default="carla_native",
        help="registered env factory or suite id (carla_native, carla_roach, "
             "NoCrash-v0..3, CoRL2017-v0..3, LeaderBoard-v0, Endless-v0)",
    )
    parser.add_argument("--town", default=None, type=str)
    parser.add_argument("--max-steps", default=None, type=int)
    parser.add_argument("--opts", nargs=argparse.REMAINDER, default=None, type=str)
    return parser.parse_args()


def main():
    args = parse_args()

    from autonomous_driving_with_diffusion_model_tpu.utils.platform import (
        apply_adm_platform,
    )

    apply_adm_platform()

    from autonomous_driving_with_diffusion_model_tpu.driving import (
        DiffusionPlanner,
        InteractAgent,
    )
    from autonomous_driving_with_diffusion_model_tpu.utils import (
        create_cfg,
        merge_possible_with_base,
        show_config,
    )

    cfg = create_cfg()
    if args.config is not None:
        merge_possible_with_base(cfg, args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    show_config(cfg)

    if args.fake_env:
        from autonomous_driving_with_diffusion_model_tpu.driving import FakeDrivingEnv

        env = FakeDrivingEnv(
            image_hw=(cfg.TRAIN.IMAGE_HEIGHT, cfg.TRAIN.IMAGE_WIDTH),
            seed=args.seed or 0,
        )
        server = None
    else:
        try:
            import carla  # noqa: F401
        except ImportError as exc:
            raise SystemExit(
                "No `carla` package available. Install the CARLA client wheel and "
                "set CARLA_SH_PATH, or run with --fake-env for a simulator-free demo."
            ) from exc
        from autonomous_driving_with_diffusion_model_tpu.sim import create_env, create_server

        env_config = {"factory": args.env_factory, "port": 2000, "town": args.town}
        server = create_server(env_config, off_screen=False)
        env = create_env(env_config, seed=args.seed or 0)

    planner = DiffusionPlanner(cfg, seed=args.seed or 0)
    agent = InteractAgent(
        cfg, env, planner=planner, bev_save_path=args.save_bev_path,
        plot_on_world=args.plot_on_world, pipelined=args.pipelined,
    )
    try:
        steps = agent.run(max_steps=args.max_steps)
    finally:
        # join the pipelined worker, drop any in-flight plan
        close = getattr(agent, "close", None)
        if close is not None:
            close()
    print(f"Closed loop finished after {steps} steps")
    if server is not None:
        server.stop()


if __name__ == "__main__":
    main()
