"""Progressive distillation CLI: few-step planners from a trained checkpoint.

Halves the DDIM grid stage by stage (diffusion/distill.py; Salimans & Ho
2022), starting from a trained teacher checkpoint, and writes one
reference-format ``.pth`` student per stage plus ``distill.json`` recording
each stage's sampling grid. Evaluate / deploy a stage through the standard
planner by setting its recorded grid:

    python distill.py --checkpoint run/checkpoints/final.pth \
        --workdir /tmp/distill --start-steps 50 --stages 6 \
        --opts TRAIN.ROOT <dataset> ...

    # then e.g. the 4-step student:
    ... --opts EVAL.CHECKPOINT /tmp/distill/student_4.pth \
        TPU.SAMPLE_TIMESTEPS "[98, 66, 34, 2]"

No reference analogue (the reference samples 100/10/2 steps eagerly); this
is the "fewer sampler steps" latency lever docs/DESIGN.md identifies, made
trainable. The measured end-to-end proof lives in ``learnability.py
--distill`` (DISTILL.json).
"""

import argparse
import json
import os
import os.path as osp
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", required=True, help="teacher .pth or Orbax dir")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--start-steps", type=int, default=None,
                    help="teacher grid size (default: cfg.EVAL.SAMPLE_STEPS)")
    ap.add_argument("--stages", type=int, default=6,
                    help="halvings to run (stops automatically at 1 step)")
    ap.add_argument(
        "--iters", type=int, default=300,
        help="train iters per stage; the measured quality proof needed 800 "
             "on the 120-sample learnability set (400 left the 1-step "
             "student's closed-loop lateral out of bound — see DISTILL.json)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--snr-weight", action="store_true",
                    help="truncated-SNR loss weight max(a_t/(1-a_t), 1)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    args = ap.parse_args()

    from autonomous_driving_with_diffusion_model_tpu.utils.platform import (
        apply_adm_platform,
    )

    apply_adm_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autonomous_driving_with_diffusion_model_tpu.data import (
        get_loader,
        normalize_images,
    )
    from autonomous_driving_with_diffusion_model_tpu.data.dataset import (
        maybe_device_resident,
    )
    from autonomous_driving_with_diffusion_model_tpu.diffusion import (
        StepConfig,
        grid_chain,
        make_distill_step,
        make_schedule_from_cfg,
    )
    from autonomous_driving_with_diffusion_model_tpu.models import build_model
    from autonomous_driving_with_diffusion_model_tpu.train import (
        create_train_state,
        export_torch_checkpoint,
        load_eval_variables,
    )
    from autonomous_driving_with_diffusion_model_tpu.train.ema import EmaState
    from autonomous_driving_with_diffusion_model_tpu.utils import (
        create_cfg,
        merge_possible_with_base,
    )
    from autonomous_driving_with_diffusion_model_tpu.utils.constants import GuidanceType

    cfg = create_cfg()
    if args.config is not None:
        merge_possible_with_base(cfg, args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    os.makedirs(args.workdir, exist_ok=True)

    model = build_model(cfg)
    schedule = make_schedule_from_cfg(cfg)
    use_cond = GuidanceType[cfg.TRAIN.USE_COND]

    # ---- teacher variables (EMA-overwrite eval semantics, like the planner)
    teacher = load_eval_variables(model, cfg, str(args.checkpoint))
    batch_stats = teacher.get("batch_stats", {})

    # ---- data (no augmentation: the student regresses the teacher's map on
    # clean frames; normalization fused on device like the planner)
    loader = get_loader(cfg, train=True, seed=args.seed, shard_index=0, shard_count=1)
    loader = maybe_device_resident(loader, cfg)
    normalize = jax.jit(normalize_images)

    start_steps = args.start_steps or int(cfg.EVAL.SAMPLE_STEPS)
    grids = grid_chain(schedule.num_train_timesteps, start_steps, args.stages)
    print(
        f"[distill] teacher @ {start_steps} steps -> stages "
        f"{[len(g.ts) for g in grids]}",
        flush=True,
    )

    manifest = {
        "teacher_checkpoint": str(args.checkpoint),
        "start_steps": start_steps,
        "iters_per_stage": args.iters,
        "lr": args.lr,
        "snr_weight": bool(args.snr_weight),
        "use_cond": cfg.TRAIN.USE_COND,
        "free_scale": float(cfg.GUIDANCE.FREE_SCALE),
        "stages": [],
    }
    data_iter = iter(loader)

    def next_batch():
        nonlocal data_iter
        try:
            return next(data_iter)
        except StopIteration:
            data_iter = iter(loader)
            return next(data_iter)

    for g in grids:
        n_steps = len(g.ts)
        t0 = time.time()
        init_state, step = make_distill_step(
            model,
            schedule,
            g,
            use_cond=use_cond,
            free_scale=float(cfg.GUIDANCE.FREE_SCALE),
            # the config's prediction type, NOT a hardcoded default: an
            # epsilon-trained teacher must hit the x0-only guard, not be
            # silently distilled with sample-prediction math
            step_cfg=StepConfig(
                prediction_type=cfg.TRAIN.NOISE_SCHEDULER.PRED_TYPE,
                clip_sample=True,
            ),
            lr=args.lr,
            warmup=args.warmup,
            snr_weight=args.snr_weight,
            # cosine-decay the LR to zero over the stage and deploy the
            # student's EMA: end-of-stage raw params carry AdamW's terminal
            # noise (r4 postmortem — a steer-channel bias that blew up the
            # closed loop; see make_distill_step docstring)
            decay_steps=args.iters,
        )
        jit_step = jax.jit(step, donate_argnums=(0,))
        state = init_state(teacher["params"])
        root = jax.random.PRNGKey(args.seed)
        metrics = None
        for it in range(args.iters):
            batch = next_batch()
            device_batch = {
                "image": normalize(jnp.asarray(batch["image"])),
                "trajs": jnp.asarray(batch["trajs"]),
                "target": jnp.asarray(batch["target"]),
            }
            state, metrics = jit_step(
                state, teacher, batch_stats, device_batch, jax.random.fold_in(root, it)
            )
            if (it + 1) % max(1, args.iters // 5) == 0:
                print(
                    f"[distill] {n_steps}-step stage iter {it + 1}/{args.iters} "
                    f"loss {float(metrics['loss']):.5f}",
                    flush=True,
                )
        # the manifest's final_loss is the LAST iteration's, not the last
        # logged one (log interval need not divide --iters)
        loss = float(metrics["loss"]) if metrics is not None else float("nan")

        # student -> reference-format .pth. The DEPLOYED weights are the
        # student's EMA (state.ema.shadow_params, see make_distill_step):
        # they fill both the state_dict params and the EMA shadow slot, so
        # the planner's EMA-overwrite load gets the averaged weights.
        student_params = state.ema.shadow_params
        export_state = create_train_state(model, {"params": student_params,
                                                  "batch_stats": batch_stats}, cfg)
        # keep create_train_state's FRESH optimizer moments: the stage's
        # Adam moments describe the raw-iterate trajectory, not the deployed
        # EMA weights — a fine-tune resumed from a student .pth must warm
        # its preconditioner from scratch rather than inherit a mismatch
        export_state = export_state._replace(
            params=student_params,
            ema=EmaState(
                shadow_params=student_params,
                optimization_step=jnp.asarray(int(state.step), jnp.int32),
            ),
            step=jnp.asarray(int(state.step), jnp.int32),
        )
        if cfg.MODEL.PERCEPTION == "resnet34":
            out_path = osp.join(args.workdir, f"student_{n_steps}.pth")
            export_torch_checkpoint(export_state, cfg, out_path, base_lr=args.lr)
        else:  # torch layout only exists for the reference encoder
            from autonomous_driving_with_diffusion_model_tpu.train import save_orbax

            out_path = osp.join(args.workdir, f"student_{n_steps}_orbax")
            save_orbax(out_path, export_state)
        stage_info = {
            "num_steps": n_steps,
            "timesteps": [int(t) for t in g.ts],
            "checkpoint": out_path,
            "final_loss": loss,
            "seconds": round(time.time() - t0, 1),
        }
        manifest["stages"].append(stage_info)
        print(f"[distill] stage done: {stage_info}", flush=True)
        # the next stage distills from the DEPLOYED (EMA) student
        teacher = {"params": student_params, "batch_stats": batch_stats}

    with open(osp.join(args.workdir, "distill.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"[distill] manifest: {osp.join(args.workdir, 'distill.json')}", flush=True)
    # CFG students have the guidance scale BAKED IN (diffusion/distill.py):
    # deploy them at FREE_SCALE 1.0, where the sampler statically skips the
    # uncond pass — one forward per step
    baked = (
        " GUIDANCE.FREE_SCALE 1.0" if use_cond == GuidanceType.FREE_GUIDANCE else ""
    )
    for s in manifest["stages"]:
        print(
            f"[distill] deploy {s['num_steps']}-step: --opts EVAL.CHECKPOINT "
            f"{s['checkpoint']} TPU.SAMPLE_TIMESTEPS \"{s['timesteps']}\"{baked}",
            flush=True,
        )


if __name__ == "__main__":
    main()
