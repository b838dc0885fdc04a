"""Training CLI (reference: train.py:106-333).

Usage mirrors the reference:
    python train.py --config configs/default.yaml [--generate-only]
        [--opts TRAIN.BATCH_SIZE 64 ...]

TPU-native execution: one jitted SPMD step over a data-parallel mesh (XLA
gradient all-reduce replaces accelerate/NCCL DDP), on-device augmentation +
normalization fused ahead of the model, Orbax checkpoints plus
reference-compatible ``.pth`` export at every save interval.
"""

import argparse
import datetime
import json
import logging
import os
import os.path as osp
import random
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--generate-only", default=False, action="store_true")
    parser.add_argument("--max-iter", default=None, type=int, help="override TRAIN.MAX_ITER")
    parser.add_argument(
        "--profile-dir", default=None, type=str,
        help="capture a jax.profiler trace of iterations 10-15 into this dir",
    )
    parser.add_argument("--opts", nargs=argparse.REMAINDER, default=None, type=str)
    return parser.parse_args(argv)


def evaluate(cfg, model, variables, schedule, filename=None, rng_seed=None):
    """Sample EVAL.BATCH_SIZE trajectories for a random dataset image and paint
    them on the paired BEV png (reference: train.py:53-103). Unconditional even
    for guided models (SURVEY Appendix C.12)."""
    import glob

    import cv2
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from autonomous_driving_with_diffusion_model_tpu.data import normalize_images
    from autonomous_driving_with_diffusion_model_tpu.diffusion import sampler_from_cfg
    from autonomous_driving_with_diffusion_model_tpu.driving import way_point_to_pixel
    from autonomous_driving_with_diffusion_model_tpu.utils.constants import COLOR_LIST

    num_traj = cfg.EVAL.BATCH_SIZE
    seed = rng_seed if rng_seed is not None else random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)
    trajs = jax.random.normal(
        key, (num_traj, cfg.MODEL.HORIZON, cfg.MODEL.TRANSITION_DIM), jnp.float32
    )

    front_images = sorted(glob.glob(osp.join(cfg.TRAIN.ROOT, "front", "*.png")))
    # image choice follows rng_seed too, so a fixed seed is fully deterministic
    front_image_name = random.Random(seed).choice(front_images)
    img = cv2.cvtColor(cv2.imread(front_image_name), cv2.COLOR_BGR2RGB)
    image = jnp.tile(normalize_images(jnp.asarray(img))[None], (num_traj, 1, 1, 1))

    sample = jax.jit(sampler_from_cfg(model, schedule, cfg, for_training_eval=True))
    out = np.asarray(
        sample(variables, trajs, image=image, rng=jax.random.fold_in(key, 1))
    )
    out = np.clip(out[..., :2], -1.0, 1.0)

    bev_image = np.array(Image.open(front_image_name.replace("front", "bev")).convert("RGB"))
    for color_idx, traj in enumerate(out):
        for x, y in traj:
            color = COLOR_LIST[color_idx % len(COLOR_LIST)]
            bev_image = cv2.circle(
                bev_image, (way_point_to_pixel(x), way_point_to_pixel(y)), 3, color, -1
            )
    if filename is not None:
        Image.fromarray(bev_image).save(filename)
        logging.info("Save generated samples to %s...", filename)
        return None
    return Image.fromarray(bev_image)


def main(args):
    from autonomous_driving_with_diffusion_model_tpu.utils.platform import (
        apply_adm_platform,
    )

    apply_adm_platform()
    import jax
    import jax.numpy as jnp

    from autonomous_driving_with_diffusion_model_tpu.data import (
        augment_batch,
        get_loader,
        normalize_images,
    )
    from autonomous_driving_with_diffusion_model_tpu.diffusion import make_schedule_from_cfg
    from autonomous_driving_with_diffusion_model_tpu.models import build_model
    from autonomous_driving_with_diffusion_model_tpu.parallel import (
        initialize_distributed,
        is_main_process,
        make_mesh,
        replicate_global,
        shard_global_batch,
    )

    # multi-host launch: every host runs this same script with
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set (the
    # accelerate-launch equivalent, reference README.md:83-88); each host
    # loads its own dataset shard and feeds TRAIN.BATCH_SIZE samples, so the
    # global batch is N_hosts x BATCH_SIZE (like per-GPU batch under DDP)
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("JAX_NUM_PROCESSES"):
        initialize_distributed()
    from autonomous_driving_with_diffusion_model_tpu.train import (
        create_train_state,
        export_torch_checkpoint,
        import_torch_checkpoint,
        make_train_step,
        save_orbax,
        wait_for_checkpoints,
    )
    from autonomous_driving_with_diffusion_model_tpu.utils import (
        AverageMeter,
        MetricMeter,
        create_cfg,
        merge_possible_with_base,
        show_config,
    )
    from autonomous_driving_with_diffusion_model_tpu.utils.constants import GuidanceType

    cfg = create_cfg()
    if args.config is not None:
        merge_possible_with_base(cfg, args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.max_iter is not None:
        cfg.TRAIN.MAX_ITER = args.max_iter

    if is_main_process():
        show_config(cfg)
        os.makedirs(osp.join(cfg.PROJECT_DIR, "checkpoints"), exist_ok=True)
        os.makedirs(osp.join(cfg.PROJECT_DIR, "generate"), exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(osp.join(cfg.PROJECT_DIR, "train.log")),
        ],
    )

    mesh = make_mesh(cfg.TPU.DATA_PARALLEL)
    model = build_model(cfg)
    schedule = make_schedule_from_cfg(cfg)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 16, cfg.MODEL.TRANSITION_DIM)), jnp.float32)
    img0 = jnp.asarray(
        rng.standard_normal((1, cfg.TRAIN.IMAGE_HEIGHT, cfg.TRAIN.IMAGE_WIDTH, 3)), jnp.float32
    )
    variables = jax.jit(lambda k: model.init(k, x0, img=img0, time=jnp.asarray([1.0])))(
        jax.random.PRNGKey(0)
    )
    if cfg.TRAIN.PRETRAINED_BACKBONE:
        # training-recipe parity: the reference ALWAYS starts from the
        # torchvision ImageNet resnet34 (modeling/temporal.py:83,
        # modeling/resnet.py:299-311 — downloaded there; a file here, since
        # this environment has no network egress)
        from autonomous_driving_with_diffusion_model_tpu.models.torch_convert import (
            load_torchvision_backbone,
        )

        logging.info(
            "Initializing perception from ImageNet backbone %s...",
            cfg.TRAIN.PRETRAINED_BACKBONE,
        )
        variables = load_torchvision_backbone(cfg.TRAIN.PRETRAINED_BACKBONE, variables)
    state = create_train_state(model, variables, cfg)

    if cfg.TRAIN.RESUME is not None:
        assert osp.exists(cfg.TRAIN.RESUME), "Resume file not found"
        logging.info("Resume checkpoint from %s...", cfg.TRAIN.RESUME)
        if osp.isdir(cfg.TRAIN.RESUME):
            # native Orbax format (the directories save_orbax writes every
            # SAVE_INTERVAL); .pth stays supported for torch checkpoints
            from autonomous_driving_with_diffusion_model_tpu.train.checkpoint import (
                restore_orbax,
            )

            state = restore_orbax(cfg.TRAIN.RESUME, state)
        else:
            state = import_torch_checkpoint(cfg.TRAIN.RESUME, cfg, state)

    if args.generate_only:
        ema_vars = {"params": state.ema.shadow_params, "batch_stats": state.batch_stats}
        evaluate(cfg, model, ema_vars, schedule, filename="test.png")
        return

    state = replicate_global(state, mesh)
    train_step = jax.jit(make_train_step(model, schedule, cfg), donate_argnums=(0,))
    # explicit shard topology: the backend is up by now, and on TPU pods the
    # runtime is multi-process even without jax.distributed.initialize — the
    # loader must shard whenever shard_global_batch will treat batches as
    # per-host shards, or every host would feed duplicated data
    loader = get_loader(
        cfg, train=True,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
    )
    from autonomous_driving_with_diffusion_model_tpu.data.dataset import (
        DeviceResidentLoader,
        maybe_device_resident,
    )

    loader = maybe_device_resident(loader, cfg)
    if isinstance(loader, DeviceResidentLoader):
        logging.info(
            "Device-resident dataset: %d samples, %.1f MB uploaded once",
            len(loader.dataset), loader.nbytes() / 1e6,
        )
    use_augment = cfg.TRAIN.USE_IMG_AUGMENTOR
    augment = jax.jit(augment_batch) if use_augment else None

    from autonomous_driving_with_diffusion_model_tpu.utils.tracker import Tracker

    tracker = Tracker(cfg.PROJECT_DIR, cfg.PROJECT_NAME, enabled=is_main_process())
    loss_meter = MetricMeter()
    iter_time = AverageMeter()
    max_iter = cfg.TRAIN.MAX_ITER
    cur_iter = int(state.step)
    data_iter = iter(loader)
    image_iteration = cur_iter * cfg.TRAIN.BATCH_SIZE
    start = time.time()

    # one root key with per-purpose fold_in tags: the augmentation draws and
    # the train-step timestep/noise draws must come from disjoint streams
    # (passing the same PRNGKey(cur_iter) to both correlates them — identical
    # split trees). Still resume-deterministic: only a function of cur_iter.
    root_key = jax.random.PRNGKey(0)
    AUG_TAG, STEP_TAG = 1, 2

    def iter_keys(it):
        k = jax.random.fold_in(root_key, it)
        return jax.random.fold_in(k, AUG_TAG), jax.random.fold_in(k, STEP_TAG)

    profiling = False
    while cur_iter < max_iter:
        # profile a steady-state window (skip compile/warmup iterations)
        if args.profile_dir and cur_iter == 10 and not profiling:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        if profiling and cur_iter == 15:
            jax.profiler.stop_trace()
            profiling = False
            logging.info("Saved profiler trace to %s", args.profile_dir)
        try:
            batch = next(data_iter)
        except StopIteration:
            data_iter = iter(loader)
            batch = next(data_iter)

        aug_key, step_key = iter_keys(cur_iter)
        images = jnp.asarray(batch["image"])
        if use_augment:
            images = augment(images, aug_key, jnp.asarray(float(image_iteration)))
            images = images / 255.0
            from autonomous_driving_with_diffusion_model_tpu.data.augment import (
                IMAGENET_MEAN,
                IMAGENET_STD,
            )

            images = (images - IMAGENET_MEAN) / IMAGENET_STD
        else:
            images = normalize_images(images)
        device_batch = shard_global_batch(
            {
                "image": images,
                "trajs": jnp.asarray(batch["trajs"]),
                "target": jnp.asarray(batch["target"]),
            },
            mesh,
        )
        state, metrics = train_step(state, device_batch, step_key)
        image_iteration += cfg.TRAIN.BATCH_SIZE
        cur_iter += 1

        if cur_iter % cfg.TRAIN.LOG_INTERVAL == 0 and is_main_process():
            jax.block_until_ready(metrics["loss"])
            iter_time.update((time.time() - start) / cfg.TRAIN.LOG_INTERVAL)
            loss_meter.update({"loss": float(metrics["loss"])})
            eta = str(datetime.timedelta(seconds=int(iter_time.avg * (max_iter - cur_iter))))
            logging.info(
                "iter: [%d/%d]\ttime: %.3f (%.3f)\teta: %s\tlr: %.2e\t%s",
                cur_iter,
                max_iter,
                iter_time.val,
                iter_time.avg,
                eta,
                float(metrics["lr"]),
                loss_meter,
            )
            tracker.log(loss_meter.get_log_dict() | {"lr": float(metrics["lr"])}, step=cur_iter)
            start = time.time()

        if (cur_iter % cfg.TRAIN.SAVE_INTERVAL == 0 or cur_iter == max_iter) and is_main_process():
            save_name = f"checkpoint_{cur_iter}.pth" if cur_iter != max_iter else "final.pth"
            host_state = jax.tree.map(np.asarray, state)
            if cfg.MODEL.PERCEPTION == "resnet34":
                # reference-compatible .pth (other encoders have no torch layout)
                export_torch_checkpoint(
                    host_state, cfg, osp.join(cfg.PROJECT_DIR, "checkpoints", save_name)
                )
            # async: serialization overlaps the next train iterations
            save_orbax(
                osp.join(cfg.PROJECT_DIR, "checkpoints", f"orbax_{cur_iter}"),
                host_state,
                wait=False,
            )
            logging.info("Save checkpoint to %s...", save_name)

        if (
            cfg.TRAIN.SAMPLE_INTERVAL > 0
            and (cur_iter % cfg.TRAIN.SAMPLE_INTERVAL == 0 or cur_iter == max_iter)
            and is_main_process()
        ):
            filename = osp.join(cfg.PROJECT_DIR, "generate", f"iter_{cur_iter:03d}.png")
            ema_vars = {"params": state.ema.shadow_params, "batch_stats": state.batch_stats}
            evaluate(cfg, model, ema_vars, schedule, filename=filename)

    if profiling:
        jax.profiler.stop_trace()
    wait_for_checkpoints()  # async Orbax saves must be durable before exit


if __name__ == "__main__":
    main(parse_args())
