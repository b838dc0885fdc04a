"""Train CLI smoke: Orbax-native resume (TRAIN.RESUME pointing at an
orbax_* directory restores step + optimizer state, reference-parity with the
torch .pth path tested in test_train.py)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


@pytest.fixture
def data_root(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "data"
    (root / "front").mkdir(parents=True)
    (root / "bev").mkdir()  # evaluate() paints samples on the BEV image
    (root / "waypoints").mkdir()
    for i in range(10):
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "front" / f"{i:06d}.png"), img)
        cv2.imwrite(str(root / "bev" / f"{i:06d}.png"), img)
        lines = [" ".join(f"{v:.6f}" for v in rng.standard_normal(2))]
        for _ in range(16):
            lines.append(" ".join(f"{v:.6f}" for v in rng.standard_normal(7) * 2))
        (root / "waypoints" / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def _load_train_cli():
    """Load the repo's train.py by path: parity tests put /root/reference on
    sys.path, whose own train.py would shadow a plain ``import train``."""
    import importlib.util

    if "adm_train_cli" in sys.modules:
        return sys.modules["adm_train_cli"]
    spec = importlib.util.spec_from_file_location(
        "adm_train_cli", os.path.join(REPO, "train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["adm_train_cli"] = mod
    spec.loader.exec_module(mod)
    return mod


def _run_train(tmp_path, data_root, max_iter, resume=None):
    train_cli = _load_train_cli()

    run_dir = str(tmp_path / "run")
    opts = [
        "TRAIN.ROOT", data_root,
        "PROJECT_DIR", run_dir,
        "MODEL.DIM", "8",
        "MODEL.PERCEPTION", "tiny",
        "TRAIN.IMAGE_HEIGHT", "32",
        "TRAIN.IMAGE_WIDTH", "48",
        "TRAIN.BATCH_SIZE", "8",
        "TRAIN.TIME_STEPS", "10",
        "TRAIN.SAMPLE_STEPS", "10",
        "TRAIN.MAX_ITER", str(max_iter),
        "TRAIN.SAVE_INTERVAL", "2",
        "TRAIN.LOG_INTERVAL", "1",
        "TRAIN.SAMPLE_INTERVAL", "100000",
        "TRAIN.NUM_WORKERS", "0",
        "TRAIN.USE_IMG_AUGMENTOR", "False",
    ]
    if resume is not None:
        opts += ["TRAIN.RESUME", resume]
    train_cli.main(train_cli.parse_args(["--opts", *opts]))
    return run_dir


def test_orbax_resume_restores_step_and_opt_state(tmp_path, data_root):
    run_dir = _run_train(tmp_path, data_root, max_iter=2)
    ckpt = os.path.join(run_dir, "checkpoints", "orbax_2")
    assert os.path.isdir(ckpt), os.listdir(os.path.join(run_dir, "checkpoints"))

    # resume from the native format: training continues from iter 2, and the
    # restored state is byte-identical to the saved one before stepping
    import jax

    from autonomous_driving_with_diffusion_model_tpu.train import restore_orbax

    run_dir2 = _run_train(tmp_path / "second", data_root, max_iter=4, resume=ckpt)
    ckpt4 = os.path.join(run_dir2, "checkpoints", "orbax_4")
    assert os.path.isdir(ckpt4)

    # the step counter carried over (resume trains 2 more iters, not 4)
    from autonomous_driving_with_diffusion_model_tpu.models import build_model
    from autonomous_driving_with_diffusion_model_tpu.train import create_train_state
    from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg
    import jax.numpy as jnp

    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 7))
    img = jnp.zeros((1, 32, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    abstract = jax.tree.map(np.asarray, create_train_state(model, variables, cfg))
    restored2 = restore_orbax(ckpt, abstract)
    assert int(restored2.step) == 2
    restored4 = restore_orbax(ckpt4, abstract)
    assert int(restored4.step) == 4
    # optimizer state restored, not reinitialized: Adam moments are non-zero
    mu_leaves = jax.tree.leaves(restored4.opt_state)
    assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in mu_leaves)
