"""DiffusionPlanner checkpoint loading: the eval-side .pth path end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_driving_with_diffusion_model_tpu.diffusion import make_schedule
from autonomous_driving_with_diffusion_model_tpu.driving import DiffusionPlanner
from autonomous_driving_with_diffusion_model_tpu.models import build_model
from autonomous_driving_with_diffusion_model_tpu.train import (
    create_train_state,
    export_torch_checkpoint,
)
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg


def test_planner_loads_orbax_checkpoint(tmp_path, rng):
    from autonomous_driving_with_diffusion_model_tpu.train import save_orbax

    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.EVAL.SAMPLE_STEPS = 2
    cfg.TRAIN.IMAGE_HEIGHT = 32
    cfg.TRAIN.IMAGE_WIDTH = 48

    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, img=img, time=jnp.asarray([1.0]))
    state = create_train_state(model, variables, cfg)
    path = str(tmp_path / "orbax_ckpt")
    save_orbax(path, jax.tree_util.tree_map(np.asarray, state))

    cfg.EVAL.CHECKPOINT = path
    planner = DiffusionPlanner(cfg)
    # eval weights == the EMA shadow from the saved state
    np.testing.assert_allclose(
        np.asarray(planner.variables["params"]["time_mlp"]["fc1"]["weight"]),
        np.asarray(state.ema.shadow_params["time_mlp"]["fc1"]["weight"]),
    )
    traj = planner.plan(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    assert traj.shape == (1, 16, 7) and np.isfinite(traj).all()


def test_planner_loads_torch_checkpoint_with_ema(tmp_path, rng):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8  # resnet34 perception required for .pth round-trip
    cfg.EVAL.SAMPLE_STEPS = 2
    cfg.TRAIN.IMAGE_HEIGHT = 32
    cfg.TRAIN.IMAGE_WIDTH = 48

    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    state = create_train_state(model, variables, cfg)
    path = str(tmp_path / "ckpt.pth")
    export_torch_checkpoint(state, cfg, path)

    cfg.EVAL.CHECKPOINT = path
    planner = DiffusionPlanner(cfg)
    rgb = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    traj = planner.plan(rgb)
    assert traj.shape == (1, 16, 7)
    assert np.isfinite(traj).all()
    np.testing.assert_allclose(traj[0, 0, :3], 0.0, atol=1e-6)
    # fixed init noise: identical input -> identical plan (interact.py:100 mode)
    traj2 = planner.plan(rgb)
    np.testing.assert_array_equal(traj, traj2)
