"""Multislice (DCN x ICI) 2-D data-parallel mesh recipe.

The virtual 8-device CPU mesh splits into 2 "slices" x 4 devices; the full
train step runs with the batch sharded over BOTH axes and matches the 1-D
8-device mesh result — the gradient all-reduce decomposes across the two
axes without changing the optimization math (docs/DESIGN.md decision 5).
"""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    make_schedule_from_cfg,
)
from autonomous_driving_with_diffusion_model_tpu.models import build_model
from autonomous_driving_with_diffusion_model_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_multislice_mesh,
    replicated,
)
from autonomous_driving_with_diffusion_model_tpu.train import (
    create_train_state,
    make_train_step,
)
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg


def _tiny_cfg():
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.TRAIN.TIME_STEPS = 10
    return cfg


def test_multislice_mesh_shape_and_axes():
    mesh = make_multislice_mesh(2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "data")
    # rows partition the device set disjointly
    ids = [d.id for row in mesh.devices for d in row]
    assert len(set(ids)) == 8


def test_train_step_over_multislice_mesh_matches_flat_mesh(rng):
    cfg = _tiny_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 24, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    schedule = make_schedule_from_cfg(cfg)
    step = jax.jit(make_train_step(model, schedule, cfg))

    B = 8
    batch = {
        "image": rng.standard_normal((B, 24, 32, 3)).astype(np.float32),
        "trajs": (rng.standard_normal((B, 16, 7)) * 0.3).astype(np.float32),
        "target": rng.standard_normal((B, 2)).astype(np.float32),
    }
    key = jax.random.PRNGKey(7)

    results = {}
    for name, mesh, axis in (
        ("flat", make_mesh(8), "data"),
        ("multislice", make_multislice_mesh(2), ("dcn", "data")),
    ):
        state = create_train_state(model, variables, cfg)
        state = jax.device_put(state, replicated(mesh))
        sharded = jax.tree.map(
            lambda v: jax.device_put(v, batch_sharding(mesh, axis)), batch
        )
        new_state, metrics = step(state, sharded, key)
        results[name] = (
            float(metrics["loss"]),
            jax.tree.map(np.asarray, jax.device_get(new_state.params)),
        )

    loss_flat, params_flat = results["flat"]
    loss_ms, params_ms = results["multislice"]
    assert loss_flat == np.float32(loss_ms) or abs(loss_flat - loss_ms) < 1e-6
    flat_leaves = jax.tree_util.tree_leaves(params_flat)
    ms_leaves = jax.tree_util.tree_leaves(params_ms)
    for a, b in zip(flat_leaves, ms_leaves):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
