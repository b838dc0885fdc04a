"""Fused sampler integration tests (CPU, tiny model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    make_schedule,
    sampler_from_cfg,
)
from autonomous_driving_with_diffusion_model_tpu.models import build_model
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg
from autonomous_driving_with_diffusion_model_tpu.utils.constants import MAGIC_NUM


def tiny_cfg(use_cond="NO_GUIDANCE", scheduler="ddim", steps=4):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.TRAIN.USE_COND = use_cond
    cfg.GUIDANCE.USE_COND = use_cond
    cfg.EVAL.SCHEDULER = scheduler
    cfg.EVAL.SAMPLE_STEPS = steps
    if use_cond == "CLASSIFIER_GUIDANCE":
        cfg.MODEL.DIM = 64  # TrajPredict hidden_dim is fixed at 64
        cfg.GUIDANCE.LOSS_LIST = [["TargetGuidance", []]]
        cfg.GUIDANCE.CLASSIFIER_SCALE = 15.0
        cfg.EVAL.SAMPLE_STEPS = 2
    if use_cond == "FREE_GUIDANCE":
        cfg.GUIDANCE.FREE_SCALE = 7.5
    return cfg


def setup_model(cfg, rng, img_hw=(32, 48)):
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, *img_hw, 3)), jnp.float32)
    t = jnp.asarray([1.0])
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=t)
    return model, variables, img


@pytest.mark.parametrize("use_cond", ["NO_GUIDANCE", "FREE_GUIDANCE", "CLASSIFIER_GUIDANCE"])
@pytest.mark.parametrize("scheduler", ["ddim", "ddpm"])
def test_sampler_runs_and_respects_invariants(rng, use_cond, scheduler):
    cfg = tiny_cfg(use_cond, scheduler)
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg))

    init = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((1, 2)), jnp.float32)
    trajs = sample(variables, init, image=img, target=target, rng=jax.random.PRNGKey(1))
    trajs = np.asarray(trajs)
    assert trajs.shape == (1, 16, 7)
    assert np.isfinite(trajs).all()
    # anchor zeroed before meters scaling => stays zero
    np.testing.assert_allclose(trajs[0, 0, :3], 0.0, atol=1e-6)
    # clamped to [-1, 1] then xy scaled by magic number
    assert np.abs(trajs[..., :2]).max() <= MAGIC_NUM + 1e-4
    assert np.abs(trajs[..., 2:]).max() <= 1.0 + 1e-5


def test_sampler_deterministic_with_fixed_noise(rng):
    cfg = tiny_cfg("NO_GUIDANCE", "ddpm", steps=3)
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg))
    init = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    a = sample(variables, init, image=img, rng=jax.random.PRNGKey(7))
    b = sample(variables, init, image=img, rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hoisted_vs_strict_perception_identical(rng):
    """Hoisting the encoder out of the scan is numerically identical
    (constant image, eval-mode BN) — the key latency optimization."""
    cfg = tiny_cfg("NO_GUIDANCE", "ddim", steps=3)
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    init = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)

    cfg.TPU.HOIST_PERCEPTION = True
    hoisted = jax.jit(sampler_from_cfg(model, schedule, cfg))(variables, init, image=img)
    cfg.TPU.HOIST_PERCEPTION = False
    strict = jax.jit(sampler_from_cfg(model, schedule, cfg))(variables, init, image=img)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(strict), atol=1e-5)


def test_sampler_batch_sharded_over_mesh(rng):
    """DP inference serving: a batch-8 plan sharded over the 8-device mesh
    equals the unsharded result (one trajectory per device, params
    replicated) — the multi-chip throughput path for offline sampling."""
    from autonomous_driving_with_diffusion_model_tpu.parallel import (
        make_mesh,
        shard_batch,
    )

    cfg = tiny_cfg("NO_GUIDANCE", "ddim", steps=3)
    model, variables, _ = setup_model(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    init = jnp.asarray(rng.standard_normal((8, 16, 7)), jnp.float32)
    img8 = jnp.asarray(rng.standard_normal((8, 32, 48, 3)), jnp.float32)
    plain = np.asarray(sample(variables, init, image=img8))
    sharded_in = shard_batch({"init": init, "image": img8}, mesh)
    sharded = np.asarray(
        sample(variables, sharded_in["init"], image=sharded_in["image"])
    )
    # the sharded inputs trigger a recompile with different fusion/reduction
    # order (~1e-4 drift on MAGIC_NUM-scaled meters); a sharding bug (row
    # permutation, missing replication) would show O(1) errors
    np.testing.assert_allclose(sharded, plain, atol=5e-4)


def test_free_guidance_scale_one_equals_cond_path(rng):
    """With FREE_SCALE=1, CFG output reduces to the conditional branch."""
    cfg = tiny_cfg("FREE_GUIDANCE", "ddim", steps=2)
    cfg.GUIDANCE.FREE_SCALE = 1.0
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg))
    init = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((1, 2)), jnp.float32)
    out = sample(variables, init, image=img, target=target)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_eta_stochastic(rng):
    """eta > 0 DDIM adds eta*sqrt(var)*noise (dead EVAL.ETA in the reference,
    config.py:99 — live here): different rngs give different samples, same rng
    reproduces."""
    from autonomous_driving_with_diffusion_model_tpu.diffusion import (
        SamplerConfig,
        StepConfig,
        make_sampler,
        make_schedule,
    )

    cfg = tiny_cfg("NO_GUIDANCE", "ddim", steps=3)
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule("squaredcos_cap_v2", 100)
    scfg = SamplerConfig(
        scheduler="ddim", num_steps=3,
        step=StepConfig(prediction_type="sample", clip_sample=True, eta=1.0),
    )
    sample = jax.jit(make_sampler(model, schedule, scfg))
    init = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    a = np.asarray(sample(variables, init, image=img, rng=jax.random.PRNGKey(1)))
    b = np.asarray(sample(variables, init, image=img, rng=jax.random.PRNGKey(2)))
    c = np.asarray(sample(variables, init, image=img, rng=jax.random.PRNGKey(1)))
    assert not np.allclose(a, b)  # stochastic across keys
    np.testing.assert_array_equal(a, c)  # reproducible per key


def test_training_eval_sampler(rng):
    """train.evaluate clone: DDPM, TIME_STEPS steps, no cond, no meters scale."""
    cfg = tiny_cfg("NO_GUIDANCE", "ddpm")
    cfg.TRAIN.TIME_STEPS = 5
    cfg.TRAIN.SAMPLE_STEPS = 5
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg, for_training_eval=True))
    init = jnp.asarray(rng.standard_normal((4, 16, 7)), jnp.float32)
    out = np.asarray(sample(variables, init, image=jnp.tile(img, (4, 1, 1, 1))))
    assert out.shape == (4, 16, 7)
    assert np.abs(out).max() <= 1.0 + 1e-5  # no meters scaling
