"""bfloat16 compute path: runs end-to-end, stays close to f32."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    make_schedule,
    sampler_from_cfg,
)
from autonomous_driving_with_diffusion_model_tpu.models import build_model
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg


def test_bf16_forward_close_to_f32(rng):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    x = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    t = jnp.asarray([1.0, 2.0])

    m32 = build_model(cfg, dtype=jnp.float32)
    variables = m32.init(jax.random.PRNGKey(0), x, img=img, time=t)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    m16 = build_model(cfg)

    o32 = np.asarray(m32.apply(variables, x, img=img, time=t))
    o16 = m16.apply(variables, x, img=img, time=t)
    assert o16.dtype == jnp.bfloat16
    assert np.abs(o32 - np.asarray(o16, np.float32)).max() < 0.2


def test_bf16_sampler_runs(rng):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.EVAL.SAMPLE_STEPS = 3
    model = build_model(cfg)
    x = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg))
    out = np.asarray(sample(variables, x, image=img))
    # sampler always emits fp32 trajectories regardless of compute dtype
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
