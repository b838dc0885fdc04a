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


def test_bf16_train_step_converges(rng):
    """Mixed-precision training: bf16 forward/backward compute with fp32
    master weights + fp32 loss/optimizer — finite grads, loss tracks fp32."""
    from autonomous_driving_with_diffusion_model_tpu.train import (
        create_train_state,
        make_train_step,
    )

    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = create_cfg()
        cfg.MODEL.DIM = 8
        cfg.MODEL.PERCEPTION = "tiny"
        cfg.TRAIN.TIME_STEPS = 10
        cfg.TRAIN.SAMPLE_STEPS = 10
        cfg.TPU.COMPUTE_DTYPE = dtype
        model = build_model(cfg)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((1, 16, 7)), jnp.float32)
        img = jnp.asarray(r.standard_normal((1, 32, 48, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, img=img, time=jnp.asarray([1.0]))
        # master weights stay fp32 regardless of compute dtype
        assert all(
            leaf.dtype == jnp.float32
            for leaf in jax.tree.leaves(variables["params"])
        )
        state = create_train_state(model, variables, cfg)
        schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
        step = jax.jit(make_train_step(model, schedule, cfg))
        batch = {
            "image": jnp.asarray(r.standard_normal((8, 32, 48, 3)), jnp.float32),
            "trajs": jnp.asarray(r.standard_normal((8, 16, 7)) * 0.3, jnp.float32),
            "target": jnp.asarray(r.standard_normal((8, 2)), jnp.float32),
        }
        seq = []
        for i in range(6):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            seq.append(float(metrics["loss"]))
        assert all(np.isfinite(v) for v in seq)
        losses[dtype] = seq
    # bf16 loss curve tracks fp32 closely at these scales
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"], rtol=0.1)
