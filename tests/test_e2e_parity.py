"""End-to-end sampling-loop parity: reference torch model driven step-by-step
through our scheduler math vs our fully-fused sampler with converted weights.

This is the strongest full-loop check available without diffusers installed:
the torch oracle produces every denoiser output; our DDIM step + thresholding
+ anchoring advance the trajectory; the result must match the single fused
XLA program bit-for-bit to float tolerance (BASELINE.json "waypoint L2
parity").
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    SamplerConfig,
    StepConfig,
    ddim_step,
    leading_timesteps,
    make_sampler,
    make_schedule,
)
from autonomous_driving_with_diffusion_model_tpu.models import (
    build_model,
    torch_state_dict_to_variables,
)
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg
from autonomous_driving_with_diffusion_model_tpu.utils.constants import MAGIC_NUM, GuidanceType


@pytest.fixture(scope="module")
def pair():
    import modeling.resnet as ref_resnet
    import modeling.temporal as ref_temporal
    from misc.constant import GuidanceType as RefGuidance

    orig = ref_resnet.resnet34
    ref_temporal.resnet34 = lambda pretrained=True, **kw: orig(pretrained=False, **kw)
    try:
        torch.manual_seed(0)
        tmodel = ref_temporal.TemporalMapUnet(
            horizon=16, transition_dim=7, attention=False, dim=16,
            dim_mults=(1, 2, 4, 8), use_cond=RefGuidance.NO_GUIDANCE,
        ).eval()
    finally:
        ref_temporal.resnet34 = orig
    cfg = create_cfg()
    cfg.MODEL.DIM = 16
    cfg.EVAL.SAMPLE_STEPS = 10
    jmodel = build_model(cfg, dtype=jnp.float32)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), cfg)
    return tmodel, jmodel, variables, cfg


def test_full_sampling_loop_parity(pair, rng):
    tmodel, jmodel, variables, cfg = pair
    schedule = make_schedule("squaredcos_cap_v2", 100)
    step_cfg = StepConfig(prediction_type="sample", clip_sample=True, thresholding=True)
    ts, prev_ts = leading_timesteps(100, cfg.EVAL.SAMPLE_STEPS)

    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))

    # --- reference-driven loop: torch model per step, our step math between
    trajs = init.copy()
    trajs[:, 0, :3] = 0.0
    with torch.inference_mode():
        for t, prev_t in zip(ts, prev_ts):
            out = tmodel(
                torch.from_numpy(trajs), img_t, torch.tensor([float(t)])
            ).numpy()
            nxt, _ = ddim_step(
                schedule,
                step_cfg,
                jnp.asarray(out),
                jnp.asarray(int(t)),
                jnp.asarray(int(prev_t)),
                jnp.asarray(trajs),
            )
            trajs = np.array(nxt)  # writable copy
            trajs[:, 0, :3] = 0.0
    expected = np.clip(trajs, -1.0, 1.0)
    expected[..., :2] *= MAGIC_NUM

    # --- our fused sampler, one XLA program
    scfg = SamplerConfig(
        guidance=GuidanceType.NO_GUIDANCE,
        scheduler="ddim",
        num_steps=cfg.EVAL.SAMPLE_STEPS,
        step=step_cfg,
        hoist_perception=True,
    )
    sample = jax.jit(make_sampler(jmodel, schedule, scfg))
    got = np.asarray(sample(variables, jnp.asarray(init), image=jnp.asarray(img)))

    l2 = np.sqrt(np.mean((got[..., :2] - expected[..., :2]) ** 2))
    assert l2 < 1e-3, f"waypoint L2 {l2}"
    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-3)


def test_strict_mode_matches_too(pair, rng):
    """Strict (per-step perception) execution mode gives the same loop result."""
    tmodel, jmodel, variables, cfg = pair
    schedule = make_schedule("squaredcos_cap_v2", 100)
    step_cfg = StepConfig(prediction_type="sample", clip_sample=True, thresholding=True)
    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)

    outs = []
    for hoist in (True, False):
        scfg = SamplerConfig(
            scheduler="ddim", num_steps=4, step=step_cfg, hoist_perception=hoist
        )
        sample = jax.jit(make_sampler(jmodel, schedule, scfg))
        outs.append(np.asarray(sample(variables, jnp.asarray(init), image=jnp.asarray(img))))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
