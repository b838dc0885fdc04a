"""End-to-end sampling-loop parity: reference torch model + the REFERENCE's
own scheduler classes driven step-by-step vs our fully-fused sampler with
converted weights.

Since round 4 the torch side is a full independent oracle: the reference
model produces every denoiser output AND the reference
GuidanceDDIMScheduler (running on tests/diffusers_stub.py) advances the
trajectory — no repo step function touches the expected chain.  The result
must match the single fused XLA program to float tolerance (BASELINE.json
"waypoint L2 parity").
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from diffusers_stub import load_reference_schedulers  # noqa: E402

REF_SCHED = load_reference_schedulers()

import jax
import jax.numpy as jnp

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    SamplerConfig,
    StepConfig,
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


def _make_ddim_oracle(n_steps, cfg=None):
    ocfg = create_cfg()
    if cfg is not None:
        ocfg.GUIDANCE.USE_COND = cfg.GUIDANCE.USE_COND
        ocfg.GUIDANCE.LOSS_LIST = cfg.GUIDANCE.LOSS_LIST
        ocfg.GUIDANCE.CLASSIFIER_SCALE = cfg.GUIDANCE.CLASSIFIER_SCALE
    oracle = REF_SCHED.GuidanceDDIMScheduler(
        ocfg,
        num_train_timesteps=100,
        prediction_type="sample",
        beta_schedule="squaredcos_cap_v2",
        thresholding=True,
    )
    oracle.set_timesteps(n_steps)
    return oracle


def test_full_sampling_loop_parity(pair, rng):
    tmodel, jmodel, variables, cfg = pair
    schedule = make_schedule("squaredcos_cap_v2", 100)
    step_cfg = StepConfig(prediction_type="sample", clip_sample=True, thresholding=True)
    ts, _ = leading_timesteps(100, cfg.EVAL.SAMPLE_STEPS)
    oracle = _make_ddim_oracle(cfg.EVAL.SAMPLE_STEPS)

    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))

    # --- fully reference-driven loop: torch model AND reference scheduler
    trajs = init.copy()
    trajs[:, 0, :3] = 0.0
    with torch.inference_mode():
        for t in ts:
            out = tmodel(torch.from_numpy(trajs), img_t, torch.tensor([float(t)]))
            trajs = oracle.step(out, int(t), torch.from_numpy(trajs)).prev_sample.numpy().copy()
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


def _build_ref_model(use_cond_name: str, dim: int, seed: int = 0):
    import modeling.resnet as ref_resnet
    import modeling.temporal as ref_temporal
    from misc.constant import GuidanceType as RefGuidance

    orig = ref_resnet.resnet34
    ref_temporal.resnet34 = lambda pretrained=True, **kw: orig(pretrained=False, **kw)
    try:
        torch.manual_seed(seed)
        return ref_temporal.TemporalMapUnet(
            horizon=16, transition_dim=7, attention=False, dim=dim,
            dim_mults=(1, 2, 4, 8), use_cond=RefGuidance[use_cond_name],
        ).eval()
    finally:
        ref_temporal.resnet34 = orig


def test_cfg_sampling_loop_parity(rng):
    """Dual-batch CFG sampling: torch-oracle per step vs the fused sampler
    (the free_guidance.yaml flagship path, reference interact.py:133-144)."""
    tmodel = _build_ref_model("FREE_GUIDANCE", dim=16)
    cfg = create_cfg()
    cfg.MODEL.DIM = 16
    cfg.TRAIN.USE_COND = "FREE_GUIDANCE"
    cfg.GUIDANCE.USE_COND = "FREE_GUIDANCE"
    cfg.GUIDANCE.FREE_SCALE = 7.5
    cfg.EVAL.SAMPLE_STEPS = 5
    jmodel = build_model(cfg, dtype=jnp.float32)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), cfg)

    schedule = make_schedule("squaredcos_cap_v2", 100)
    step_cfg = StepConfig(prediction_type="sample", clip_sample=True, thresholding=True)
    ts, _ = leading_timesteps(100, 5)

    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    target = rng.standard_normal((1, 2)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    # reference dual-batch cond: [target; zeros] (interact.py:119-127)
    cond_t = torch.from_numpy(np.concatenate([target, np.zeros_like(target)], axis=0))

    oracle = _make_ddim_oracle(5)
    trajs = init.copy()
    trajs[:, 0, :3] = 0.0
    with torch.inference_mode():
        for t in ts:
            x2 = torch.from_numpy(np.concatenate([trajs, trajs], axis=0))
            out_cond, out_uncond = tmodel(
                x2, img_t, torch.tensor([float(t)]), cond=cond_t
            ).chunk(2, dim=0)
            out = out_uncond + 7.5 * (out_cond - out_uncond)
            trajs = oracle.step(out, int(t), torch.from_numpy(trajs)).prev_sample.numpy().copy()
            trajs[:, 0, :3] = 0.0
    expected = np.clip(trajs, -1.0, 1.0)
    expected[..., :2] *= MAGIC_NUM

    scfg = SamplerConfig(
        guidance=GuidanceType.FREE_GUIDANCE, scheduler="ddim", num_steps=5,
        step=step_cfg, free_scale=7.5,
    )
    sample = jax.jit(make_sampler(jmodel, schedule, scfg))
    got = np.asarray(
        sample(variables, jnp.asarray(init), image=jnp.asarray(img), target=jnp.asarray(target))
    )
    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-3)


def test_classifier_sampling_loop_parity(rng):
    """Classifier-guided sampling: full torch oracle (model + the reference
    GuidanceDDIMScheduler applying GuidanceLoss autograd inside step()) vs our
    fused sampler with jax.grad guidance
    (reference interact.py:145-160 + guidance_ddim_scheduler.py:89-92)."""
    tmodel = _build_ref_model("CLASSIFIER_GUIDANCE", dim=64)
    cfg = create_cfg()
    cfg.MODEL.DIM = 64
    cfg.TRAIN.USE_COND = "CLASSIFIER_GUIDANCE"
    cfg.GUIDANCE.USE_COND = "CLASSIFIER_GUIDANCE"
    cfg.GUIDANCE.CLASSIFIER_SCALE = 15.0
    cfg.GUIDANCE.LOSS_LIST = [["TargetGuidance", []]]
    cfg.EVAL.SAMPLE_STEPS = 2
    jmodel = build_model(cfg, dtype=jnp.float32)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), cfg)

    schedule = make_schedule("squaredcos_cap_v2", 100)
    step_cfg = StepConfig(prediction_type="sample", clip_sample=True, thresholding=True)
    ts, _ = leading_timesteps(100, 2)
    oracle = _make_ddim_oracle(2, cfg)
    assert oracle.use_classifier_guidance

    init = rng.standard_normal((1, 16, 7)).astype(np.float32)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    target = rng.standard_normal((1, 2)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))

    trajs = init.copy()
    trajs[:, 0, :3] = 0.0
    for t in ts:
        # torch forward with grads enabled through state_pred (interact.py:145-160)
        action, time_embed = tmodel(
            torch.from_numpy(trajs), img_t, torch.tensor([float(t)]),
            return_action_and_time_only=True,
        )
        action = action.detach().requires_grad_()
        state = tmodel.state_pred(action[:, :-1], time_embed.detach())
        state = torch.cat([torch.zeros_like(state[:, :1]), state], dim=1)
        model_output = torch.cat([state, action], dim=-1)
        # guidance (variance, model_std, gradient update) happens INSIDE the
        # reference scheduler step (guidance_ddim_scheduler.py:86-92)
        trajs = (
            oracle.step(
                model_output, int(t), torch.from_numpy(trajs),
                target=torch.from_numpy(target), action=action,
            )
            .prev_sample.detach().numpy().copy()
        )
        trajs[:, 0, :3] = 0.0
    expected = np.clip(trajs, -1.0, 1.0)
    expected[..., :2] *= MAGIC_NUM

    scfg = SamplerConfig(
        guidance=GuidanceType.CLASSIFIER_GUIDANCE, scheduler="ddim", num_steps=2,
        step=step_cfg, classifier_scale=15.0, guidance_step=1,
        loss_list=[["TargetGuidance", []]],
    )
    sample = jax.jit(make_sampler(jmodel, schedule, scfg))
    got = np.asarray(
        sample(variables, jnp.asarray(init), image=jnp.asarray(img), target=jnp.asarray(target))
    )
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
