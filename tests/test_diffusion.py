"""Diffusion schedule/step correctness + guidance parity vs the reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    StepConfig,
    add_noise,
    ddim_step,
    ddim_variance,
    ddpm_step,
    ddpm_variance,
    dynamic_threshold,
    inpaint_blend_ddim,
    inpaint_blend_ddpm,
    leading_timesteps,
    make_schedule,
    target_guidance_loss,
)


def test_leading_timesteps_literals():
    ts, prev = leading_timesteps(100, 10)
    assert ts.tolist() == [90, 80, 70, 60, 50, 40, 30, 20, 10, 0]
    assert prev.tolist() == [80, 70, 60, 50, 40, 30, 20, 10, 0, -10]
    ts2, prev2 = leading_timesteps(100, 2)
    assert ts2.tolist() == [50, 0]
    assert prev2.tolist() == [0, -50]
    ts3, _ = leading_timesteps(100, 100)
    assert ts3.tolist() == list(range(99, -1, -1))


def test_betas_squaredcos_properties():
    sched = make_schedule("squaredcos_cap_v2", 100)
    betas = np.asarray(sched.betas)
    assert betas.shape == (100,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    assert betas[-1] == pytest.approx(0.999)  # cap engages near t=T
    ac = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(ac) < 0) and 0 < ac[-1] < ac[0] < 1
    # independent check of the diffusers formula at i=0
    import math

    bar = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    assert betas[0] == pytest.approx(min(1 - bar(1 / 100) / bar(0), 0.999), rel=1e-6)


def test_add_noise_formula(rng):
    sched = make_schedule("squaredcos_cap_v2", 100)
    x0 = jnp.asarray(rng.standard_normal((4, 16, 7)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((4, 16, 7)), jnp.float32)
    t = jnp.asarray([0, 10, 50, 99])
    out = add_noise(sched, x0, eps, t)
    ac = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
    ref = np.sqrt(ac)[:, None, None] * np.asarray(x0) + np.sqrt(1 - ac)[:, None, None] * np.asarray(
        eps
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_ddim_perfect_model_inverts_forward(rng):
    """With pred_type=sample and a perfect model, eta=0 DDIM maps the exact
    x_t to the exact x_{prev} for the same eps (DDIM paper eq. 12)."""
    sched = make_schedule("squaredcos_cap_v2", 100)
    cfg = StepConfig(prediction_type="sample", clip_sample=False)
    x0 = jnp.asarray(rng.standard_normal((2, 16, 7)) * 0.3, jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    for t, prev_t in [(90, 80), (50, 0), (0, -10)]:
        ac_t = float(sched.alphas_cumprod[t])
        ac_p = float(sched.alphas_cumprod[prev_t]) if prev_t >= 0 else 1.0
        x_t = np.sqrt(ac_t) * x0 + np.sqrt(1 - ac_t) * eps
        expected = np.sqrt(ac_p) * x0 + np.sqrt(1 - ac_p) * eps
        out, px0 = ddim_step(sched, cfg, x0, jnp.asarray(t), jnp.asarray(prev_t), x_t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
        np.testing.assert_allclose(np.asarray(px0), np.asarray(x0), atol=1e-6)


def test_ddpm_variance_matches_posterior():
    sched = make_schedule("squaredcos_cap_v2", 100)
    # adjacent steps: posterior var = beta_t (1 - ac_{t-1}) / (1 - ac_t)
    for t in [1, 10, 99]:
        beta_t = float(sched.betas[t])
        ac_t = float(sched.alphas_cumprod[t])
        ac_p = float(sched.alphas_cumprod[t - 1])
        # current_beta_t from cumprod ratio equals the table beta
        v = float(ddpm_variance(sched, jnp.asarray(t), jnp.asarray(t - 1)))
        expected = (1 - ac_p) / (1 - ac_t) * (1 - ac_t / ac_p)
        assert v == pytest.approx(expected, rel=1e-5)
        assert (1 - ac_t / ac_p) == pytest.approx(beta_t, rel=1e-4)


def test_ddpm_step_deterministic_part(rng):
    """DDPM posterior mean formula (DDPM paper eq. 7) with epsilon prediction."""
    sched = make_schedule("linear", 100)
    cfg = StepConfig(prediction_type="epsilon", clip_sample=False)
    x_t = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    eps_hat = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    t, prev_t = 50, 49
    ac_t = float(sched.alphas_cumprod[t])
    ac_p = float(sched.alphas_cumprod[prev_t])
    x0_hat = (np.asarray(x_t) - np.sqrt(1 - ac_t) * np.asarray(eps_hat)) / np.sqrt(ac_t)
    cur_beta = 1 - ac_t / ac_p
    mean = (
        np.sqrt(ac_p) * cur_beta / (1 - ac_t) * x0_hat
        + np.sqrt(1 - cur_beta) * (1 - ac_p) / (1 - ac_t) * np.asarray(x_t)
    )
    out, _ = ddpm_step(sched, cfg, eps_hat, jnp.asarray(t), jnp.asarray(prev_t), x_t, noise=None)
    np.testing.assert_allclose(np.asarray(out), mean, atol=1e-5)


def test_dynamic_threshold_matches_torch_quantile(rng):
    import torch

    x = rng.standard_normal((4, 16, 7)).astype(np.float32) * 3
    ratio, maxv = 0.995, 1.0
    xt = torch.from_numpy(x).reshape(4, -1)
    s = torch.quantile(xt.abs(), ratio, dim=1).clamp(1, maxv).unsqueeze(1)
    ref = (torch.clamp(xt, -s, s) / s).reshape(4, 16, 7).numpy()
    out = dynamic_threshold(jnp.asarray(x), ratio, maxv)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_inpaint_blend_known_region_renoised(rng):
    sched = make_schedule("squaredcos_cap_v2", 100)
    cfg = StepConfig(prediction_type="sample", clip_sample=False)
    x_t = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    x0_hat = jnp.asarray(rng.standard_normal((1, 16, 7)) * 0.2, jnp.float32)
    noise = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((1, 16, 7)) * 0.1, jnp.float32)
    mask = jnp.zeros((1, 16, 7)).at[:, :4, :].set(1.0)
    t, prev_t = 50, 40
    for blend in (inpaint_blend_ddpm, inpaint_blend_ddim):
        out, _ = blend(
            sched, cfg, x0_hat, jnp.asarray(t), jnp.asarray(prev_t), x_t, noise, target, mask
        )
        ac_p = float(sched.alphas_cumprod[prev_t])
        known = np.sqrt(ac_p) * np.asarray(target) + np.sqrt(1 - ac_p) * np.asarray(noise)
        np.testing.assert_allclose(np.asarray(out)[:, :4, :], known[:, :4, :], atol=1e-5)
        # unknown region must differ from the known formula
        assert not np.allclose(np.asarray(out)[:, 4:, :], known[:, 4:, :], atol=1e-3)


def test_target_guidance_loss_matches_reference(rng):
    """Value + gradient parity vs reference control/guidance_loss.py (oracle)."""
    import torch
    from control.guidance_loss import TargetGuidance

    x = rng.standard_normal((1, 16, 7)).astype(np.float32)
    target = rng.standard_normal((1, 2)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_()
    ref_loss = TargetGuidance()(xt, torch.from_numpy(target))
    ref_loss.backward()
    ref_grad = xt.grad.numpy()

    loss, grad = jax.value_and_grad(target_guidance_loss)(jnp.asarray(x), jnp.asarray(target))
    assert float(loss) == pytest.approx(float(ref_loss.detach()), rel=1e-5)
    np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=1e-5)


def test_target_guidance_dummy_branch(rng):
    """Endpoint short of target -> dummy index 0 branch (guidance_loss.py:18-21)."""
    import torch
    from control.guidance_loss import TargetGuidance

    # trajectory staying near origin, target far away => final_to_agent < target_to_agent
    x = (rng.standard_normal((1, 16, 7)) * 0.01).astype(np.float32)
    target = np.array([[5.0, 5.0]], dtype=np.float32)
    xt = torch.from_numpy(x).requires_grad_()
    ref_loss = TargetGuidance()(xt, torch.from_numpy(target))
    ref_loss.backward()
    loss, grad = jax.value_and_grad(target_guidance_loss)(jnp.asarray(x), jnp.asarray(target))
    assert float(loss) == pytest.approx(float(ref_loss.detach()), rel=1e-5)
    np.testing.assert_allclose(np.asarray(grad), xt.grad.numpy(), atol=1e-6)


def test_guidance_transform_matches_reference(rng):
    """Full GuidanceLoss.forward parity (control/guidance.py:35-59), including
    gradient flow through a state-prediction head."""
    import torch
    from control.guidance import GuidanceLoss

    from autonomous_driving_with_diffusion_model_tpu.diffusion import make_guidance_fn
    from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg

    cfg = create_cfg()
    cfg.GUIDANCE.USE_COND = "CLASSIFIER_GUIDANCE"
    cfg.GUIDANCE.LOSS_LIST = [["TargetGuidance", []]]
    cfg.GUIDANCE.CLASSIFIER_SCALE = 15.0
    ref_guidance = GuidanceLoss(cfg)

    # tiny linear "state_pred": state = action @ W (torch) to exercise the
    # gradient path through the head; anchored first row like the real model.
    W = rng.standard_normal((3, 4)).astype(np.float32) * 0.3
    action_np = rng.standard_normal((1, 16, 3)).astype(np.float32)
    target = rng.standard_normal((1, 2)).astype(np.float32)
    grad_scale = 0.7

    action_t = torch.from_numpy(action_np).requires_grad_()
    state_t = torch.from_numpy(action_np[:, :-1]).requires_grad_(False)
    state_t = action_t[:, :-1] @ torch.from_numpy(W)
    state_t = torch.cat([torch.zeros_like(state_t[:, :1]), state_t], dim=1)
    x_guidance = torch.cat([state_t, action_t], dim=-1)
    ref_out = ref_guidance(x_guidance, action_t, torch.from_numpy(target), grad_scale)

    def state_pred_fn(a):
        s = jnp.matmul(a[:, :-1], jnp.asarray(W))
        return jnp.concatenate([jnp.zeros_like(s[:, :1]), s], axis=1)

    guide = make_guidance_fn(cfg.GUIDANCE.LOSS_LIST, 15.0, 1, state_pred_fn)
    x_jax = jnp.concatenate([state_pred_fn(jnp.asarray(action_np)), jnp.asarray(action_np)], -1)
    out = guide(x_jax, jnp.asarray(action_np), jnp.asarray(target), grad_scale)
    np.testing.assert_allclose(np.asarray(out), ref_out.detach().numpy(), atol=2e-5)


def test_guidance_scale_landing_property():
    """The steering law behind the controllability sweep (learnability.py):
    with a single in-reach target and grad_scale == 1 (the final step's
    value), the state-dim update is -(scale/15)*2*(x_argmin - tgt) — so
    scale 7.5 lands the argmin waypoint EXACTLY on the target and scale 15
    reflects it past the target to 2*tgt - x_prior. Pure property of
    make_guidance_fn + target_guidance_loss; measured on-device at
    flagship scale in LEARNABILITY_CLS.json."""
    from autonomous_driving_with_diffusion_model_tpu.diffusion import make_guidance_fn

    loss_list = [["TargetGuidance", []]]
    # straight-ahead plan: forward stored as negative y, zero lateral
    x = np.zeros((1, 16, 7), np.float32)
    x[0, :, 1] = -0.05 * np.arange(16)
    target = np.array([[0.1, -0.35]], np.float32)  # argmin waypoint h=7
    # in reach: |endpoint| = 0.75 > |target| = 0.364 (guard off)
    action = np.zeros((1, 16, 3), np.float32)

    out_75 = np.asarray(
        make_guidance_fn(loss_list, 7.5, 1, None)(
            jnp.asarray(x), jnp.asarray(action), jnp.asarray(target), 1.0
        )
    )
    np.testing.assert_allclose(out_75[0, 7, :2], target[0], atol=1e-6)

    out_15 = np.asarray(
        make_guidance_fn(loss_list, 15.0, 1, None)(
            jnp.asarray(x), jnp.asarray(action), jnp.asarray(target), 1.0
        )
    )
    np.testing.assert_allclose(out_15[0, 7, :2], 2.0 * target[0] - x[0, 7, :2], atol=1e-6)

    # only the argmin waypoint's position moves
    mask = np.ones(16, bool)
    mask[7] = False
    np.testing.assert_array_equal(out_75[0, mask, :2], x[0, mask, :2])
