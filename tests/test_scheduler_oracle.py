"""Per-step scheduler parity against the REFERENCE's own scheduler classes.

Round-3 verdict item #1: until now every e2e/golden test advanced the torch
model with OUR step functions on both sides, so the scheduler math had no
independent oracle. Here the reference's actual ``GuidanceDDIMScheduler`` /
``GuidanceDDPMScheduler`` / ``Inpainting*Scheduler`` subclasses
(/root/reference/scheduler/guidance_ddim_scheduler.py:60-173,
guidance_ddpm_scheduler.py:59-178, inpainting_*.py) run under torch on a
minimal diffusers-0.28.0 base-class stub (tests/diffusers_stub.py), and every
step function in ``diffusion/steps.py`` is checked against them chain-wise:
a divergence in timestep spacing, threshold quantile, variance computation,
or the pre-guidance variance (guidance_ddim_scheduler.py:87-91) now fails a
test. Tolerances are ~1e-5 — far below the 1e-3 a real math divergence would
produce.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffusers_stub import load_reference_schedulers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from autonomous_driving_with_diffusion_model_tpu.diffusion import (  # noqa: E402
    StepConfig,
    ddim_step,
    ddim_variance,
    ddpm_step,
    ddpm_variance,
    inpaint_blend_ddim,
    inpaint_blend_ddpm,
    leading_timesteps,
    make_schedule,
)
from autonomous_driving_with_diffusion_model_tpu.diffusion.guidance import (  # noqa: E402
    make_guidance_fn,
)
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg  # noqa: E402

REF_SCHED = load_reference_schedulers()

T_TRAIN = 100
SHAPE = (2, 16, 7)


def _no_guidance_cfg():
    cfg = create_cfg()
    cfg.GUIDANCE.USE_COND = "NO_GUIDANCE"
    return cfg


def _classifier_cfg():
    cfg = create_cfg()
    cfg.GUIDANCE.USE_COND = "CLASSIFIER_GUIDANCE"
    cfg.GUIDANCE.LOSS_LIST = [["TargetGuidance", []]]
    cfg.GUIDANCE.CLASSIFIER_SCALE = 15.0
    cfg.GUIDANCE.STEP = 1
    return cfg


def _step_cfg(pred_type, clip_mode, eta=0.0):
    return StepConfig(
        prediction_type=pred_type,
        clip_sample=clip_mode == "clip",
        thresholding=clip_mode == "threshold",
        eta=eta,
    )


def _oracle_kwargs(pred_type, clip_mode):
    return dict(
        num_train_timesteps=T_TRAIN,
        beta_schedule="squaredcos_cap_v2",
        prediction_type=pred_type,
        clip_sample=clip_mode == "clip",
        thresholding=clip_mode == "threshold",
    )


@pytest.mark.parametrize("n_steps", [2, 5, 10, 100])
def test_set_timesteps_parity(n_steps):
    """leading_timesteps must equal diffusers-0.28.0 leading spacing for both
    scheduler families (interact.py:130 set_timesteps(EVAL.SAMPLE_STEPS))."""
    ts, prev_ts = leading_timesteps(T_TRAIN, n_steps)
    ddim = REF_SCHED.GuidanceDDIMScheduler(_no_guidance_cfg(), num_train_timesteps=T_TRAIN)
    ddim.set_timesteps(n_steps)
    np.testing.assert_array_equal(ts, ddim.timesteps.numpy())

    ddpm = REF_SCHED.GuidanceDDPMScheduler(_no_guidance_cfg(), num_train_timesteps=T_TRAIN)
    ddpm.set_timesteps(n_steps)
    np.testing.assert_array_equal(ts, ddpm.timesteps.numpy())
    # DDIM prev = t - T//n (guidance_ddim_scheduler.py:86); DDPM prev via
    # previous_timestep's timesteps-table lookup — both must match ours up to
    # the prev<0 final step (oracle pins -1, ours t-T//n; the step math maps
    # every negative prev to final_alpha/one identically).
    for t, p in zip(ts, prev_ts):
        ref_p = int(ddpm.previous_timestep(int(t)))
        assert ref_p == int(p) or (ref_p < 0 and int(p) < 0)


@pytest.mark.parametrize("pred_type", ["sample", "epsilon", "v_prediction"])
@pytest.mark.parametrize("clip_mode", ["clip", "threshold", "none"])
def test_guidance_ddim_step_chain_parity(pred_type, clip_mode, rng):
    oracle = REF_SCHED.GuidanceDDIMScheduler(
        _no_guidance_cfg(), **_oracle_kwargs(pred_type, clip_mode)
    )
    n_steps = 10
    oracle.set_timesteps(n_steps)
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    cfg = _step_cfg(pred_type, clip_mode)
    ts, prev_ts = leading_timesteps(T_TRAIN, n_steps)

    sample_o = torch.from_numpy(rng.standard_normal(SHAPE).astype(np.float32))
    sample_j = jnp.asarray(sample_o.numpy())
    for t, prev_t in zip(ts, prev_ts):
        out = rng.standard_normal(SHAPE).astype(np.float32)
        got = oracle.step(torch.from_numpy(out), int(t), sample_o)
        sample_o = got.prev_sample
        sample_j, pred_x0 = ddim_step(
            schedule, cfg, jnp.asarray(out), jnp.asarray(int(t)), jnp.asarray(int(prev_t)),
            sample_j,
        )
        np.testing.assert_allclose(
            np.asarray(sample_j), sample_o.numpy(), atol=2e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pred_x0), got.pred_original_sample.numpy(), atol=2e-5, rtol=1e-5
        )


def test_guidance_ddim_eta_noise_parity(rng):
    """eta > 0 adds eta*sqrt(var)*noise (guidance_ddim_scheduler.py:150-166)."""
    oracle = REF_SCHED.GuidanceDDIMScheduler(
        _no_guidance_cfg(), **_oracle_kwargs("sample", "clip")
    )
    oracle.set_timesteps(10)
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    cfg = _step_cfg("sample", "clip", eta=0.5)
    ts, prev_ts = leading_timesteps(T_TRAIN, 10)

    sample = rng.standard_normal(SHAPE).astype(np.float32)
    out = rng.standard_normal(SHAPE).astype(np.float32)
    noise = rng.standard_normal(SHAPE).astype(np.float32)
    t, prev_t = int(ts[3]), int(prev_ts[3])
    got = oracle.step(
        torch.from_numpy(out), t, torch.from_numpy(sample), eta=0.5,
        variance_noise=torch.from_numpy(noise),
    )
    ours, _ = ddim_step(
        schedule, cfg, jnp.asarray(out), jnp.asarray(t), jnp.asarray(prev_t),
        jnp.asarray(sample), noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(np.asarray(ours), got.prev_sample.numpy(), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("pred_type", ["sample", "epsilon"])
@pytest.mark.parametrize("clip_mode", ["clip", "threshold"])
def test_guidance_ddpm_step_chain_parity(pred_type, clip_mode, rng, monkeypatch):
    """DDPM chain incl. the posterior-noise injection; noise externalized by
    patching the module-level randn_tensor the reference step calls
    (guidance_ddpm_scheduler.py:157-162)."""
    import scheduler.guidance_ddpm_scheduler as gddpm_mod

    oracle = REF_SCHED.GuidanceDDPMScheduler(
        _no_guidance_cfg(), **_oracle_kwargs(pred_type, clip_mode)
    )
    n_steps = 10
    oracle.set_timesteps(n_steps)
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    cfg = _step_cfg(pred_type, clip_mode)
    ts, prev_ts = leading_timesteps(T_TRAIN, n_steps)
    noise_seq = [rng.standard_normal(SHAPE).astype(np.float32) for _ in ts]
    queue = list(noise_seq)
    monkeypatch.setattr(
        gddpm_mod, "randn_tensor", lambda *a, **k: torch.from_numpy(queue.pop(0))
    )

    sample_o = torch.from_numpy(rng.standard_normal(SHAPE).astype(np.float32))
    sample_j = jnp.asarray(sample_o.numpy())
    for i, (t, prev_t) in enumerate(zip(ts, prev_ts)):
        out = rng.standard_normal(SHAPE).astype(np.float32)
        got = oracle.step(torch.from_numpy(out), int(t), sample_o)
        sample_o = got.prev_sample
        sample_j, _ = ddpm_step(
            schedule, cfg, jnp.asarray(out), jnp.asarray(int(t)), jnp.asarray(int(prev_t)),
            sample_j, noise=jnp.asarray(noise_seq[i]),
        )
        np.testing.assert_allclose(
            np.asarray(sample_j), sample_o.numpy(), atol=2e-5, rtol=1e-5
        )
    assert not queue or len(queue) == 1  # t=0 draws no noise in ours; oracle draws pre-branch


def test_variance_tables_match_oracle():
    """ddim_variance / ddpm_variance (and the exp(0.5*var) model_std fed to
    the guidance hook) must equal the oracle's _get_variance at every
    inference timestep (guidance_ddim_scheduler.py:87-91, _ddpm:94-98)."""
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    ddim = REF_SCHED.GuidanceDDIMScheduler(
        _no_guidance_cfg(), num_train_timesteps=T_TRAIN, beta_schedule="squaredcos_cap_v2"
    )
    ddpm = REF_SCHED.GuidanceDDPMScheduler(
        _no_guidance_cfg(), num_train_timesteps=T_TRAIN, beta_schedule="squaredcos_cap_v2"
    )
    for n_steps in (2, 10):
        ddim.set_timesteps(n_steps)
        ddpm.set_timesteps(n_steps)
        ts, prev_ts = leading_timesteps(T_TRAIN, n_steps)
        for t, prev_t in zip(ts, prev_ts):
            ref_v = float(ddim._get_variance(int(t), int(prev_t)))
            ours = float(ddim_variance(schedule, jnp.asarray(int(t)), jnp.asarray(int(prev_t))))
            np.testing.assert_allclose(ours, ref_v, atol=1e-7, rtol=1e-5)
            ref_vp = float(ddpm._get_variance(int(t)))
            ours_p = float(
                ddpm_variance(schedule, jnp.asarray(int(t)), jnp.asarray(int(prev_t)))
            )
            np.testing.assert_allclose(ours_p, ref_vp, atol=1e-7, rtol=1e-5)
            np.testing.assert_allclose(
                float(np.exp(0.5 * ours)), float(torch.exp(0.5 * ddim._get_variance(int(t), int(prev_t)))),
                rtol=1e-6,
            )


def _linear_state_weights(rng):
    w1 = rng.standard_normal((3, 8)).astype(np.float32) * 0.5
    w2 = rng.standard_normal((8, 4)).astype(np.float32) * 0.5
    return w1, w2


@pytest.mark.parametrize("family", ["ddim", "ddpm"])
def test_classifier_guidance_hook_parity(family, rng, monkeypatch):
    """The in-step classifier-guidance hook: variance computed BEFORE the
    update, model_std = exp(0.5*variance), gradients w.r.t. both the full
    output and the action through a differentiable state head, scale/15 on
    state dims (guidance_*_scheduler.py:89-99, control/guidance.py:35-59)."""
    cfg_t = _classifier_cfg()
    if family == "ddim":
        oracle = REF_SCHED.GuidanceDDIMScheduler(cfg_t, **_oracle_kwargs("sample", "threshold"))
    else:
        oracle = REF_SCHED.GuidanceDDPMScheduler(cfg_t, **_oracle_kwargs("sample", "threshold"))
    assert oracle.use_classifier_guidance
    n_steps = 2  # classifier_guidance.yaml EVAL.SAMPLE_STEPS
    oracle.set_timesteps(n_steps)
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    step_cfg = _step_cfg("sample", "threshold")
    ts, prev_ts = leading_timesteps(T_TRAIN, n_steps)

    w1, w2 = _linear_state_weights(rng)
    w1_t, w2_t = torch.from_numpy(w1), torch.from_numpy(w2)

    def state_fn_jax(action):
        return jnp.tanh(action @ jnp.asarray(w1)) @ jnp.asarray(w2)

    guide = make_guidance_fn(
        cfg_t.GUIDANCE.LOSS_LIST, cfg_t.GUIDANCE.CLASSIFIER_SCALE,
        cfg_t.GUIDANCE.STEP, state_pred_fn=state_fn_jax,
    )

    if family == "ddpm":
        import scheduler.guidance_ddpm_scheduler as gddpm_mod

        noise_seq = [rng.standard_normal((1, 16, 7)).astype(np.float32) for _ in ts]
        queue = list(noise_seq)
        monkeypatch.setattr(
            gddpm_mod, "randn_tensor", lambda *a, **k: torch.from_numpy(queue.pop(0))
        )

    target = rng.standard_normal((1, 2)).astype(np.float32)
    sample_np = rng.standard_normal((1, 16, 7)).astype(np.float32)
    sample_o = torch.from_numpy(sample_np.copy())
    sample_j = jnp.asarray(sample_np)
    for i, (t, prev_t) in enumerate(zip(ts, prev_ts)):
        action_np = rng.standard_normal((1, 16, 3)).astype(np.float32)
        # oracle: graph output = cat(state(action), action), action grad-rooted
        action_t = torch.from_numpy(action_np.copy()).requires_grad_()
        state_t = torch.tanh(action_t @ w1_t) @ w2_t
        model_output_t = torch.cat([state_t, action_t], dim=-1)
        got = oracle.step(
            model_output_t, int(t), sample_o,
            target=torch.from_numpy(target), action=action_t,
        )
        sample_o = got.prev_sample.detach()

        # ours: guidance transform then the plain step
        action_j = jnp.asarray(action_np)
        x_j = jnp.concatenate([state_fn_jax(action_j), action_j], axis=-1)
        if family == "ddim":
            var = ddim_variance(schedule, jnp.asarray(int(t)), jnp.asarray(int(prev_t)))
        else:
            var = ddpm_variance(schedule, jnp.asarray(int(t)), jnp.asarray(int(prev_t)))
        guided = guide(x_j, action_j, jnp.asarray(target), jnp.exp(0.5 * var))
        if family == "ddim":
            sample_j, _ = ddim_step(
                schedule, step_cfg, guided, jnp.asarray(int(t)), jnp.asarray(int(prev_t)),
                sample_j,
            )
        else:
            sample_j, _ = ddpm_step(
                schedule, step_cfg, guided, jnp.asarray(int(t)), jnp.asarray(int(prev_t)),
                sample_j, noise=jnp.asarray(noise_seq[i]),
            )
        np.testing.assert_allclose(
            np.asarray(sample_j), sample_o.numpy(), atol=5e-5, rtol=1e-4
        )


def test_inpainting_ddim_parity_strict_quirk(rng):
    """RePaint DDIM blend incl. the reference's scalar-variance quirk: the
    unknown part adds _get_variance itself, not eta-scaled noise
    (inpainting_ddim_scheduler.py:96-128)."""
    oracle = REF_SCHED.InpaintingDDIMScheduler(**_oracle_kwargs("sample", "threshold"))
    n_steps = 8
    oracle.set_timesteps(n_steps)
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    cfg = _step_cfg("sample", "threshold")
    ts, prev_ts = leading_timesteps(T_TRAIN, n_steps)

    target_traj = (rng.standard_normal(SHAPE) * 0.3).astype(np.float32)
    target_mask = np.zeros(SHAPE, np.float32)
    target_mask[:, :4, :2] = 1.0

    sample_o = torch.from_numpy(rng.standard_normal(SHAPE).astype(np.float32))
    sample_j = jnp.asarray(sample_o.numpy())
    for t, prev_t in zip(ts, prev_ts):
        out = rng.standard_normal(SHAPE).astype(np.float32)
        noise = rng.standard_normal(SHAPE).astype(np.float32)
        got = oracle.step(
            torch.from_numpy(out), int(t), sample_o,
            variance_noise=torch.from_numpy(noise),
            target_traj=torch.from_numpy(target_traj),
            target_mask=torch.from_numpy(target_mask),
        )
        sample_o = got.prev_sample
        sample_j, _ = inpaint_blend_ddim(
            schedule, cfg, jnp.asarray(out), jnp.asarray(int(t)), jnp.asarray(int(prev_t)),
            sample_j, jnp.asarray(noise),
            target_traj=jnp.asarray(target_traj), target_mask=jnp.asarray(target_mask),
            strict_reference=True,
        )
        np.testing.assert_allclose(
            np.asarray(sample_j), sample_o.numpy(), atol=2e-5, rtol=1e-5
        )


def test_inpainting_ddpm_parity(rng):
    oracle = REF_SCHED.InpaintingDDPMScheduler(**_oracle_kwargs("sample", "threshold"))
    n_steps = 8
    oracle.set_timesteps(n_steps)
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    cfg = _step_cfg("sample", "threshold")
    ts, prev_ts = leading_timesteps(T_TRAIN, n_steps)

    target_traj = (rng.standard_normal(SHAPE) * 0.3).astype(np.float32)
    target_mask = np.zeros(SHAPE, np.float32)
    target_mask[:, :4, :2] = 1.0

    sample_o = torch.from_numpy(rng.standard_normal(SHAPE).astype(np.float32))
    sample_j = jnp.asarray(sample_o.numpy())
    for t, prev_t in zip(ts, prev_ts):
        out = rng.standard_normal(SHAPE).astype(np.float32)
        noise = rng.standard_normal(SHAPE).astype(np.float32)
        got = oracle.step(
            torch.from_numpy(out), int(t), sample_o,
            variance_noise=torch.from_numpy(noise),
            target_traj=torch.from_numpy(target_traj),
            target_mask=torch.from_numpy(target_mask),
        )
        sample_o = got.prev_sample
        sample_j, _ = inpaint_blend_ddpm(
            schedule, cfg, jnp.asarray(out), jnp.asarray(int(t)), jnp.asarray(int(prev_t)),
            sample_j, jnp.asarray(noise),
            target_traj=jnp.asarray(target_traj), target_mask=jnp.asarray(target_mask),
        )
        np.testing.assert_allclose(
            np.asarray(sample_j), sample_o.numpy(), atol=2e-5, rtol=1e-5
        )


def test_parity_tolerance_catches_perturbation(rng):
    """Guard on the guard: a 1e-3 perturbation of our step output must exceed
    the tolerances used above (so a genuine divergence cannot hide)."""
    oracle = REF_SCHED.GuidanceDDIMScheduler(
        _no_guidance_cfg(), **_oracle_kwargs("sample", "threshold")
    )
    oracle.set_timesteps(10)
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    cfg = _step_cfg("sample", "threshold")
    ts, prev_ts = leading_timesteps(T_TRAIN, 10)
    sample = rng.standard_normal(SHAPE).astype(np.float32)
    out = rng.standard_normal(SHAPE).astype(np.float32)
    t, prev_t = int(ts[0]), int(prev_ts[0])
    ref = oracle.step(torch.from_numpy(out), t, torch.from_numpy(sample)).prev_sample.numpy()
    ours, _ = ddim_step(
        schedule, cfg, jnp.asarray(out), jnp.asarray(t), jnp.asarray(prev_t), jnp.asarray(sample)
    )
    perturbed = np.asarray(ours) + 1e-3
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(perturbed, ref, atol=2e-5, rtol=1e-5)


def test_add_noise_matches_oracle(rng):
    """Training forward-noising (train.py:234) vs the diffusers base
    add_noise the reference trains with."""
    from autonomous_driving_with_diffusion_model_tpu.diffusion.schedule import (
        add_noise,
    )

    oracle = REF_SCHED.GuidanceDDPMScheduler(
        _no_guidance_cfg(), num_train_timesteps=T_TRAIN,
        beta_schedule="squaredcos_cap_v2",
    )
    schedule = make_schedule("squaredcos_cap_v2", T_TRAIN)
    x0 = rng.standard_normal((4, 16, 7)).astype(np.float32)
    noise = rng.standard_normal((4, 16, 7)).astype(np.float32)
    t = np.array([0, 13, 57, 99])
    ref = oracle.add_noise(
        torch.from_numpy(x0), torch.from_numpy(noise), torch.from_numpy(t)
    ).numpy()
    ours = add_noise(schedule, jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-6, rtol=1e-5)


def test_classifier_guidance_multi_step_is_a_latent_reference_bug(rng):
    """GUIDANCE.STEP > 1 CRASHES in the reference: iteration 1 detaches
    x_guidance (control/guidance.py:51), so iteration 2's
    ``autograd.grad([loss], [x_guidance, action])`` finds the action tensor
    unused in the graph and raises. Every shipped config uses STEP=1 — this
    is a dead/broken path (registered alongside SURVEY Appendix C). Our
    make_guidance_fn implements the INTENDED semantics (re-differentiating
    through the state head each iteration) and stays well-defined."""
    from control.guidance import GuidanceLoss as RefGuidanceLoss

    cfg = _classifier_cfg()
    cfg.GUIDANCE.STEP = 2
    ref_guidance = RefGuidanceLoss(cfg)
    w1, w2 = _linear_state_weights(rng)
    target = rng.standard_normal((1, 2)).astype(np.float32)
    action_np = rng.standard_normal((1, 16, 3)).astype(np.float32)

    action_t = torch.from_numpy(action_np.copy()).requires_grad_()
    state_t = torch.tanh(action_t @ torch.from_numpy(w1)) @ torch.from_numpy(w2)
    mo_t = torch.cat([state_t, action_t], dim=-1)
    with pytest.raises(RuntimeError, match="appears to not have been used"):
        ref_guidance(mo_t, action_t, torch.from_numpy(target), 0.7)

    def state_fn_jax(action):
        return jnp.tanh(action @ jnp.asarray(w1)) @ jnp.asarray(w2)

    guide = make_guidance_fn(
        cfg.GUIDANCE.LOSS_LIST, cfg.GUIDANCE.CLASSIFIER_SCALE,
        cfg.GUIDANCE.STEP, state_pred_fn=state_fn_jax,
    )
    action_j = jnp.asarray(action_np)
    x_j = jnp.concatenate([state_fn_jax(action_j), action_j], axis=-1)
    ours = guide(x_j, action_j, jnp.asarray(target), 0.7)
    assert np.all(np.isfinite(np.asarray(ours)))
    assert np.abs(np.asarray(ours)).max() <= 1.0 + 1e-6
