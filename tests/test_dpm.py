"""DPM-Solver++(2M) tests (CPU).

The reference's "dpm" scheduler branch is a dead KeyError (interact.py:92-94
sets lambda_min_clipped=-5.1 but SCHEDULER_FUNC at interact.py:22-25 has no
"dpm" entry — SURVEY.md Appendix C.4), so there is NO torch oracle to diff
against. The solver is validated by mathematical identities instead:

* the grid matches diffusers' DPMSolverMultistep "linspace" spacing with
  lambda clipping;
* the first-order update coincides exactly with the eta=0 DDIM step, and the
  terminal step collapses to pred_x0 — both checked against ``ddim_step``;
* the multistep update converges to the fine-grid probability-flow ODE
  solution with a measurably better constant than DDIM at equal step count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.diffusion import (
    SamplerConfig,
    StepConfig,
    ddim_step,
    dpm_coeffs,
    dpm_pp_2m_update,
    dpm_timesteps,
    make_sampler,
    make_schedule,
    sampler_from_cfg,
)
from autonomous_driving_with_diffusion_model_tpu.models import build_model
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg
from autonomous_driving_with_diffusion_model_tpu.utils.constants import MAGIC_NUM

NOCLIP = StepConfig(prediction_type="sample", clip_sample=False, thresholding=False)


def _half_log_snr(schedule, t):
    ac = float(np.asarray(schedule.alphas_cumprod)[t])
    return 0.5 * (np.log(ac) - np.log1p(-ac))


def test_grid_linspace_spacing_and_lambda_clipping():
    schedule = make_schedule("squaredcos_cap_v2", 100)
    ts = dpm_timesteps(schedule, 10, lambda_min_clipped=-5.1)
    assert ts.shape == (10,)
    assert np.all(np.diff(ts) < 0)
    assert 0 <= ts[-1] < ts[0] < 100
    # the squaredcos tail dips below -5.1, so clipping must actually trim
    assert _half_log_snr(schedule, 99) < -5.1
    assert _half_log_snr(schedule, int(ts[0])) >= -5.1
    assert _half_log_snr(schedule, int(ts[0]) + 1) < -5.1
    # too many steps for the usable range -> duplicate grid, rejected
    with pytest.raises(ValueError, match="too large"):
        dpm_timesteps(schedule, 99)


def test_first_order_update_equals_eta0_ddim(rng):
    """DPM++(1) IS the eta=0 DDIM step written in x0 form."""
    schedule = make_schedule("squaredcos_cap_v2", 100)
    ts = np.asarray([60, 30], np.int64)
    prev = np.asarray([30, -1], np.int64)
    c = dpm_coeffs(schedule, ts, prev)
    x = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    x0 = jnp.asarray(0.3 * rng.standard_normal((2, 16, 7)), jnp.float32)

    # step 0 is first-order by construction (no history)
    assert float(c.inv_r[0]) == 0.0
    got = dpm_pp_2m_update(x, x0, jnp.zeros_like(x), c.sigma_ratio[0], c.phi[0], c.inv_r[0])
    want, _ = ddim_step(schedule, NOCLIP, x0, jnp.asarray(60), jnp.asarray(30), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # terminal step (sigma_prev = 0): exact collapse to pred_x0
    got = dpm_pp_2m_update(x, x0, jnp.zeros_like(x), c.sigma_ratio[1], c.phi[1], c.inv_r[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(x0), atol=1e-6)


def _toy_x0_model(rng):
    """A smooth, time-dependent x0 predictor defining a nontrivial flow ODE."""
    A = jnp.asarray(rng.standard_normal((7, 7)) / np.sqrt(7), jnp.float32)

    def f(x, t):
        gain = 1.0 + 0.2 * jnp.cos(jnp.asarray(t, jnp.float32) / 1000.0 * np.pi)
        return 0.5 * jnp.tanh(x @ A) * gain

    return f


def _run_ddim(schedule, f, x, ts):
    prev = np.concatenate([ts[1:], [-1]])
    for t, p in zip(ts, prev):
        x, _ = ddim_step(schedule, NOCLIP, f(x, t), jnp.asarray(t), jnp.asarray(p), x)
    return np.asarray(x)


def _run_dpm(schedule, f, x, ts):
    prev = np.concatenate([ts[1:], [-1]])
    c = dpm_coeffs(schedule, ts, prev)
    prev_x0 = jnp.zeros_like(x)
    for i, t in enumerate(ts):
        x0 = f(x, t)
        x, prev_x0 = dpm_pp_2m_update(x, x0, prev_x0, c.sigma_ratio[i], c.phi[i], c.inv_r[i]), x0
    return np.asarray(x)


def test_second_order_convergence_beats_ddim(rng):
    """At equal step count DPM++(2M) lands much closer to the true ODE
    solution (dense-grid limit) than DDIM, and converges monotonically.

    Measured on half-log-SNR-uniform grids (via the explicit-grid hook): on
    the production t-linspace grid the coarse-K error of BOTH solvers is
    dominated by the identical first-order terminal gap (last grid point
    ~last/K down to 0), which hides the multistep correction; uniform-lambda
    nodes expose the solver order itself. Measured here: DPM error 0.61x
    DDIM's at K=8 and 0.10x at K=16 (DDIM 996-step reference)."""
    schedule = make_schedule("squaredcos_cap_v2", 1000)
    f = _toy_x0_model(rng)
    x_init = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    ac = np.asarray(schedule.alphas_cumprod, np.float64)
    lam = 0.5 * (np.log(ac) - np.log1p(-ac))
    t_start = int(dpm_timesteps(schedule, 8)[0])  # same clipped start everywhere

    def grid_lam(k):
        levels = np.linspace(lam[t_start], lam[0], k)
        ts = np.interp(levels, lam[::-1], np.arange(len(lam), dtype=float)[::-1])
        ts = np.round(ts).astype(np.int64)
        ts[0], ts[-1] = t_start, 0
        assert np.all(np.diff(ts) < 0)
        return ts

    ref = _run_ddim(schedule, f, x_init, np.arange(t_start, -1, -1, dtype=np.int64))

    def err(x):
        return float(np.sqrt(np.mean((x - ref) ** 2)))

    e_dpm = {k: err(_run_dpm(schedule, f, x_init, grid_lam(k))) for k in (4, 8, 16)}
    e_ddim = {k: err(_run_ddim(schedule, f, x_init, grid_lam(k))) for k in (8, 16)}

    assert e_dpm[16] < e_dpm[8] < e_dpm[4]
    assert e_dpm[8] < 0.75 * e_ddim[8]
    assert e_dpm[16] < 0.25 * e_ddim[16]


def tiny_cfg(use_cond="NO_GUIDANCE", steps=4):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.TRAIN.USE_COND = use_cond
    cfg.GUIDANCE.USE_COND = use_cond
    cfg.EVAL.SCHEDULER = "dpm"
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
def test_dpm_sampler_integration(rng, use_cond):
    """EVAL.SCHEDULER="dpm" through the full fused sampler, every guidance
    mode — the reference's dead branch, live (same invariants as ddim/ddpm)."""
    cfg = tiny_cfg(use_cond)
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg))
    init = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((1, 2)), jnp.float32)
    trajs = np.asarray(sample(variables, init, image=img, target=target))
    assert trajs.shape == (1, 16, 7)
    assert np.isfinite(trajs).all()
    np.testing.assert_allclose(trajs[0, 0, :3], 0.0, atol=1e-6)
    assert np.abs(trajs[..., :2]).max() <= MAGIC_NUM + 1e-4
    assert np.abs(trajs[..., 2:]).max() <= 1.0 + 1e-5
    # deterministic ODE: bit-identical replans, no rng needed
    again = np.asarray(sample(variables, init, image=img, target=target))
    np.testing.assert_array_equal(trajs, again)


def test_dpm_explicit_grid_override(rng):
    """Distilled-style explicit grids drive the dpm solver too."""
    cfg = tiny_cfg("NO_GUIDANCE")
    cfg.TPU.SAMPLE_TIMESTEPS = [75, 50, 25, 0]
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule(cfg.TRAIN.NOISE_SCHEDULER.TYPE, cfg.TRAIN.SAMPLE_STEPS)
    sample = jax.jit(sampler_from_cfg(model, schedule, cfg))
    init = jnp.asarray(rng.standard_normal((1, 16, 7)), jnp.float32)
    out = np.asarray(sample(variables, init, image=img))
    assert out.shape == (1, 16, 7) and np.isfinite(out).all()


def test_scheduler_validation(rng):
    cfg = tiny_cfg("NO_GUIDANCE")
    model, variables, img = setup_model(cfg, rng)
    schedule = make_schedule("squaredcos_cap_v2", 100)
    with pytest.raises(ValueError, match="unknown scheduler"):
        make_sampler(model, schedule, SamplerConfig(scheduler="dppm"))
    with pytest.raises(ValueError, match="eta"):
        make_sampler(
            model,
            schedule,
            SamplerConfig(scheduler="dpm", num_steps=4, step=NOCLIP._replace(eta=0.5)),
        )
    with pytest.raises(ValueError, match="inpainting"):
        make_sampler(model, schedule, SamplerConfig(scheduler="dpm", num_steps=4, inpainting=True))
