"""Pure-function DDPM/DDIM reverse steps with guidance and inpainting variants.

Re-implements the four reference schedulers as jit-safe step functions over
precomputed tables (reference: scheduler/guidance_ddpm_scheduler.py:59-178,
scheduler/guidance_ddim_scheduler.py:60-173, scheduler/inpainting_*.py).
Every branch (prediction type, clip/threshold mode, inpainting) is selected in
Python at trace time, so each configuration compiles to a single fused kernel
inside the sampling scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule

__all__ = [
    "StepConfig",
    "dynamic_threshold",
    "clip_or_threshold",
    "pred_x0_and_eps",
    "ddpm_variance",
    "ddim_variance",
    "ddpm_step",
    "ddim_step",
    "inpaint_blend_ddpm",
    "inpaint_blend_ddim",
]


class StepConfig(NamedTuple):
    """Static scheduler options (mirrors the diffusers config surface used by
    the reference; defaults match diffusers==0.28.0)."""

    prediction_type: str = "sample"  # "epsilon" | "sample" | "v_prediction"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    eta: float = 0.0  # DDIM only


def dynamic_threshold(sample: jax.Array, ratio: float, max_value: float) -> jax.Array:
    """Imagen dynamic thresholding (reference: guidance_ddim_scheduler.py:23-58).

    Per-sample quantile of |x| over all non-batch dims; clamp to [-s, s] / s
    with s in [1, max_value].
    """
    b = sample.shape[0]
    flat = jnp.abs(sample.reshape(b, -1)).astype(jnp.float32)
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value)
    s = s.reshape((b,) + (1,) * (sample.ndim - 1))
    return (jnp.clip(sample, -s, s) / s).astype(sample.dtype)


def pred_x0_and_eps(
    cfg: StepConfig,
    model_output: jax.Array,
    sample: jax.Array,
    alpha_prod_t: jax.Array,
):
    """Recover (pred_x0, pred_eps) per prediction type (DDIM formula 12)."""
    beta_prod_t = 1.0 - alpha_prod_t
    sa, sb = jnp.sqrt(alpha_prod_t), jnp.sqrt(beta_prod_t)
    if cfg.prediction_type == "epsilon":
        pred_x0 = (sample - sb * model_output) / sa
        pred_eps = model_output
    elif cfg.prediction_type == "sample":
        pred_x0 = model_output
        pred_eps = (sample - sa * pred_x0) / sb
    elif cfg.prediction_type == "v_prediction":
        pred_x0 = sa * sample - sb * model_output
        pred_eps = sa * model_output + sb * sample
    else:
        raise ValueError(f"prediction_type {cfg.prediction_type}")
    return pred_x0, pred_eps


def clip_or_threshold(cfg: StepConfig, pred_x0: jax.Array) -> jax.Array:
    """Apply the configured x0 post-processing (threshold wins over clip)."""
    if cfg.thresholding:
        return dynamic_threshold(pred_x0, cfg.dynamic_thresholding_ratio, cfg.sample_max_value)
    if cfg.clip_sample:
        return jnp.clip(pred_x0, -cfg.clip_sample_range, cfg.clip_sample_range)
    return pred_x0


def ddpm_variance(schedule: DiffusionSchedule, t: jax.Array, prev_t: jax.Array) -> jax.Array:
    """fixed_small posterior variance, clamped at 1e-20 (diffusers _get_variance)."""
    ap_t = schedule.alpha_prod(t)
    ap_prev = jnp.where(prev_t >= 0, schedule.alpha_prod_prev(prev_t), 1.0)
    current_beta_t = 1.0 - ap_t / ap_prev
    variance = (1.0 - ap_prev) / (1.0 - ap_t) * current_beta_t
    return jnp.maximum(variance, 1e-20)


def ddim_variance(schedule: DiffusionSchedule, t: jax.Array, prev_t: jax.Array) -> jax.Array:
    ap_t = schedule.alpha_prod(t)
    ap_prev = schedule.alpha_prod_prev(prev_t)
    beta_t = 1.0 - ap_t
    beta_prev = 1.0 - ap_prev
    return (beta_prev / beta_t) * (1.0 - ap_t / ap_prev)


def ddpm_step(
    schedule: DiffusionSchedule,
    cfg: StepConfig,
    model_output: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    sample: jax.Array,
    noise: Optional[jax.Array] = None,
):
    """One reverse DDPM step (reference: guidance_ddpm_scheduler.py:101-178).

    ``noise`` is the externally supplied standard normal used when t > 0 —
    externalized so reference-generated randoms can be injected for parity
    tests. Returns (prev_sample, pred_x0).
    """
    ap_t = schedule.alpha_prod(t)
    ap_prev = jnp.where(prev_t >= 0, schedule.alpha_prod_prev(prev_t), 1.0)
    beta_prod_t = 1.0 - ap_t
    beta_prod_prev = 1.0 - ap_prev
    current_alpha_t = ap_t / ap_prev
    current_beta_t = 1.0 - current_alpha_t

    pred_x0, _ = pred_x0_and_eps(cfg, model_output, sample, ap_t)
    pred_x0 = clip_or_threshold(cfg, pred_x0)

    x0_coeff = jnp.sqrt(ap_prev) * current_beta_t / beta_prod_t
    xt_coeff = jnp.sqrt(current_alpha_t) * beta_prod_prev / beta_prod_t
    prev_sample = x0_coeff * pred_x0 + xt_coeff * sample

    if noise is not None:
        variance = ddpm_variance(schedule, t, prev_t)
        prev_sample = prev_sample + jnp.where(t > 0, jnp.sqrt(variance), 0.0) * noise
    return prev_sample, pred_x0


def ddim_step(
    schedule: DiffusionSchedule,
    cfg: StepConfig,
    model_output: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    sample: jax.Array,
    noise: Optional[jax.Array] = None,
    use_clipped_model_output: bool = False,
):
    """One reverse DDIM step (reference: guidance_ddim_scheduler.py:94-173).

    eta=0 (the reference never passes eta; config EVAL.ETA is dead —
    SURVEY.md Appendix C.10) makes this deterministic; eta > 0 adds
    ``eta * sqrt(variance) * noise``.
    """
    ap_t = schedule.alpha_prod(t)
    ap_prev = schedule.alpha_prod_prev(prev_t)
    beta_prod_t = 1.0 - ap_t

    pred_x0, pred_eps = pred_x0_and_eps(cfg, model_output, sample, ap_t)
    pred_x0 = clip_or_threshold(cfg, pred_x0)

    variance = ddim_variance(schedule, t, prev_t)
    std_dev_t = cfg.eta * jnp.sqrt(variance)

    if use_clipped_model_output:
        pred_eps = (sample - jnp.sqrt(ap_t) * pred_x0) / jnp.sqrt(beta_prod_t)

    direction = jnp.sqrt(1.0 - ap_prev - std_dev_t**2) * pred_eps
    prev_sample = jnp.sqrt(ap_prev) * pred_x0 + direction
    if cfg.eta > 0 and noise is not None:
        prev_sample = prev_sample + std_dev_t * noise
    return prev_sample, pred_x0


def inpaint_blend_ddpm(
    schedule: DiffusionSchedule,
    cfg: StepConfig,
    model_output: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    sample: jax.Array,
    noise: jax.Array,
    target_traj: Optional[jax.Array] = None,
    target_mask: Optional[jax.Array] = None,
):
    """RePaint-style DDPM step (reference: inpainting_ddpm_scheduler.py:10-146).

    Known region is re-noised from ``target_traj`` (RePaint Alg.1 line 5),
    unknown region takes the posterior step (line 8); blended by
    ``target_mask`` (1 = known).
    """
    ap_t = schedule.alpha_prod(t)
    ap_prev = jnp.where(prev_t >= 0, schedule.alpha_prod_prev(prev_t), 1.0)
    beta_prod_t = 1.0 - ap_t
    beta_prod_prev = 1.0 - ap_prev
    current_alpha_t = ap_t / ap_prev
    current_beta_t = 1.0 - current_alpha_t

    pred_x0, _ = pred_x0_and_eps(cfg, model_output, sample, ap_t)
    pred_x0 = clip_or_threshold(cfg, pred_x0)

    x0_coeff = jnp.sqrt(ap_prev) * current_beta_t / beta_prod_t
    xt_coeff = jnp.sqrt(current_alpha_t) * beta_prod_prev / beta_prod_t

    std_dev_t = jnp.sqrt(ddpm_variance(schedule, t, prev_t))
    variance = jnp.where(t > 0, std_dev_t, 0.0) * noise

    prev_unknown = x0_coeff * pred_x0 + xt_coeff * sample + variance
    if target_traj is None or target_mask is None:
        return prev_unknown, pred_x0
    prev_known = jnp.sqrt(ap_prev) * target_traj + jnp.sqrt(1.0 - ap_prev) * jnp.where(
        t > 0, noise, 0.0
    )
    prev_sample = target_mask * prev_known + (1.0 - target_mask) * prev_unknown
    return prev_sample, pred_x0


def inpaint_blend_ddim(
    schedule: DiffusionSchedule,
    cfg: StepConfig,
    model_output: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    sample: jax.Array,
    noise: jax.Array,
    target_traj: Optional[jax.Array] = None,
    target_mask: Optional[jax.Array] = None,
    strict_reference: bool = True,
):
    """RePaint-style DDIM step (reference: inpainting_ddim_scheduler.py:10-153).

    ``strict_reference=True`` reproduces the reference exactly, including its
    quirk of adding the scalar ``variance`` value to the update
    (inpainting_ddim_scheduler.py:109-128 adds ``_get_variance`` itself, not
    eta-scaled noise); ``False`` gives the textbook eta=0 DDIM update.
    """
    ap_t = schedule.alpha_prod(t)
    ap_prev = schedule.alpha_prod_prev(prev_t)
    beta_prod_t = 1.0 - ap_t

    pred_x0, pred_eps = pred_x0_and_eps(cfg, model_output, sample, ap_t)
    pred_x0 = clip_or_threshold(cfg, pred_x0)

    variance = ddim_variance(schedule, t, prev_t)
    std_dev_t = cfg.eta * jnp.sqrt(variance)
    direction = jnp.sqrt(1.0 - ap_prev - std_dev_t**2) * pred_eps

    extra = variance if strict_reference else 0.0
    prev_unknown = jnp.sqrt(ap_prev) * pred_x0 + direction + extra
    if target_traj is None or target_mask is None:
        return prev_unknown, pred_x0
    prev_known = jnp.sqrt(ap_prev) * target_traj + jnp.sqrt(1.0 - ap_prev) * jnp.where(
        t > 0, noise, 0.0
    )
    prev_sample = target_mask * prev_known + (1.0 - target_mask) * prev_unknown
    return prev_sample, pred_x0
