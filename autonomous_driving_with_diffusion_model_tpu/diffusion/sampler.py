"""Fused trajectory samplers: the whole denoising loop as one ``lax.scan``.

This replaces the reference's per-step Python loop over scheduler objects
(reference: interact.py:115-168, e2e_driving/diffusion_agent.py:179-232,
train.py:53-103) with a single jitted XLA program per guidance mode:

* the perception encoder runs ONCE per plan (the reference re-runs ResNet-34
  every denoise step on the same image, temporal.py:203 — numerically
  identical for eval-mode BN, and the dominant latency win);
* all ``guidance`` / scheduler branches are Python-static;
* DDPM step noise is pre-generated outside the scan so reference-generated
  randoms can be injected for parity testing;
* the per-step anchor zeroing (trajs[:, 0, :3] = 0, interact.py:129/164) and
  the final clamp + meters scaling (interact.py:166-167) are fused in.

Set ``hoist_perception=False`` for a strict-reference execution mode that
re-encodes the image inside every scan step (parity audits).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.temporal_unet import TemporalMapUnet
from ..utils.constants import ANCHOR_DIMS, MAGIC_NUM, GuidanceType
from .dpm import dpm_coeffs, dpm_pp_2m_update, dpm_timesteps
from .guidance import make_guidance_fn
from .schedule import DiffusionSchedule, leading_timesteps
from .steps import (
    StepConfig,
    clip_or_threshold,
    ddim_step,
    ddim_variance,
    ddpm_step,
    ddpm_variance,
    inpaint_blend_ddim,
    inpaint_blend_ddpm,
    pred_x0_and_eps,
)

__all__ = ["SamplerConfig", "make_sampler", "sampler_from_cfg"]


class SamplerConfig(NamedTuple):
    guidance: GuidanceType = GuidanceType.NO_GUIDANCE
    scheduler: str = "ddim"  # "ddim" | "ddpm" | "dpm" (DPM-Solver++ 2M, diffusion/dpm.py)
    num_steps: int = 100
    step: StepConfig = StepConfig()
    free_scale: float = 1.0
    classifier_scale: float = 0.1
    guidance_step: int = 1
    loss_list: Optional[Sequence] = None
    hoist_perception: bool = True
    scale_to_meters: bool = True
    # RePaint-style inpainting (reference: scheduler/inpainting_*.py): blend a
    # known trajectory region (target_traj/target_mask passed at call time)
    # into every reverse step.
    inpainting: bool = False
    # lax.scan unroll factor: >1 fuses across denoise steps (cuts per-step
    # sequencing overhead at small batch; larger program / compile time)
    unroll: int = 1
    # explicit denoising grid (strictly-decreasing train-timestep indices),
    # overriding the diffusers "leading" spacing. prev timesteps are the next
    # grid entry (terminal: -1 -> final_alpha_cumprod). Used by progressively
    # distilled students (diffusion/distill.py), whose grids are exact
    # halvings of the teacher's and not reachable by leading spacing. A tuple
    # (not array) so SamplerConfig stays hashable.
    timesteps: Optional[Tuple[int, ...]] = None
    # "dpm" only: trim high-noise train timesteps whose half-log-SNR falls
    # below this before building the grid (the reference's hard-coded -5.1,
    # interact.py:92-93 — its "dpm" branch is a dead KeyError there).
    lambda_min_clipped: float = -5.1


def _anchor(trajs: jax.Array) -> jax.Array:
    """Zero the first waypoint's (x, y, yaw) (reference: interact.py:129,164)."""
    return trajs.at[:, 0, :ANCHOR_DIMS].set(0.0)


def make_sampler(
    model: TemporalMapUnet, schedule: DiffusionSchedule, cfg: SamplerConfig
) -> Callable:
    """Build the fused sampling function for one configuration.

    Returns ``sample(variables, init_trajs, image=None, img_feature=None,
    target=None, rng=None, noise_seq=None) -> trajs``:

    * ``init_trajs``  (B, H, D) starting noise (the reference reuses one fixed
      tensor across plans, interact.py:100/117 — callers decide).
    * ``image``       (B, h, w, 3) normalized NHWC camera image, or
      ``img_feature`` (B, dim) precomputed.
    * ``target``      (B, 2) ego-frame target point (FREE/CLASSIFIER only).
    * ``rng``/``noise_seq`` — DDPM step noise; ``noise_seq`` (S, B, H, D)
      overrides rng-generated noise for parity injection.
    """
    if cfg.scheduler not in ("ddim", "ddpm", "dpm"):
        raise ValueError(f"unknown scheduler {cfg.scheduler!r} (expected ddim | ddpm | dpm)")
    use_dpm = cfg.scheduler == "dpm"
    if use_dpm:
        if cfg.inpainting:
            raise ValueError("inpainting is DDPM/DDIM-only (like the reference)")
        if cfg.step.eta:
            raise ValueError("the dpm solver is a deterministic ODE solve; eta is unsupported")
    if cfg.timesteps is not None:
        ts_np = np.asarray(cfg.timesteps, np.int64)
        if ts_np.ndim != 1 or len(ts_np) == 0 or np.any(np.diff(ts_np) >= 0):
            raise ValueError(
                f"SamplerConfig.timesteps must be strictly decreasing, got {cfg.timesteps}"
            )
        if ts_np[0] >= schedule.num_train_timesteps or ts_np[-1] < 0:
            raise ValueError(
                f"timesteps out of [0, {schedule.num_train_timesteps}): {cfg.timesteps}"
            )
        prev_np = np.concatenate([ts_np[1:], [-1]])
        cfg = cfg._replace(num_steps=len(ts_np))
    elif use_dpm:
        ts_np = dpm_timesteps(schedule, cfg.num_steps, cfg.lambda_min_clipped)
        prev_np = np.concatenate([ts_np[1:], [-1]])
    else:
        ts_np, prev_np = leading_timesteps(schedule.num_train_timesteps, cfg.num_steps)
    ts = jnp.asarray(ts_np, jnp.int32)
    prev_ts = jnp.asarray(prev_np, jnp.int32)
    use_ddpm = cfg.scheduler == "ddpm"
    step_fn = ddpm_step if use_ddpm else ddim_step
    # classifier-guidance grad scale under "dpm" uses the eta=0 DDIM variance
    # (DPM++ shares DDIM's marginals; the solver itself is noise-free)
    var_fn = ddpm_variance if use_ddpm else ddim_variance
    if use_dpm:
        coeffs = dpm_coeffs(schedule, ts_np, prev_np)
    if cfg.inpainting:
        if cfg.guidance != GuidanceType.NO_GUIDANCE:
            raise ValueError("inpainting samplers have no guidance hook (like the reference)")
        blend_fn = inpaint_blend_ddpm if use_ddpm else inpaint_blend_ddim

    def sample(
        variables,
        init_trajs: jax.Array,
        image: Optional[jax.Array] = None,
        img_feature: Optional[jax.Array] = None,
        target: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        noise_seq: Optional[jax.Array] = None,
        target_traj: Optional[jax.Array] = None,
        target_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        B = init_trajs.shape[0]
        trajs = _anchor(init_trajs)

        if img_feature is None and cfg.hoist_perception:
            img_feature = model.apply(
                variables, image, train=False, method=TemporalMapUnet.encode_image
            )

        needs_noise = use_ddpm or cfg.step.eta > 0 or cfg.inpainting
        if needs_noise and noise_seq is None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            noise_seq = jax.random.normal(
                rng, (cfg.num_steps,) + trajs.shape, dtype=trajs.dtype
            )

        cfg_target = None
        if (
            cfg.guidance == GuidanceType.FREE_GUIDANCE
            and target is not None
            and cfg.free_scale != 1.0
        ):
            # dual batch: [target; zeros] (reference: interact.py:119-127)
            cfg_target = jnp.concatenate([target, jnp.zeros_like(target)], axis=0)

        def model_fwd(trajs, t):
            t_b = jnp.full((B,), t, jnp.float32)
            if (
                cfg.guidance == GuidanceType.FREE_GUIDANCE
                and target is not None
                and cfg.free_scale == 1.0
            ):
                # u + 1*(c - u) == c: statically skip the uncond pass — one
                # forward per step. This is the deployed operating point of
                # CFG-distilled students (diffusion/distill.py bakes w in).
                if cfg.hoist_perception:
                    return (
                        model.apply(
                            variables, trajs, time=t_b, cond=target,
                            img_feature=img_feature,
                        ),
                        None,
                    )
                return (
                    model.apply(variables, trajs, img=image, time=t_b, cond=target),
                    None,
                )
            if cfg.guidance == GuidanceType.FREE_GUIDANCE and cfg_target is not None:
                x2 = jnp.concatenate([trajs, trajs], axis=0)
                if cfg.hoist_perception:
                    out = model.apply(
                        variables, x2, time=t_b, cond=cfg_target, img_feature=img_feature
                    )
                else:
                    out = model.apply(variables, x2, img=image, time=t_b, cond=cfg_target)
                out_cond, out_uncond = jnp.split(out, 2, axis=0)
                return out_uncond + cfg.free_scale * (out_cond - out_uncond), None
            if cfg.guidance == GuidanceType.CLASSIFIER_GUIDANCE:
                if cfg.hoist_perception:
                    action, time_embed = model.apply(
                        variables,
                        trajs,
                        time=t_b,
                        img_feature=img_feature,
                        return_action_and_time_only=True,
                    )
                else:
                    action, time_embed = model.apply(
                        variables, trajs, img=image, time=t_b, return_action_and_time_only=True
                    )
                state = model.apply(
                    variables, action, time_embed, method=TemporalMapUnet.predict_state
                )
                return jnp.concatenate([state, action], axis=-1), (action, time_embed)
            if cfg.hoist_perception:
                return model.apply(variables, trajs, time=t_b, img_feature=img_feature), None
            return model.apply(variables, trajs, img=image, time=t_b), None

        def guided_model_output(trajs, t, prev_t):
            model_output, aux = model_fwd(trajs, t)
            if cfg.guidance == GuidanceType.CLASSIFIER_GUIDANCE and target is not None:
                action, time_embed = aux
                # guidance math (autograd + scaled descent, guidance.py) runs
                # in fp32 even when the model computes in bf16 — like all
                # scheduler math here
                action = action.astype(jnp.float32)
                model_output = model_output.astype(jnp.float32)
                variance = var_fn(schedule, t, prev_t)
                grad_scale = jnp.exp(0.5 * variance)

                def state_pred_fn(a):
                    return model.apply(
                        variables, a, time_embed, method=TemporalMapUnet.predict_state
                    )

                guide_fn = make_guidance_fn(
                    cfg.loss_list, cfg.classifier_scale, cfg.guidance_step, state_pred_fn
                )
                model_output = guide_fn(model_output, action, target, grad_scale)
            return model_output

        def dpm_body(carry, xs):
            # multistep: carry the previous step's (clipped) x0 prediction
            trajs, prev_x0 = carry
            t, prev_t, sigma_ratio, phi, inv_r = xs
            model_output = guided_model_output(trajs, t, prev_t)
            pred_x0, _ = pred_x0_and_eps(cfg.step, model_output, trajs, schedule.alpha_prod(t))
            pred_x0 = clip_or_threshold(cfg.step, pred_x0).astype(jnp.float32)
            trajs = dpm_pp_2m_update(trajs, pred_x0, prev_x0, sigma_ratio, phi, inv_r)
            return (_anchor(trajs), pred_x0), None

        def body(trajs, xs):
            if needs_noise:
                t, prev_t, noise = xs
            else:
                t, prev_t = xs
                noise = None
            model_output = guided_model_output(trajs, t, prev_t)

            if cfg.inpainting:
                trajs, _ = blend_fn(
                    schedule,
                    cfg.step,
                    model_output,
                    t,
                    prev_t,
                    trajs,
                    noise,
                    target_traj=target_traj,
                    target_mask=target_mask,
                )
            else:
                trajs, _ = step_fn(schedule, cfg.step, model_output, t, prev_t, trajs, noise)
            return _anchor(trajs), None

        if use_dpm:
            trajs = trajs.astype(jnp.float32)
            xs = (ts, prev_ts, coeffs.sigma_ratio, coeffs.phi, coeffs.inv_r)
            (trajs, _), _ = jax.lax.scan(
                dpm_body, (trajs, jnp.zeros_like(trajs)), xs, unroll=cfg.unroll
            )
        else:
            xs = (ts, prev_ts, noise_seq) if needs_noise else (ts, prev_ts)
            trajs, _ = jax.lax.scan(body, trajs, xs, unroll=cfg.unroll)

        trajs = jnp.clip(trajs.astype(jnp.float32), -1.0, 1.0)
        if cfg.scale_to_meters:
            trajs = trajs.at[..., :2].multiply(MAGIC_NUM)
        return trajs

    return sample


def sampler_from_cfg(model, schedule, cfg, *, for_training_eval: bool = False) -> Callable:
    """Build the sampler matching a framework config.

    ``for_training_eval=True`` reproduces ``train.evaluate`` (train.py:53-103):
    training DDPM scheduler (clip_sample, no thresholding), TRAIN.TIME_STEPS
    steps, no conditioning, and no meters scaling. Otherwise mirrors the
    closed-loop agents' scheduler construction (interact.py:81-94:
    thresholding=True, EVAL.SCHEDULER, EVAL.SAMPLE_STEPS).
    """
    if for_training_eval:
        scfg = SamplerConfig(
            guidance=GuidanceType.NO_GUIDANCE,
            scheduler="ddpm",
            num_steps=cfg.TRAIN.TIME_STEPS,
            step=StepConfig(
                prediction_type=cfg.TRAIN.NOISE_SCHEDULER.PRED_TYPE,
                clip_sample=True,
                thresholding=False,
            ),
            hoist_perception=bool(cfg.TPU.HOIST_PERCEPTION),
            scale_to_meters=False,
            unroll=int(cfg.TPU.SCAN_UNROLL),
        )
    else:
        grid = tuple(int(t) for t in cfg.TPU.SAMPLE_TIMESTEPS) or None
        scfg = SamplerConfig(
            guidance=GuidanceType[cfg.GUIDANCE.USE_COND],
            scheduler=cfg.EVAL.SCHEDULER,
            num_steps=cfg.EVAL.SAMPLE_STEPS,
            timesteps=grid,
            step=StepConfig(
                prediction_type=cfg.TRAIN.NOISE_SCHEDULER.PRED_TYPE,
                clip_sample=True,
                thresholding=True,
            ),
            free_scale=cfg.GUIDANCE.FREE_SCALE,
            classifier_scale=cfg.GUIDANCE.CLASSIFIER_SCALE,
            guidance_step=cfg.GUIDANCE.STEP,
            loss_list=cfg.GUIDANCE.LOSS_LIST,
            hoist_perception=bool(cfg.TPU.HOIST_PERCEPTION),
            scale_to_meters=True,
            unroll=int(cfg.TPU.SCAN_UNROLL),
        )
    return make_sampler(model, schedule, scfg)
