from .distill import (
    DistillGrid,
    DistillState,
    grid_chain,
    halve_grid,
    implied_x0_target,
    initial_grid,
    make_distill_step,
)
from .dpm import DPMCoeffs, dpm_coeffs, dpm_pp_2m_update, dpm_timesteps
from .guidance import GUIDANCE_LOSSES, make_guidance_fn, target_guidance_loss
from .sampler import SamplerConfig, make_sampler, sampler_from_cfg
from .schedule import (
    DiffusionSchedule,
    add_noise,
    compute_betas,
    leading_timesteps,
    make_schedule,
    make_schedule_from_cfg,
)
from .steps import (
    StepConfig,
    ddim_step,
    ddim_variance,
    ddpm_step,
    ddpm_variance,
    dynamic_threshold,
    inpaint_blend_ddim,
    inpaint_blend_ddpm,
)

# scheduler registry (reference: scheduler/__init__.py + the SCHEDULER_FUNC
# maps at interact.py:22-25 / diffusion_agent.py:29-32). The reference also
# configures a "dpm" scheduler (interact.py:92-93) that its map lacks — a dead
# KeyError there; here EVAL.SCHEDULER="dpm" is a real DPM-Solver++(2M) path
# (diffusion/dpm.py), dispatched inside make_sampler because its multistep
# update carries x0 history and does not fit the single-step signature.
SCHEDULER_FUNC = {"ddpm": ddpm_step, "ddim": ddim_step, "dpm": dpm_pp_2m_update}
INPAINTING_SCHEDULER_FUNC = {"ddpm": inpaint_blend_ddpm, "ddim": inpaint_blend_ddim}

__all__ = [
    "SCHEDULER_FUNC",
    "INPAINTING_SCHEDULER_FUNC",
    "DiffusionSchedule",
    "make_schedule",
    "make_schedule_from_cfg",
    "compute_betas",
    "leading_timesteps",
    "add_noise",
    "StepConfig",
    "DPMCoeffs",
    "dpm_timesteps",
    "dpm_coeffs",
    "dpm_pp_2m_update",
    "ddpm_step",
    "ddim_step",
    "ddpm_variance",
    "ddim_variance",
    "dynamic_threshold",
    "inpaint_blend_ddpm",
    "inpaint_blend_ddim",
    "target_guidance_loss",
    "make_guidance_fn",
    "GUIDANCE_LOSSES",
    "SamplerConfig",
    "make_sampler",
    "sampler_from_cfg",
    "DistillGrid",
    "DistillState",
    "grid_chain",
    "halve_grid",
    "initial_grid",
    "implied_x0_target",
    "make_distill_step",
]
