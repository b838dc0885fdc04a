"""Minimal diffusers-0.28.0 stub so the REFERENCE's own scheduler subclasses
(/root/reference/scheduler/*.py) instantiate and run under torch as parity
oracles.

The reference pins diffusers==0.28.0 (reference requirements.txt:2) but only
uses a thin slice of the base-class surface from its four scheduler
subclasses:

- ``DDIMScheduler`` / ``DDPMScheduler`` construction (betas for
  linear / scaled_linear / squaredcos_cap_v2, ``alphas_cumprod``,
  ``final_alpha_cumprod`` / ``one``), ``config`` attribute access
- ``set_timesteps`` ("leading" — the diffusers default and the only
  spacing the reference uses; other spacings raise NotImplementedError so
  the stub can never silently diverge from 0.28.0 semantics)
- ``_get_variance`` (DDIM 2-arg form; DDPM 1-arg form with variance_type
  branches), ``previous_timestep`` (DDPM)
- ``_threshold_sample`` on the base class (the Inpainting* subclasses call it
  without overriding; the Guidance* subclasses override it)
- ``add_noise``, ``DDIMSchedulerOutput`` / ``DDPMSchedulerOutput``,
  ``diffusers.utils.torch_utils.randn_tensor``

Everything here is re-derived from the published diffusers-0.28.0 semantics
(scheduling_ddim.py / scheduling_ddpm.py), NOT copied from the reference repo.
If a real ``diffusers`` package is importable it is used instead of the stub.

Usage from tests::

    from diffusers_stub import load_reference_schedulers
    sched_mod = load_reference_schedulers()   # the reference's `scheduler` pkg
    oracle = sched_mod.GuidanceDDIMScheduler(cfg, num_train_timesteps=100, ...)
"""

from __future__ import annotations

import math
import sys
import types
from dataclasses import dataclass
from typing import Optional

import numpy as np

REF = "/root/reference"


# ---------------------------------------------------------------------------
# stub construction (torch imported lazily so importing this module is cheap)
# ---------------------------------------------------------------------------


def _build_stub_modules():
    import torch

    class _Config:
        """Attribute bag mirroring diffusers' FrozenDict config access."""

        def __init__(self, **kwargs):
            self.__dict__.update(kwargs)

        def __repr__(self):  # pragma: no cover - debug aid
            return f"_Config({self.__dict__})"

    @dataclass
    class DDIMSchedulerOutput:
        prev_sample: "torch.Tensor"
        pred_original_sample: Optional["torch.Tensor"] = None

    @dataclass
    class DDPMSchedulerOutput:
        prev_sample: "torch.Tensor"
        pred_original_sample: Optional["torch.Tensor"] = None

    def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
        return torch.randn(shape, generator=generator, dtype=dtype)

    def betas_for_alpha_bar(num_diffusion_timesteps, max_beta=0.999):
        def alpha_bar_fn(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = []
        for i in range(num_diffusion_timesteps):
            t1 = i / num_diffusion_timesteps
            t2 = (i + 1) / num_diffusion_timesteps
            betas.append(min(1 - alpha_bar_fn(t2) / alpha_bar_fn(t1), max_beta))
        return torch.tensor(betas, dtype=torch.float32)

    def _make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule, trained_betas):
        if trained_betas is not None:
            return torch.tensor(trained_betas, dtype=torch.float32)
        if beta_schedule == "linear":
            return torch.linspace(beta_start, beta_end, num_train_timesteps, dtype=torch.float32)
        if beta_schedule == "scaled_linear":
            return (
                torch.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=torch.float32
                )
                ** 2
            )
        if beta_schedule == "squaredcos_cap_v2":
            return betas_for_alpha_bar(num_train_timesteps)
        raise NotImplementedError(f"{beta_schedule} is not implemented in the stub")

    class _SchedulerBase:
        """Shared pieces of diffusers' SchedulerMixin/ConfigMixin surface."""

        def _threshold_sample(self, sample):
            # diffusers-0.28.0 dynamic thresholding (Imagen, 2205.11487)
            dtype = sample.dtype
            batch_size, channels, *remaining_dims = sample.shape
            if dtype not in (torch.float32, torch.float64):
                sample = sample.float()
            sample = sample.reshape(batch_size, channels * int(np.prod(remaining_dims)))
            abs_sample = sample.abs()
            s = torch.quantile(abs_sample, self.config.dynamic_thresholding_ratio, dim=1)
            s = torch.clamp(s, min=1, max=self.config.sample_max_value)
            s = s.unsqueeze(1)
            sample = torch.clamp(sample, -s, s) / s
            sample = sample.reshape(batch_size, channels, *remaining_dims)
            return sample.to(dtype)

        def add_noise(self, original_samples, noise, timesteps):
            alphas_cumprod = self.alphas_cumprod.to(dtype=original_samples.dtype)
            sqrt_alpha_prod = alphas_cumprod[timesteps] ** 0.5
            sqrt_alpha_prod = sqrt_alpha_prod.flatten()
            while len(sqrt_alpha_prod.shape) < len(original_samples.shape):
                sqrt_alpha_prod = sqrt_alpha_prod.unsqueeze(-1)
            sqrt_one_minus_alpha_prod = (1 - alphas_cumprod[timesteps]) ** 0.5
            sqrt_one_minus_alpha_prod = sqrt_one_minus_alpha_prod.flatten()
            while len(sqrt_one_minus_alpha_prod.shape) < len(original_samples.shape):
                sqrt_one_minus_alpha_prod = sqrt_one_minus_alpha_prod.unsqueeze(-1)
            return sqrt_alpha_prod * original_samples + sqrt_one_minus_alpha_prod * noise

        def scale_model_input(self, sample, timestep=None):
            return sample

        def __len__(self):
            return self.config.num_train_timesteps

    class DDIMScheduler(_SchedulerBase):
        def __init__(
            self,
            num_train_timesteps: int = 1000,
            beta_start: float = 0.0001,
            beta_end: float = 0.02,
            beta_schedule: str = "linear",
            trained_betas=None,
            clip_sample: bool = True,
            set_alpha_to_one: bool = True,
            steps_offset: int = 0,
            prediction_type: str = "epsilon",
            thresholding: bool = False,
            dynamic_thresholding_ratio: float = 0.995,
            clip_sample_range: float = 1.0,
            sample_max_value: float = 1.0,
            timestep_spacing: str = "leading",
            rescale_betas_zero_snr: bool = False,
        ):
            if rescale_betas_zero_snr:
                raise NotImplementedError("rescale_betas_zero_snr not in the stub")
            self.config = _Config(
                num_train_timesteps=num_train_timesteps,
                beta_start=beta_start,
                beta_end=beta_end,
                beta_schedule=beta_schedule,
                clip_sample=clip_sample,
                set_alpha_to_one=set_alpha_to_one,
                steps_offset=steps_offset,
                prediction_type=prediction_type,
                thresholding=thresholding,
                dynamic_thresholding_ratio=dynamic_thresholding_ratio,
                clip_sample_range=clip_sample_range,
                sample_max_value=sample_max_value,
                timestep_spacing=timestep_spacing,
            )
            self.betas = _make_betas(
                num_train_timesteps, beta_start, beta_end, beta_schedule, trained_betas
            )
            self.alphas = 1.0 - self.betas
            self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
            self.final_alpha_cumprod = (
                torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
            )
            self.init_noise_sigma = 1.0
            self.num_inference_steps = None
            self.timesteps = torch.from_numpy(
                np.arange(0, num_train_timesteps)[::-1].copy().astype(np.int64)
            )

        def set_timesteps(self, num_inference_steps: int, device=None):
            if num_inference_steps > self.config.num_train_timesteps:
                raise ValueError("num_inference_steps > num_train_timesteps")
            self.num_inference_steps = num_inference_steps
            spacing = self.config.timestep_spacing
            if spacing != "leading":
                # only the diffusers default the reference uses is
                # implemented faithfully; other spacings would silently
                # diverge from 0.28.0 semantics in previous_timestep
                raise NotImplementedError(f"timestep_spacing {spacing} not in the stub")
            step_ratio = self.config.num_train_timesteps // self.num_inference_steps
            timesteps = (
                (np.arange(0, num_inference_steps) * step_ratio)
                .round()[::-1]
                .copy()
                .astype(np.int64)
            )
            timesteps += self.config.steps_offset
            self.timesteps = torch.from_numpy(timesteps)

        def _get_variance(self, timestep, prev_timestep):
            alpha_prod_t = self.alphas_cumprod[timestep]
            alpha_prod_t_prev = (
                self.alphas_cumprod[prev_timestep]
                if prev_timestep >= 0
                else self.final_alpha_cumprod
            )
            beta_prod_t = 1 - alpha_prod_t
            beta_prod_t_prev = 1 - alpha_prod_t_prev
            return (beta_prod_t_prev / beta_prod_t) * (1 - alpha_prod_t / alpha_prod_t_prev)

    class DDPMScheduler(_SchedulerBase):
        def __init__(
            self,
            num_train_timesteps: int = 1000,
            beta_start: float = 0.0001,
            beta_end: float = 0.02,
            beta_schedule: str = "linear",
            trained_betas=None,
            variance_type: str = "fixed_small",
            clip_sample: bool = True,
            prediction_type: str = "epsilon",
            thresholding: bool = False,
            dynamic_thresholding_ratio: float = 0.995,
            clip_sample_range: float = 1.0,
            sample_max_value: float = 1.0,
            timestep_spacing: str = "leading",
            steps_offset: int = 0,
            rescale_betas_zero_snr: bool = False,
        ):
            if rescale_betas_zero_snr:
                raise NotImplementedError("rescale_betas_zero_snr not in the stub")
            self.config = _Config(
                num_train_timesteps=num_train_timesteps,
                beta_start=beta_start,
                beta_end=beta_end,
                beta_schedule=beta_schedule,
                variance_type=variance_type,
                clip_sample=clip_sample,
                prediction_type=prediction_type,
                thresholding=thresholding,
                dynamic_thresholding_ratio=dynamic_thresholding_ratio,
                clip_sample_range=clip_sample_range,
                sample_max_value=sample_max_value,
                timestep_spacing=timestep_spacing,
                steps_offset=steps_offset,
            )
            self.betas = _make_betas(
                num_train_timesteps, beta_start, beta_end, beta_schedule, trained_betas
            )
            self.alphas = 1.0 - self.betas
            self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
            self.one = torch.tensor(1.0)
            self.init_noise_sigma = 1.0
            self.custom_timesteps = False
            self.num_inference_steps = None
            self.timesteps = torch.from_numpy(np.arange(0, num_train_timesteps)[::-1].copy())
            self.variance_type = variance_type

        def set_timesteps(self, num_inference_steps=None, device=None, timesteps=None):
            if num_inference_steps is not None and timesteps is not None:
                raise ValueError("pass exactly one of num_inference_steps / timesteps")
            if timesteps is not None:
                self.custom_timesteps = True
                self.num_inference_steps = len(timesteps)
                self.timesteps = torch.tensor(timesteps, dtype=torch.int64)
                return
            if num_inference_steps > self.config.num_train_timesteps:
                raise ValueError("num_inference_steps > num_train_timesteps")
            self.num_inference_steps = num_inference_steps
            self.custom_timesteps = False
            spacing = self.config.timestep_spacing
            if spacing != "leading":
                raise NotImplementedError(f"timestep_spacing {spacing} not in the stub")
            step_ratio = self.config.num_train_timesteps // self.num_inference_steps
            ts = (
                (np.arange(0, num_inference_steps) * step_ratio)
                .round()[::-1]
                .copy()
                .astype(np.int64)
            )
            ts += self.config.steps_offset
            self.timesteps = torch.from_numpy(ts)

        def previous_timestep(self, timestep):
            if self.custom_timesteps or self.num_inference_steps:
                index = (self.timesteps == timestep).nonzero(as_tuple=True)[0][0]
                if index == self.timesteps.shape[0] - 1:
                    prev_t = torch.tensor(-1)
                else:
                    prev_t = self.timesteps[index + 1]
            else:
                prev_t = timestep - 1
            return prev_t

        def _get_variance(self, t, predicted_variance=None, variance_type=None):
            prev_t = self.previous_timestep(t)
            alpha_prod_t = self.alphas_cumprod[t]
            alpha_prod_t_prev = self.alphas_cumprod[prev_t] if prev_t >= 0 else self.one
            current_beta_t = 1 - alpha_prod_t / alpha_prod_t_prev
            variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * current_beta_t
            variance = torch.clamp(variance, min=1e-20)
            if variance_type is None:
                variance_type = self.config.variance_type
            if variance_type == "fixed_small":
                pass
            elif variance_type == "fixed_small_log":
                variance = torch.log(variance)
                variance = torch.exp(0.5 * variance)
            elif variance_type == "fixed_large":
                variance = current_beta_t
            elif variance_type == "fixed_large_log":
                variance = torch.log(current_beta_t)
            elif variance_type == "learned":
                return predicted_variance
            elif variance_type == "learned_range":
                min_log = torch.log(variance)
                max_log = torch.log(current_beta_t)
                frac = (predicted_variance + 1) / 2
                variance = frac * max_log + (1 - frac) * min_log
            return variance

    root = types.ModuleType("diffusers")
    schedulers = types.ModuleType("diffusers.schedulers")
    scheduling_ddim = types.ModuleType("diffusers.schedulers.scheduling_ddim")
    scheduling_ddpm = types.ModuleType("diffusers.schedulers.scheduling_ddpm")
    utils = types.ModuleType("diffusers.utils")
    torch_utils = types.ModuleType("diffusers.utils.torch_utils")

    scheduling_ddim.DDIMScheduler = DDIMScheduler
    scheduling_ddim.DDIMSchedulerOutput = DDIMSchedulerOutput
    scheduling_ddpm.DDPMScheduler = DDPMScheduler
    scheduling_ddpm.DDPMSchedulerOutput = DDPMSchedulerOutput
    schedulers.DDIMScheduler = DDIMScheduler
    schedulers.DDPMScheduler = DDPMScheduler
    schedulers.scheduling_ddim = scheduling_ddim
    schedulers.scheduling_ddpm = scheduling_ddpm
    torch_utils.randn_tensor = randn_tensor
    utils.torch_utils = torch_utils
    root.DDIMScheduler = DDIMScheduler
    root.DDPMScheduler = DDPMScheduler
    root.schedulers = schedulers
    root.utils = utils
    root.__version__ = "0.28.0-stub"
    root.__stub__ = True

    return {
        "diffusers": root,
        "diffusers.schedulers": schedulers,
        "diffusers.schedulers.scheduling_ddim": scheduling_ddim,
        "diffusers.schedulers.scheduling_ddpm": scheduling_ddpm,
        "diffusers.utils": utils,
        "diffusers.utils.torch_utils": torch_utils,
    }


def install():
    """Register the stub under ``diffusers`` in sys.modules (no-op if the real
    package is importable)."""
    try:
        import diffusers  # noqa: F401

        return False
    except ImportError:
        pass
    for name, mod in _build_stub_modules().items():
        sys.modules[name] = mod
    return True


def load_reference_schedulers():
    """Import and return the reference's ``scheduler`` package with the stub
    (or real diffusers) providing the base classes."""
    install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import scheduler as ref_scheduler  # the reference package

    # Latent reference bug: guidance_ddpm_scheduler.py uses `np` in
    # _threshold_sample without importing numpy (SURVEY.md Appendix C.1).
    # Inject the name so the thresholding path is runnable as an oracle --
    # with a correct numpy this is exactly what the code intends.
    import scheduler.guidance_ddpm_scheduler as gddpm

    if not hasattr(gddpm, "np"):
        gddpm.np = np
    return ref_scheduler
