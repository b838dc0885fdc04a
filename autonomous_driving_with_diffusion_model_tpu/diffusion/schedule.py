"""Diffusion noise schedules and timestep tables.

Reproduces the scheduler math of diffusers==0.28.0 (the version the reference
pins, requirements.txt) as precomputed jnp tables + pure functions, so the
whole denoising loop fuses into one XLA program. Reference construction sites:
train.py:137-144 (training DDPM), interact.py:81-94 (guided eval schedulers).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DiffusionSchedule", "make_schedule", "leading_timesteps", "add_noise"]


def _betas_squaredcos_cap_v2(num_steps: int) -> np.ndarray:
    """Cosine alpha-bar schedule, beta capped at 0.999 (diffusers betas_for_alpha_bar)."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
    return np.asarray(betas, dtype=np.float64)


def compute_betas(
    schedule_type: str, num_steps: int, beta_start: float = 1e-4, beta_end: float = 0.02
) -> np.ndarray:
    if schedule_type == "linear":
        return np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    if schedule_type == "scaled_linear":
        return np.linspace(beta_start**0.5, beta_end**0.5, num_steps, dtype=np.float64) ** 2
    if schedule_type == "squaredcos_cap_v2":
        return _betas_squaredcos_cap_v2(num_steps)
    raise ValueError(f"Unknown beta schedule: {schedule_type}")


class DiffusionSchedule(NamedTuple):
    """Immutable schedule tables (all float32 jnp arrays)."""

    betas: jax.Array  # (T,)
    alphas_cumprod: jax.Array  # (T,)
    final_alpha_cumprod: jax.Array  # () — DDIM set_alpha_to_one=True => 1.0
    num_train_timesteps: int

    def alpha_prod(self, t: jax.Array) -> jax.Array:
        return jnp.take(self.alphas_cumprod, t)

    def alpha_prod_prev(self, prev_t: jax.Array) -> jax.Array:
        """alphas_cumprod[prev_t] with the prev_t < 0 -> final/one fallback."""
        safe = jnp.take(self.alphas_cumprod, jnp.maximum(prev_t, 0))
        return jnp.where(prev_t >= 0, safe, self.final_alpha_cumprod)


def make_schedule(
    schedule_type: str = "squaredcos_cap_v2",
    num_train_timesteps: int = 100,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> DiffusionSchedule:
    betas = compute_betas(schedule_type, num_train_timesteps, beta_start, beta_end)
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        final_alpha_cumprod=jnp.asarray(1.0, jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )


def make_schedule_from_cfg(cfg) -> DiffusionSchedule:
    return make_schedule(
        cfg.TRAIN.NOISE_SCHEDULER.TYPE,
        cfg.TRAIN.SAMPLE_STEPS,
        cfg.TRAIN.NOISE_SCHEDULER.BETA_START,
        cfg.TRAIN.NOISE_SCHEDULER.BETA_END,
    )


def leading_timesteps(
    num_train_timesteps: int, num_inference_steps: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps, prev_timesteps) under diffusers' default "leading" spacing.

    diffusers 0.28.0 set_timesteps: ``(arange(n) * (T // n)).round()[::-1]``;
    the previous timestep is ``t - T // n`` for both DDPM.previous_timestep and
    the DDIM step. Returned as host arrays: the sampling scan carries them as
    literals so shapes stay static.
    """
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    prev_timesteps = timesteps - step_ratio
    return timesteps, prev_timesteps


def add_noise(
    schedule: DiffusionSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """Forward-noise x0 at timesteps t (diffusers add_noise; train.py:234)."""
    ac = jnp.take(schedule.alphas_cumprod, t)
    shape = (-1,) + (1,) * (x0.ndim - 1)
    sqrt_ac = jnp.sqrt(ac).reshape(shape)
    sqrt_1mac = jnp.sqrt(1.0 - ac).reshape(shape)
    return sqrt_ac * x0 + sqrt_1mac * noise
