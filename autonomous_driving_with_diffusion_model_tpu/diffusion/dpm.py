"""DPM-Solver++(2M): the reference's intended-but-dead "dpm" scheduler, live.

The reference CONFIGURES a "dpm" scheduler — interact.py:92-93 sets
``lambda_min_clipped = -5.1`` when ``cfg.EVAL.SCHEDULER == "dpm"`` — but its
registry (interact.py:22-25, e2e_driving/diffusion_agent.py:29-32) has no
"dpm" entry, so the branch is a latent KeyError (SURVEY.md Appendix C.4).
This module implements what that branch intends: diffusers'
``DPMSolverMultistepScheduler`` semantics (``algorithm_type="dpmsolver++"``,
``solver_order=2`` midpoint multistep, data prediction, lower-order final
step, the "linspace" timestep spacing with lambda clipping), following
Lu et al. 2022, "DPM-Solver++: Fast Solver for Guided Sampling of Diffusion
Probabilistic Models".

TPU-first shape: every per-step coefficient (sigma ratio, the exp(h)
integrator weight, the multistep ratio) is precomputed on the HOST in float64
— including the exact ``sigma -> 0`` terminal limits, which would be
inf/nan hazards if traced — and scanned over as literal tables, so each
solver step is three fused elementwise ops inside the sampling scan. The
solve is a deterministic probability-flow-ODE discretization: no per-step
noise, and the first-order update coincides exactly with the eta=0 DDIM step
(tested), so DPM++ is a drop-in few-step upgrade for any trained checkpoint
— including progressively distilled ones — with no extra training.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DiffusionSchedule

__all__ = ["DPMCoeffs", "dpm_timesteps", "dpm_coeffs", "dpm_pp_2m_update"]


def _lambda_table(schedule: DiffusionSchedule) -> np.ndarray:
    """Half-log-SNR lambda(t) = log(alpha_t / sigma_t) over train timesteps."""
    ac = np.asarray(schedule.alphas_cumprod, np.float64)
    return 0.5 * (np.log(ac) - np.log1p(-ac))


def dpm_timesteps(
    schedule: DiffusionSchedule, num_inference_steps: int, lambda_min_clipped: float = -5.1
) -> np.ndarray:
    """The DPMSolverMultistep "linspace" grid with lambda clipping.

    High-noise train timesteps whose lambda falls below ``lambda_min_clipped``
    (the reference's hard-coded -5.1, interact.py:93) are trimmed before the
    linspace — exactly diffusers' ``set_timesteps`` behavior. Returns a
    strictly decreasing int64 grid; 0 itself is dropped (diffusers' ``[:-1]``)
    — the final step instead targets the sigma=0 terminal via
    ``prev_timestep = -1`` (sampler.py builds ``prev_np``), where the update
    collapses exactly to ``pred_x0``.
    """
    lam = _lambda_table(schedule)
    # lam decreases with t; count the trailing timesteps below the clip
    clipped_idx = int(np.searchsorted(lam[::-1], lambda_min_clipped))
    last_timestep = schedule.num_train_timesteps - clipped_idx
    if last_timestep < 1:
        raise ValueError(f"lambda_min_clipped={lambda_min_clipped} clips every timestep")
    ts = (
        np.linspace(0, last_timestep - 1, num_inference_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )
    if np.any(np.diff(ts) >= 0):
        raise ValueError(
            f"num_inference_steps={num_inference_steps} too large for the "
            f"{last_timestep} usable train timesteps (grid has duplicates)"
        )
    return ts


class DPMCoeffs(NamedTuple):
    """Stacked per-step update coefficients (all float32, shape (S,)).

    The 2M midpoint update is
    ``x_prev = sigma_ratio * x - phi * (x0 + 0.5 * inv_r * (x0 - x0_prev))``
    with ``sigma_ratio = sigma_prev/sigma_t``, ``phi = alpha_prev*expm1(-h)``,
    ``h = lambda_prev - lambda_t`` and ``inv_r = h / h_previous_interval``
    (forced to 0 on first-order steps: the first step, the final step —
    diffusers' ``lower_order_final`` — and any step whose h is non-finite,
    i.e. the exact terminal limit where sigma_prev = 0 and the update
    collapses to ``x_prev = x0``).
    """

    sigma_ratio: jax.Array
    phi: jax.Array
    inv_r: jax.Array


def dpm_coeffs(
    schedule: DiffusionSchedule, timesteps: np.ndarray, prev_timesteps: np.ndarray
) -> DPMCoeffs:
    """Precompute the per-step tables in float64 on the host (trace time)."""
    ac = np.asarray(schedule.alphas_cumprod, np.float64)
    final_ac = float(np.asarray(schedule.final_alpha_cumprod))

    def alpha_sigma(t):
        t = np.asarray(t, np.int64)
        ap = np.where(t >= 0, ac[np.maximum(t, 0)], final_ac)
        return np.sqrt(ap), np.sqrt(1.0 - ap)

    a_t, s_t = alpha_sigma(timesteps)
    a_p, s_p = alpha_sigma(prev_timesteps)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam_t = np.log(a_t) - np.log(s_t)
        lam_p = np.log(a_p) - np.log(s_p)  # +inf at the sigma_prev=0 terminal
        h = lam_p - lam_t
        sigma_ratio = s_p / s_t
        phi = a_p * np.expm1(-h)  # expm1(-inf) = -1 => phi = -alpha_prev exactly
        h_prev = np.concatenate([[np.nan], h[:-1]])
        first_order = np.zeros(len(timesteps), dtype=bool)
        first_order[0] = True  # no history yet
        first_order[-1] = True  # lower-order final (stability at small sigma)
        first_order |= ~np.isfinite(h) | ~np.isfinite(h_prev)
        inv_r = np.where(first_order, 0.0, h / h_prev)
    if not (np.isfinite(sigma_ratio).all() and np.isfinite(phi).all() and np.isfinite(inv_r).all()):
        raise ValueError("non-finite DPM-Solver++ coefficients (degenerate grid)")
    return DPMCoeffs(
        sigma_ratio=jnp.asarray(sigma_ratio, jnp.float32),
        phi=jnp.asarray(phi, jnp.float32),
        inv_r=jnp.asarray(inv_r, jnp.float32),
    )


def dpm_pp_2m_update(
    sample: jax.Array,
    pred_x0: jax.Array,
    prev_x0: jax.Array,
    sigma_ratio: jax.Array,
    phi: jax.Array,
    inv_r: jax.Array,
) -> jax.Array:
    """One DPM-Solver++(2M) midpoint step (first-order when inv_r == 0)."""
    d = pred_x0 + 0.5 * inv_r * (pred_x0 - prev_x0)
    return sigma_ratio * sample - phi * d
