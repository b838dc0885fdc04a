"""Exponential moving average of parameters, diffusers-compatible.

Reproduces ``diffusers.training_utils.EMAModel`` (the reference's EMA:
train.py:146-153 with update_after_step=5000, use_ema_warmup=True) as a pure
pytree transform so it runs inside the jitted train step. The state
round-trips to the torch ``ema_state_dict`` format (decay schedule fields +
``shadow_params`` list in parameter-registration order).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EmaConfig", "EmaState", "ema_init", "ema_decay_for_step", "ema_update"]


class EmaConfig(NamedTuple):
    decay: float = 0.9999  # max decay (TRAIN.EMA_MAX_DECAY)
    min_decay: float = 0.0
    update_after_step: int = 5000  # hardcoded in reference train.py:148
    use_ema_warmup: bool = True
    inv_gamma: float = 1.0
    power: float = 0.75


class EmaState(NamedTuple):
    shadow_params: Any  # pytree mirroring model params
    optimization_step: jax.Array  # () int32


def ema_init(params: Any) -> EmaState:
    # Copy (not alias) so the train state can be buffer-donated: aliased
    # params/shadow leaves would be donated twice and abort Execute().
    return EmaState(
        shadow_params=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
        optimization_step=jnp.asarray(0, jnp.int32),
    )


def ema_decay_for_step(cfg: EmaConfig, optimization_step: jax.Array) -> jax.Array:
    """diffusers EMAModel.get_decay: warmup ``1 - (1 + step/inv_gamma)^-power``
    after ``update_after_step``, clipped to [min_decay, decay]; 0 before."""
    step = jnp.maximum(optimization_step - cfg.update_after_step - 1, 0)
    warm = jnp.asarray(step, jnp.float32)
    if cfg.use_ema_warmup:
        cur = 1.0 - (1.0 + warm / cfg.inv_gamma) ** (-cfg.power)
    else:
        cur = (1.0 + warm) / (10.0 + warm)
    cur = jnp.minimum(cur, cfg.decay)
    cur = jnp.maximum(cur, cfg.min_decay)
    return jnp.where(step <= 0, 0.0, cur)


def ema_update(cfg: EmaConfig, state: EmaState, params: Any) -> EmaState:
    """One EMA step (diffusers: increments the step, then blends)."""
    step = state.optimization_step + 1
    decay = ema_decay_for_step(cfg, step)
    one_minus = 1.0 - decay
    shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p.astype(s.dtype)), state.shadow_params, params
    )
    return EmaState(shadow_params=shadow, optimization_step=step)
