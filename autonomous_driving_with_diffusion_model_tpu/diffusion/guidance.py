"""Classifier guidance: target-waypoint loss + gradient update.

The reference does a per-step ``requires_grad_``/``autograd.grad`` dance
(control/guidance.py:35-59); here the same update is a clean ``jax.grad``
closed over the state-prediction head, traceable inside the sampling scan.

Semantics (control/guidance_loss.py:6-22, control/guidance.py:17-59):

* ``target_guidance_loss`` — softmin-weighted squared distance of trajectory
  points to the target waypoint(s). The data-dependent branch (endpoint short
  of the target -> "dummy" index 0) becomes ``lax.cond``-free ``jnp.where``
  on the chosen index.
* ``apply_classifier_guidance`` — gradients of the loss w.r.t. both the full
  model output x (through the concat) and the action tensor (through the
  state-prediction transformer); state dims updated with ``scale/15 * grad``,
  action dims with ``scale * grad``; scaled by ``grad_scale``
  (= exp(0.5 * variance), the reference's "model std"); result clipped to
  [-1, 1].
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["target_guidance_loss", "make_guidance_fn", "GUIDANCE_LOSSES"]


def target_guidance_loss(x: jax.Array, target: jax.Array) -> jax.Array:
    """Softmin-weighted squared distance to target waypoints.

    x: (B, H, D) trajectories (first two dims are x, y); target: (N, 2) or
    (B?, N, 2) — in the closed-loop pipeline N == 1, B == 1
    (interact.py:283-287 passes a single ego-frame waypoint).

    Matches reference control/guidance_loss.py:10-22 exactly, including the
    erratic-update guard: if the trajectory endpoint is closer to the anchor
    than the target is, distances to trajectory point 0 (the anchored origin)
    are used instead of the argmin point.
    """
    while target.ndim < x.ndim:
        target = target[None]
    # target now (1, N, 2)
    loss_weight = jax.nn.softmax(-jnp.linalg.norm(target, axis=-1), axis=-1)  # (1, N)
    # dist_matrix[b, n, h] = || x[b, h, :2] - target[0, n] ||^2
    dist_matrix = jnp.sum((x[..., None, :, :2] - target[..., :, None, :]) ** 2, axis=-1)
    target_to_agent = jnp.linalg.norm(target - x[:, 0, :2][:, None, :], axis=-1)  # (B, N)
    final_to_agent = jnp.linalg.norm(x[:, -1, :2] - x[:, 0, :2], axis=-1)  # (B,)
    argmin_idx = jnp.argmin(dist_matrix, axis=-1)  # (B, N)
    use_dummy = final_to_agent[:, None] < target_to_agent  # (B, N)
    choose = jnp.where(use_dummy, 0, argmin_idx)
    chosen = jnp.take_along_axis(dist_matrix, choose[..., None], axis=-1)[..., 0]  # (B, N)
    return jnp.sum(jnp.mean(chosen * loss_weight, axis=-1))


GUIDANCE_LOSSES = {"TargetGuidance": target_guidance_loss}


def build_loss_list(loss_list_cfg):
    """Resolve [[ClassName, kwargs-flat-list], ...] (reference: guidance.py:17-27)."""
    if not loss_list_cfg:
        return []
    fns = []
    for name, flat_kwargs in loss_list_cfg:
        if name not in GUIDANCE_LOSSES:
            raise KeyError(f"Unknown guidance loss: {name}")
        base = GUIDANCE_LOSSES[name]
        it = iter(flat_kwargs or [])
        kwargs = dict(zip(it, it))
        if kwargs:
            fns.append(lambda x, t, _b=base, _k=kwargs: _b(x, t, **_k))
        else:
            fns.append(base)
    return fns


def make_guidance_fn(
    loss_list_cfg,
    classifier_scale: float,
    guidance_step: int = 1,
    state_pred_fn: Optional[Callable] = None,
):
    """Build the classifier-guidance transform applied to the model output.

    ``state_pred_fn(action) -> state`` is the (anchored) state-prediction head
    closure; passing it makes action gradients flow through the transformer,
    matching the reference's eval-time graph (interact.py:158 does NOT detach
    the action before state_pred, unlike training, temporal.py:238).

    Returns ``guide(x, action, target, grad_scale) -> new_x`` where x is the
    full (B, H, 7) model output.
    """
    loss_fns = build_loss_list(loss_list_cfg)

    def total_loss(x, target):
        loss = 0.0
        for fn in loss_fns:
            loss = loss + fn(x, target)
        return loss

    def guide(x, action, target, grad_scale):
        for _ in range(guidance_step):

            def loss_wrt_both(x_in, action_in):
                if state_pred_fn is not None:
                    state = state_pred_fn(action_in)
                    x_graph = jnp.concatenate([state, action_in], axis=-1)
                    # the reference's autograd.grad([loss], [x_guidance, action])
                    # sees x_guidance as the graph root built from action; the
                    # direct x gradient equals d loss/d x, while the action
                    # gradient flows through state_pred + the concat.
                    return total_loss(x_in + (x_graph - jax.lax.stop_gradient(x_graph)), target)
                return total_loss(x_in, target)

            x_grad, action_grad = jax.grad(loss_wrt_both, argnums=(0, 1))(x, action)
            state_grad = x_grad[..., :-3]
            grad = jnp.concatenate([state_grad, action_grad], axis=-1)
            if grad_scale is not None:
                grad = grad * grad_scale
            x = x.at[..., :-3].add(-(classifier_scale / 15.0) * grad[..., :-3])
            x = x.at[..., -3:].add(-classifier_scale * grad[..., -3:])
        return jnp.clip(x, -1.0, 1.0)

    return guide
