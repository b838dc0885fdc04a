"""Checkpointing: Orbax native format + reference torch ``.pth`` round-trip.

The reference saves ``{"state_dict", "optimizer", "lr_scheduler", "iter",
"ema_state_dict"}`` (train.py:288-299) and resumes all five
(train.py:182-194). We persist natively with Orbax (async-capable, sharded)
and can export/import the exact torch layout — including AdamW first/second
moments in parameter order — so training can migrate between the frameworks
mid-run.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.torch_convert import _FWD, _INV, _get_path, _set_path, build_mapping
from .ema import EmaState
from .state import TrainState

__all__ = [
    "save_orbax",
    "restore_orbax",
    "wait_for_checkpoints",
    "export_torch_checkpoint",
    "import_torch_checkpoint",
    "load_eval_variables",
]


# ----------------------------------------------------------------- orbax

_CKPTR = None  # shared StandardCheckpointer so async saves can overlap training


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_orbax(path: str, state: TrainState, wait: bool = True) -> None:
    """``wait=False`` starts an async save and returns — training overlaps
    the serialization; call ``wait_for_checkpoints()`` before exit (the next
    save also synchronizes internally). The host copy of the state is
    materialized up front so donated device buffers can be reused."""
    ckptr = _checkpointer()
    ckptr.save(osp.abspath(path), jax.tree.map(np.asarray, state), force=True)
    if wait:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Block until all pending async Orbax saves are durable."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def restore_orbax(path: str, abstract_state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(osp.abspath(path), abstract_state)


def load_eval_variables(model, cfg, path: str) -> Dict[str, Any]:
    """Checkpoint -> eval ``variables`` with EMA-shadow overwrite.

    The shared eval-time loading semantics (reference: interact.py:102-108
    loads the state_dict then overwrites with the EMA shadow): torch ``.pth``
    via the bit-compatible importer, anything else as a native Orbax
    TrainState dir whose ``params`` are replaced by ``ema.shadow_params``.
    Used by the closed-loop planner (driving/plan.py) and the distillation
    CLI's teacher load (distill.py)."""
    from ..models.torch_convert import load_torch_checkpoint
    from .state import create_train_state

    if str(path).endswith(".pth"):
        variables = load_torch_checkpoint(path, cfg, use_ema=True)
    else:
        rng0 = np.random.default_rng(0)
        x0 = jnp.asarray(
            rng0.standard_normal((1, cfg.MODEL.HORIZON, cfg.MODEL.TRANSITION_DIM)),
            jnp.float32,
        )
        img0 = jnp.asarray(
            rng0.standard_normal((1, cfg.TRAIN.IMAGE_HEIGHT, cfg.TRAIN.IMAGE_WIDTH, 3)),
            jnp.float32,
        )
        abstract = model.init(
            jax.random.PRNGKey(0), x0, img=img0, time=jnp.asarray([1.0])
        )
        state = restore_orbax(
            str(path), jax.tree.map(np.asarray, create_train_state(model, abstract, cfg))
        )
        variables = {
            "params": state.ema.shadow_params,
            "batch_stats": state.batch_stats,
        }
    return jax.tree.map(jnp.asarray, variables)


# ------------------------------------------------------------ torch format


def _params_to_torch(params, mapping):
    out = {}
    for torch_key, flax_path, tf in mapping:
        out[torch_key] = _INV[tf](np.asarray(_get_path(params, flax_path), dtype=np.float32))
    return out


def export_torch_checkpoint(state: TrainState, cfg, path: str, base_lr: Optional[float] = None):
    """Write a reference-compatible ``.pth`` (train.py:288-299 layout)."""
    import torch

    params_map, stats_map = build_mapping(cfg)
    step = int(state.step)

    state_dict = {
        k: torch.from_numpy(v) for k, v in _params_to_torch(state.params, params_map).items()
    }
    for torch_key, flax_path, tf in stats_map:
        arr = _INV[tf](np.asarray(_get_path(state.batch_stats, flax_path), dtype=np.float32))
        state_dict[torch_key] = torch.from_numpy(arr)
        if torch_key.endswith("running_var"):
            state_dict[torch_key.replace("running_var", "num_batches_tracked")] = torch.tensor(
                0, dtype=torch.int64
            )

    # optax.adamw chain: (scale_by_adam, add_decayed_weights, scale_by_lr)
    adam_state = state.opt_state[0]
    mu_t = _params_to_torch(adam_state.mu, params_map)
    nu_t = _params_to_torch(adam_state.nu, params_map)
    count = int(adam_state.count)
    optimizer = {
        "state": {
            i: {
                "step": torch.tensor(float(count)),
                "exp_avg": torch.from_numpy(mu_t[k]),
                "exp_avg_sq": torch.from_numpy(nu_t[k]),
            }
            for i, (k, _, _) in enumerate(params_map)
        },
        "param_groups": [
            {
                "lr": float(base_lr if base_lr is not None else cfg.TRAIN.LR),
                "betas": (0.95, 0.999),
                "eps": 1e-7,
                "weight_decay": 0.01,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": None,
                "initial_lr": float(cfg.TRAIN.LR),
                "params": list(range(len(params_map))),
            }
        ],
    }

    ema_state_dict = {
        "decay": float(cfg.TRAIN.EMA_MAX_DECAY),
        "min_decay": 0.0,
        "optimization_step": int(state.ema.optimization_step),
        "update_after_step": 5000,
        "use_ema_warmup": True,
        "inv_gamma": float(cfg.TRAIN.EMA_INV_GAMMA),
        "power": float(cfg.TRAIN.EMA_POWER),
        "shadow_params": [
            torch.from_numpy(v)
            for v in _params_to_torch(state.ema.shadow_params, params_map).values()
        ],
    }

    torch.save(
        {
            "state_dict": state_dict,
            "optimizer": optimizer,
            "lr_scheduler": {"last_epoch": step, "_step_count": step + 1},
            "iter": step,
            "ema_state_dict": ema_state_dict,
        },
        path,
    )


def import_torch_checkpoint(path: str, cfg, state: TrainState) -> TrainState:
    """Resume from a reference ``.pth``: params, BN stats, AdamW moments, EMA,
    and iteration counter (mirrors train.py:182-194)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params_map, stats_map = build_mapping(cfg)

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params: Dict = {}
    for torch_key, flax_path, tf in params_map:
        _set_path(params, flax_path, _FWD[tf](to_np(ckpt["state_dict"][torch_key])))
    batch_stats: Dict = {}
    for torch_key, flax_path, tf in stats_map:
        _set_path(batch_stats, flax_path, _FWD[tf](to_np(ckpt["state_dict"][torch_key])))

    mu: Dict = {}
    nu: Dict = {}
    opt = ckpt["optimizer"]["state"]
    count = 0
    for i, (torch_key, flax_path, tf) in enumerate(params_map):
        entry = opt[i]
        count = int(float(entry["step"]))
        _set_path(mu, flax_path, _FWD[tf](to_np(entry["exp_avg"])))
        _set_path(nu, flax_path, _FWD[tf](to_np(entry["exp_avg_sq"])))

    adam_state = state.opt_state[0]
    new_adam = adam_state._replace(
        count=jnp.asarray(count, jnp.int32),
        mu=jax.tree.map(jnp.asarray, mu),
        nu=jax.tree.map(jnp.asarray, nu),
    )
    new_opt_state = (new_adam,) + tuple(state.opt_state[1:])

    shadow: Dict = {}
    for (torch_key, flax_path, tf), sp in zip(
        params_map, ckpt["ema_state_dict"]["shadow_params"]
    ):
        _set_path(shadow, flax_path, _FWD[tf](to_np(sp)))

    return TrainState(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, batch_stats),
        opt_state=new_opt_state,
        ema=EmaState(
            shadow_params=jax.tree.map(jnp.asarray, shadow),
            optimization_step=jnp.asarray(
                int(ckpt["ema_state_dict"]["optimization_step"]), jnp.int32
            ),
        ),
        step=jnp.asarray(int(ckpt["iter"]), jnp.int32),
    )
