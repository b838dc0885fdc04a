"""Train state: params, BN stats, AdamW/EMA state, and the jitted SPMD step.

Reference training semantics reproduced (train.py:106-327):

* AdamW betas (0.95, 0.999), eps 1e-7, torch-default weight decay 0.01
  (train.py:170) with constant-after-warmup LR (train.py:171-174);
* per-iteration: t ~ U[0, TIME_STEPS), x_t = add_noise(x0), anchor zeroing of
  the first waypoint (train.py:232-235), optional whole-batch CFG cond drop
  with prob 1 - USE_FREE_COND_PROB (train.py:237-241), MSE on eps or x0 per
  PRED_TYPE (train.py:244-249);
* NaN-scrub of gradients (nan->0, +-inf->+-1e5; train.py:252-255);
* EMA update each synced step (train.py:260-261).

TPU-native execution: one jitted step over a data-parallel mesh — batch
sharded on the ``data`` axis, state replicated; XLA inserts the gradient
all-reduce (the NCCL allreduce equivalent) automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.schedule import DiffusionSchedule, add_noise
from ..models.temporal_unet import TemporalMapUnet
from ..utils.constants import ANCHOR_DIMS, GuidanceType
from .ema import EmaConfig, EmaState, ema_init, ema_update

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_lr_schedule"]


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EmaState
    step: jax.Array  # () int32


def make_lr_schedule(base_lr: float, warmup_steps: int):
    """Constant schedule with linear warmup (diffusers
    get_constant_schedule_with_warmup; reference train.py:171-174)."""

    def schedule(step):
        warm = jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        return base_lr * warm

    return schedule


def make_optimizer(lr: float, warmup_steps: int, decay_steps: int = 0):
    """The reference's AdamW contract (train.py:170-174) — the single source
    of these hyperparameters; distillation fine-tuning reuses it too.

    ``decay_steps`` > 0 swaps the constant-after-warmup schedule for a cosine
    decay to ZERO over that many total steps (distillation stages end at
    lr=0 so the final student is not one noisy AdamW step away from its
    converged average — the r4 distill regression postmortem)."""
    if decay_steps > 0:
        # optax counts warmup inside decay_steps; a run shorter than the
        # warmup (tiny test stages) degenerates to warmup-only. The floor
        # must be 0, not 1: at decay_steps=1 a warmup of 1 would leave the
        # cosine segment with zero steps, which optax rejects.
        warmup_steps = max(min(warmup_steps, decay_steps - 1), 0)
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=decay_steps,
            end_value=0.0,
        )
    else:
        schedule = make_lr_schedule(lr, warmup_steps)
    return optax.adamw(
        learning_rate=schedule,
        b1=0.95,
        b2=0.999,
        eps=1e-7,
        weight_decay=0.01,  # torch AdamW default (reference passes none)
    )


def create_train_state(model: TemporalMapUnet, variables, cfg) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg.TRAIN.LR, cfg.TRAIN.LR_WARMUP)
    ema_cfg = EmaConfig(
        decay=cfg.TRAIN.EMA_MAX_DECAY,
        update_after_step=5000,
        use_ema_warmup=True,
        inv_gamma=cfg.TRAIN.EMA_INV_GAMMA,
        power=cfg.TRAIN.EMA_POWER,
    )
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=ema_init(params),
        step=jnp.asarray(0, jnp.int32),
    )


def _nan_scrub(grads):
    """Reference train.py:252-255 nan_to_num on gradients."""
    return jax.tree.map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads
    )


def make_train_step(model: TemporalMapUnet, schedule: DiffusionSchedule, cfg):
    """Build the jitted training step.

    step(state, batch, rng) -> (state, metrics); batch is a dict with
    ``image`` (B,H,W,3), ``trajs`` (B,16,7), ``target`` (B,2).
    Shard the batch's leading dim over the mesh and pass replicated state —
    jit partitions the rest.
    """
    tx = make_optimizer(cfg.TRAIN.LR, cfg.TRAIN.LR_WARMUP)
    use_cond = GuidanceType[cfg.TRAIN.USE_COND]
    pred_type = cfg.TRAIN.NOISE_SCHEDULER.PRED_TYPE
    time_steps = cfg.TRAIN.TIME_STEPS
    keep_prob = cfg.TRAIN.USE_FREE_COND_PROB
    ema_cfg = EmaConfig(
        decay=cfg.TRAIN.EMA_MAX_DECAY,
        update_after_step=5000,
        use_ema_warmup=True,
        inv_gamma=cfg.TRAIN.EMA_INV_GAMMA,
        power=cfg.TRAIN.EMA_POWER,
    )

    bn_mode = str(getattr(cfg.TPU, "BN_MODE", "train"))
    if bn_mode not in ("train", "frozen"):
        raise ValueError(f"TPU.BN_MODE must be 'train' or 'frozen', got {bn_mode!r}")
    # "frozen" normalizes with the pretrained running stats (BN eval mode,
    # stats never mutate) while dropout stays active — the torch frozen-BN
    # fine-tuning practice. Removes the per-conv batch reductions measured as
    # the whole train-vs-inference MFU gap (docs/DESIGN.md); opt-in divergence
    # from the reference's model.train() semantics (docs/PARITY.md).
    bn_train = bn_mode == "train"

    def _forward(params, batch_stats, noise_data, image, t, cond, dropout_key):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            noise_data,
            img=image,
            time=t,
            cond=cond,
            train=bn_train,
            deterministic=False,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )

    if bool(getattr(cfg.TPU, "REMAT", False)):
        # rematerialize the forward on the backward pass: trades ~1/3 more
        # FLOPs for dropping all encoder/U-Net activations from HBM, the
        # standard lever for batch >64 at 900x256 (docs/ROADMAP "training at
        # scale"). Gradients are bitwise-identical (tests/test_train.py).
        _forward = jax.checkpoint(_forward)

    def loss_fn(params, batch_stats, batch, rng):
        trajs = batch["trajs"].astype(jnp.float32)
        # keep floating images in their given dtype: the encoder's convs cast
        # to the compute dtype anyway, and a bf16 input pipeline halves the
        # image HBM traffic (uint8 loader output still upcasts)
        image = batch["image"]
        if not jnp.issubdtype(image.dtype, jnp.floating):
            image = image.astype(jnp.float32)
        B = trajs.shape[0]
        rng_t, rng_noise, rng_drop, rng_dropout = jax.random.split(rng, 4)
        t = jax.random.randint(rng_t, (B,), 0, time_steps)
        noise = jax.random.normal(rng_noise, trajs.shape, trajs.dtype)
        noise_data = add_noise(schedule, trajs, noise, t)
        noise_data = noise_data.at[..., 0, :ANCHOR_DIMS].set(0.0)

        cond = None
        if use_cond == GuidanceType.FREE_GUIDANCE:
            # whole-batch cond drop with prob (1 - keep_prob), matching
            # train.py:237-241 (random() > USE_FREE_COND_PROB -> cond None;
            # cond None == zeros inside the model, temporal.py:207).
            keep = jax.random.uniform(rng_drop, ()) <= keep_prob
            cond = jnp.where(keep, batch["target"].astype(jnp.float32), 0.0)

        pred, mutated = _forward(
            params, batch_stats, noise_data, image, t.astype(jnp.float32),
            cond, rng_dropout,
        )
        target = noise if pred_type == "epsilon" else trajs
        if pred_type not in ("epsilon", "sample"):
            raise ValueError("Not supported prediction type.")
        loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
        return loss, mutated["batch_stats"]

    accum_steps = int(cfg.TRAIN.GRADIENT_ACCUMULATION_STEPS)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
        """One optimizer step. With GRADIENT_ACCUMULATION_STEPS > 1 the batch's
        leading dim is split into that many micro-batches scanned sequentially,
        averaging gradients before the update (reference: train.py:120,236 via
        accelerate.accumulate)."""
        if accum_steps <= 1:
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng
            )
        else:
            micro = jax.tree.map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:]),
                batch,
            )
            rngs = jax.random.split(rng, accum_steps)

            def accum_body(carry, xs):
                grads_acc, loss_acc, stats = carry
                mb, r = xs
                (loss_i, stats), grads_i = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, stats, mb, r
                )
                grads_acc = jax.tree.map(lambda a, g: a + g, grads_acc, grads_i)
                return (grads_acc, loss_acc + loss_i, stats), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, new_stats), _ = jax.lax.scan(
                accum_body,
                (zero_grads, jnp.asarray(0.0, jnp.float32), state.batch_stats),
                (micro, rngs),
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
        grads = _nan_scrub(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(ema_cfg, state.ema, new_params)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema=new_ema,
            step=state.step + 1,
        )
        from .ema import ema_decay_for_step

        lr = make_lr_schedule(cfg.TRAIN.LR, cfg.TRAIN.LR_WARMUP)(state.step)
        metrics = {
            "loss": loss,
            "lr": lr,
            "ema_decay": ema_decay_for_step(ema_cfg, new_ema.optimization_step),
        }
        return new_state, metrics

    return train_step
