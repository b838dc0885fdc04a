"""Progressive distillation: halve the DDIM grid, stage by stage.

Salimans & Ho, "Progressive Distillation for Fast Sampling of Diffusion
Models" (ICLR 2022), adapted to this planner's x0-("sample")-prediction
DDIM sampler (reference PRED_TYPE, config.py:64; the reference itself has no
distillation — this is a capability beyond parity that converts its
100/50/10-step plans into 1-4 step ones at matched quality; see distill.py
CLI + learnability.py --distill for the measured proof).

Per stage, the student (initialized from the teacher) learns to do in ONE
DDIM step what the teacher does in TWO:

* grids are exact halvings: ``student_ts = teacher_ts[::2]`` with the
  student's prev = the teacher's second-substep prev (odd-length tails
  collapse to a single substep). Stage-k students therefore run on grids
  not expressible by diffusers' "leading" spacing — samplers take them via
  ``SamplerConfig.timesteps`` / ``cfg.TPU.SAMPLE_TIMESTEPS``.
* the regression target is the IMPLIED x0 prediction: the unique model
  output z for which one student DDIM step from (x_t, t) lands exactly on
  the teacher's two-step result x_s —

      x_s = sqrt(a_s) z + sqrt((1-a_s)/(1-a_t)) (x_t - sqrt(a_t) z)
      =>  z = (x_s - c2 x_t) / (sqrt(a_s) - c2 sqrt(a_t)),
          c2 = sqrt((1-a_s)/(1-a_t))

  clamped to [-1, 1] (the eval step's clip/threshold makes that the
  achievable range; with sample_max_value=1.0 dynamic thresholding IS the
  [-1,1] clip). At a terminal prev (alpha=1) this reduces to z = x_s.
* the first waypoint's (x, y, yaw) anchor zeroing (interact.py:129/164) is
  applied to x_t, every teacher substep, and the target, exactly as the
  fused sampler applies it.
* training runs the reference's frozen-BN fine-tune mode (eval-mode BN,
  no dropout): the student starts from converged EMA params and must not
  re-estimate BN statistics from tiny distillation batches.

FREE_GUIDANCE models distill the w-GUIDED teacher (uncond + w*(cond-uncond),
Meng et al. 2023 "On Distillation of Guided Diffusion Models"): the
teacher's two substeps run the CFG combination at ``free_scale``, while the
STUDENT forward is a single conditional pass — the guidance scale is baked
into the student's weights. Deploy students with ``GUIDANCE.FREE_SCALE 1.0``
(u + 1*(c-u) == c; the sampler statically skips the uncond pass at
free_scale=1, so the deployed student really does one forward per step —
Meng et al.'s latency point). CLASSIFIER_GUIDANCE is rejected: its flagship
config already plans in 2 steps and its in-loop gradient guidance has no
distillation target.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.temporal_unet import TemporalMapUnet

# NOT from ..train (train/__init__ -> train.state -> diffusion -> this module
# would cycle); train/ema.py itself only depends on jax
from ..train.ema import EmaConfig, EmaState, ema_init, ema_update
from ..utils.constants import ANCHOR_DIMS, GuidanceType
from .schedule import DiffusionSchedule, add_noise, leading_timesteps
from .steps import StepConfig, ddim_step

__all__ = [
    "DistillGrid",
    "DistillState",
    "initial_grid",
    "halve_grid",
    "grid_chain",
    "implied_x0_target",
    "make_distill_step",
]


class DistillGrid(NamedTuple):
    """One stage's student grid and the teacher substeps each step spans.

    All 1-D int64 numpy arrays of equal length S (the student step count):
    student step i goes ``ts[i] -> prev[i]`` while the teacher goes
    ``ts[i] -> mids[i] -> prev[i]`` (or a single ``ts[i] -> prev[i]`` substep
    where ``single[i]``, the odd-length tail).
    """

    ts: np.ndarray
    mids: np.ndarray
    prev: np.ndarray
    single: np.ndarray  # bool


def initial_grid(num_train_timesteps: int, num_steps: int) -> Tuple[np.ndarray, np.ndarray]:
    """The teacher's starting grid: diffusers leading spacing (what the
    standard sampler runs at EVAL.SAMPLE_STEPS=num_steps)."""
    return leading_timesteps(num_train_timesteps, num_steps)


def halve_grid(ts: np.ndarray, prev: np.ndarray) -> DistillGrid:
    """Student grid = every other teacher step, starting at the first."""
    ts = np.asarray(ts, np.int64)
    prev = np.asarray(prev, np.int64)
    S = len(ts)
    if S < 2:
        raise ValueError(f"cannot halve a {S}-step grid")
    idx = np.arange(0, S, 2)
    has_second = idx + 1 < S
    ts2 = ts[idx]
    mids = prev[idx]  # == ts[idx + 1] where a second substep exists
    prev2 = np.where(has_second, prev[np.minimum(idx + 1, S - 1)], prev[idx])
    return DistillGrid(ts=ts2, mids=mids, prev=prev2, single=~has_second)


def grid_chain(num_train_timesteps: int, start_steps: int, num_stages: int):
    """The list of per-stage DistillGrids: start_steps -> ceil(n/2) -> ...

    Stage k's teacher is the stage k-1 student (stage 0's teacher runs the
    leading grid at start_steps)."""
    ts, prev = initial_grid(num_train_timesteps, start_steps)
    grids = []
    for _ in range(num_stages):
        g = halve_grid(ts, prev)
        grids.append(g)
        if len(g.ts) < 2:
            break
        ts, prev = g.ts, g.prev
    return grids


def implied_x0_target(
    schedule: DiffusionSchedule,
    x_t: jax.Array,
    x_s: jax.Array,
    t: jax.Array,
    s: jax.Array,
) -> jax.Array:
    """Solve the (eta=0) DDIM step for the model output that maps x_t -> x_s.

    t, s: (B,) int32 train-timestep indices (s may be < 0 = terminal)."""
    a_t = schedule.alpha_prod(t)
    a_s = schedule.alpha_prod_prev(s)
    c2 = jnp.sqrt((1.0 - a_s) / (1.0 - a_t))
    denom = jnp.sqrt(a_s) - c2 * jnp.sqrt(a_t)
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    return (x_s - c2.reshape(shape) * x_t) / denom.reshape(shape)


class DistillState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array  # () int32
    ema: "EmaState"  # student EMA; the DEPLOYED weights (see make_distill_step)


def _anchor(x: jax.Array) -> jax.Array:
    return x.at[:, 0, :ANCHOR_DIMS].set(0.0)


def make_distill_step(
    model: TemporalMapUnet,
    schedule: DiffusionSchedule,
    grid: DistillGrid,
    *,
    use_cond: GuidanceType = GuidanceType.NO_GUIDANCE,
    free_scale: float = 7.5,
    step_cfg: StepConfig = StepConfig(prediction_type="sample", clip_sample=True),
    lr: float = 1e-4,
    warmup: int = 20,
    snr_weight: bool = False,
    decay_steps: int = 0,
    ema_decay: float = 0.999,
):
    """Build (init_state, step) for one distillation stage.

    step(state, teacher_variables, batch_stats, batch, rng) -> (state, metrics)
    where teacher_variables = {"params", "batch_stats"} of the FROZEN teacher,
    batch_stats are the (frozen) BN stats shared by teacher and student, and
    batch is the training dict {image (B,H,W,3) normalized float, trajs
    (B,16,7), target (B,2)}. ``snr_weight`` applies the paper's truncated-SNR
    loss weight max(a_t/(1-a_t), 1).

    Deploy ``state.ema.shadow_params``, not ``state.params`` — and pass
    ``decay_steps`` = the stage's total iterations so the LR cosine-decays to
    zero. Round-4 postmortem (DISTILL.json pass=false): raw end-of-stage
    params carry AdamW's terminal optimization noise — measured as a
    systematic +0.008 bias on the anchor waypoint's STEER channel (teacher
    ~0.0004), the exact channel closed-loop control executes
    (interact.py:218) and the one held-out xy-RMS never sees; in closed loop
    it integrated into a 1.7 m lateral offset (17x the teacher). Salimans &
    Ho distill WITH student EMA for the same reason; the warmup-style decay
    (diffusers get_decay, power 2/3, no delay) averages the last ~50 steps
    of a 400-iteration stage.
    """
    if step_cfg.prediction_type != "sample":
        raise ValueError("distillation is derived for x0 ('sample') prediction")
    if use_cond == GuidanceType.CLASSIFIER_GUIDANCE:
        raise ValueError(
            "CLASSIFIER_GUIDANCE has no distillation target (in-loop gradient "
            "guidance); its flagship config already plans in 2 steps"
        )
    # the reference's AdamW contract, shared with training (train/state.py);
    # lazy import: diffusion/__init__ imports this module, train.state
    # imports diffusion.schedule — a top-level import would cycle
    from ..train.state import make_optimizer

    tx = make_optimizer(lr, warmup, decay_steps=decay_steps)
    ema_cfg = EmaConfig(
        decay=ema_decay,
        update_after_step=0,
        use_ema_warmup=True,
        inv_gamma=1.0,
        power=2.0 / 3.0,
    )
    ts = jnp.asarray(grid.ts, jnp.int32)
    mids = jnp.asarray(grid.mids, jnp.int32)
    prevs = jnp.asarray(grid.prev, jnp.int32)
    single = jnp.asarray(grid.single)
    n_grid = len(grid.ts)
    guided = use_cond == GuidanceType.FREE_GUIDANCE

    def init_state(teacher_params) -> DistillState:
        # copy: the student is donated into the jitted step while the teacher
        # keeps being passed alongside — aliased buffers would be an
        # "use of donated buffer" error on the first step
        params = jax.tree.map(lambda p: jnp.array(p, copy=True), teacher_params)
        return DistillState(
            params=params,
            opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32),
            ema=ema_init(params),
        )

    def _fwd_teacher(variables, x, feat, t, cond):
        """One teacher x0-prediction; FREE_GUIDANCE applies the w-guided
        combination (interact.py:133-144) — the map the student must match."""
        t_f = t.astype(jnp.float32)
        if guided:
            out_c = model.apply(variables, x, time=t_f, cond=cond, img_feature=feat)
            out_u = model.apply(
                variables, x, time=t_f, cond=jnp.zeros_like(cond), img_feature=feat
            )
            return (out_u + free_scale * (out_c - out_u)).astype(jnp.float32)
        return model.apply(variables, x, time=t_f, img_feature=feat).astype(jnp.float32)

    def _fwd_student(variables, x, feat, t, cond):
        """One student forward: a SINGLE conditional pass even under
        FREE_GUIDANCE — the guidance scale bakes into the weights (Meng et
        al. 2023), so the deployed student skips the uncond pass
        (GUIDANCE.FREE_SCALE=1)."""
        t_f = t.astype(jnp.float32)
        if guided:
            return model.apply(
                variables, x, time=t_f, cond=cond, img_feature=feat
            ).astype(jnp.float32)
        return model.apply(variables, x, time=t_f, img_feature=feat).astype(jnp.float32)

    _step_b = jax.vmap(
        lambda mo, t, pt, x: ddim_step(schedule, step_cfg, mo[None], t, pt, x[None])[0][0]
    )

    def loss_fn(params, teacher_variables, batch_stats, batch, rng):
        trajs = batch["trajs"].astype(jnp.float32)
        image = batch["image"].astype(jnp.float32)
        cond = batch["target"].astype(jnp.float32) if guided else None
        B = trajs.shape[0]
        rng_i, rng_n = jax.random.split(rng)
        i = jax.random.randint(rng_i, (B,), 0, n_grid)
        t, m, s = ts[i], mids[i], prevs[i]
        sgl = single[i]
        m_safe = jnp.maximum(m, 0)

        noise = jax.random.normal(rng_n, trajs.shape, jnp.float32)
        x_t = _anchor(add_noise(schedule, trajs, noise, t))

        # ---- teacher composite (two DDIM substeps; one on odd tails)
        tfeat = model.apply(
            teacher_variables, image, train=False, method=TemporalMapUnet.encode_image
        )
        out1 = _fwd_teacher(teacher_variables, x_t, tfeat, t, cond)
        x_m = _anchor(_step_b(out1, t, m_safe, x_t))
        out2 = _fwd_teacher(teacher_variables, x_m, tfeat, m_safe, cond)
        x_s_two = _step_b(out2, m_safe, s, x_m)
        x_s_one = _step_b(out1, t, s, x_t)
        x_s = _anchor(jnp.where(sgl[:, None, None], x_s_one, x_s_two))

        z = implied_x0_target(schedule, x_t, x_s, t, s)
        z = jax.lax.stop_gradient(_anchor(jnp.clip(z, -1.0, 1.0)))

        # ---- student: one forward (frozen BN, deterministic)
        svars = {"params": params, "batch_stats": batch_stats}
        sfeat = model.apply(svars, image, train=False, method=TemporalMapUnet.encode_image)
        pred = _fwd_student(svars, x_t, sfeat, t, cond)

        err2 = (pred - z) ** 2
        if snr_weight:
            a_t = schedule.alpha_prod(t)
            w = jnp.maximum(a_t / (1.0 - a_t), 1.0)
            err2 = err2 * w.reshape((-1,) + (1,) * (err2.ndim - 1))
        return jnp.mean(err2)

    def step(state: DistillState, teacher_variables, batch_stats, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, teacher_variables, batch_stats, batch, rng
        )
        grads = jax.tree.map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(ema_cfg, state.ema, params)
        return DistillState(params, opt_state, state.step + 1, ema), {"loss": loss}

    return init_state, step
