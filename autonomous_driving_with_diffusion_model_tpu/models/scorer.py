"""Learned hypothesis scorer: rank K candidate plans by predicted outcome.

Multi-hypothesis planning (``TPU.NUM_HYPOTHESES``) samples K trajectories in
one fused program and drives the best one. The analytic scorers in
``driving/plan.py`` (endpoint distance, TargetGuidance loss, min-jerk) are
fixed heuristics; this module adds a LEARNED scorer — a small MLP trained on
*closed-loop outcomes*: each candidate is executed open-loop in the
simulator from a snapshotted state and labeled with the realized route
deviation (see ``learnability.py --learned-scorer``, which collects the
counterfactual dataset, trains this net, and benchmarks it closed-loop
against the analytic scorers). The net amortizes those simulator rollouts
into a ~100 us selector usable where no resettable simulator exists.

No reference analogue: the reference drives a single sample per plan
(interact.py:100, diffusion_agent.py:94); hypothesis selection is a
TPU-enabled extension (the MXU makes K=8 sampling ~1.2x the K=1 cost).

The scorer consumes exactly what ``DiffusionPlanner._plan`` has in hand:
the sampler's output trajectories (xy in meters, remaining channels in the
dataset's normalized units) and the ego-frame normalized target point. Lower
score = better (argmin selection, same convention as the analytic scorers).

Training runs as ONE jitted program (full-batch Adam inside ``lax.scan``) —
over the TPU relay a per-step python loop would pay ~30 ms RPC per step;
scanned, the whole fit is a single dispatch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import MAGIC_NUM

__all__ = [
    "HypothesisScorer",
    "init_scorer",
    "score_trajs",
    "train_scorer",
    "save_scorer",
    "load_scorer",
]


class HypothesisScorer(nn.Module):
    """Per-candidate MLP: (traj features, target) -> scalar predicted outcome.

    Candidates are scored independently (no cross-candidate interaction), so
    the ranking is permutation-equivariant and K can change between calls
    without retraining.
    """

    hidden: Tuple[int, ...] = (64, 64)

    @nn.compact
    def __call__(self, trajs: jax.Array, target: jax.Array) -> jax.Array:
        """trajs: (K, H, C) sampler output — xy meters, rest normalized;
        target: (2,) normalized ego-frame target. Returns (K,) scores."""
        xy = trajs[..., :2] / MAGIC_NUM  # back to the dataset's ~[-1, 1]
        rest = trajs[..., 2:]
        dxy = jnp.diff(xy, axis=1)  # step vectors: shape/heading cues
        k = trajs.shape[0]
        feats = jnp.concatenate(
            [
                xy.reshape(k, -1),
                dxy.reshape(k, -1),
                rest.reshape(k, -1),
                (xy[:, -1, :] - target[None, :]),  # endpoint miss
                jnp.tile(target[None, :], (k, 1)),
            ],
            axis=-1,
        )
        x = feats
        for width in self.hidden:
            x = nn.gelu(nn.Dense(width)(x))
        return nn.Dense(1)(x)[:, 0]


def init_scorer(
    seed: int = 0,
    horizon: int = 16,
    transition_dim: int = 7,
    hidden: Tuple[int, ...] = (64, 64),
) -> Dict:
    """Initialize scorer params for the given trajectory shape."""
    model = HypothesisScorer(hidden=tuple(hidden))
    trajs = jnp.zeros((1, horizon, transition_dim), jnp.float32)
    target = jnp.zeros((2,), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), trajs, target)["params"]


def score_trajs(
    params: Dict, trajs: jax.Array, target: jax.Array, hidden: Tuple[int, ...] = (64, 64)
) -> jax.Array:
    """Pure scoring fn (jit/vmap-friendly): (K, H, C), (2,) -> (K,) scores."""
    return HypothesisScorer(hidden=tuple(hidden)).apply(
        {"params": params}, trajs, jnp.asarray(target, jnp.float32).reshape(2)
    )


def train_scorer(
    trajs: np.ndarray,
    targets: np.ndarray,
    outcomes: np.ndarray,
    *,
    seed: int = 0,
    steps: int = 3000,
    lr: float = 3e-3,
    weight_decay: float = 0.1,
    hidden: Tuple[int, ...] = (64, 64),
    val_fraction: float = 0.2,
    groups: Optional[np.ndarray] = None,
) -> Tuple[Dict, Dict]:
    """Fit the scorer on counterfactual outcome labels.

    trajs: (N, K, H, C) candidate sets; targets: (N, 2); outcomes: (N, K)
    realized outcome per candidate (lower = better). Returns (params,
    metrics) where metrics reports val MSE and top-1 regret — the mean
    outcome gap between the scorer's pick and the oracle-best candidate —
    for the scorer and for a random-pick baseline.

    ``groups`` (N,) assigns each row to an episode; when given, whole
    groups are held out until >= ``val_fraction`` of the rows are in the
    validation set. Consecutive rows of one episode are near-duplicates, so
    a row-level random split would leak train states into validation and
    inflate the val metrics.

    Full-batch AdamW, ``steps`` updates inside one ``lax.scan`` (single
    device dispatch; the dataset is a few thousand rows). The strong default
    weight decay matters: with ~10^4 params on a few hundred candidate sets
    the un-decayed net memorizes the training outcomes (train MSE -> 0)
    and ranks validation sets no better than random. Outcomes are
    standardized internally; scores are only used via argmin, so the affine
    transform does not change selection.
    """
    import optax

    trajs = np.asarray(trajs, np.float32)
    targets = np.asarray(targets, np.float32)
    outcomes = np.asarray(outcomes, np.float32)
    n = trajs.shape[0]
    rng = np.random.default_rng(seed)
    n_val = max(1, int(round(n * val_fraction)))
    if groups is not None:
        groups = np.asarray(groups)
        val_mask = np.zeros(n, bool)
        for g in rng.permutation(np.unique(groups)):
            if val_mask.sum() >= n_val:
                break
            val_mask |= groups == g
        val_idx = np.flatnonzero(val_mask)
        tr_idx = np.flatnonzero(~val_mask)
    else:
        perm = rng.permutation(n)
        val_idx, tr_idx = perm[:n_val], perm[n_val:]

    mu, sd = float(outcomes[tr_idx].mean()), float(outcomes[tr_idx].std() + 1e-8)
    y = (outcomes - mu) / sd

    model = HypothesisScorer(hidden=tuple(hidden))
    params = model.init(
        jax.random.PRNGKey(seed), jnp.asarray(trajs[0]), jnp.asarray(targets[0])
    )["params"]
    tx = optax.adamw(lr, weight_decay=weight_decay)

    batched = jax.vmap(lambda p, t, tg: model.apply({"params": p}, t, tg), (None, 0, 0))

    def loss_fn(p, t, tg, yy):
        pred = batched(p, t, tg)
        return jnp.mean((pred - yy) ** 2)

    tr = (jnp.asarray(trajs[tr_idx]), jnp.asarray(targets[tr_idx]), jnp.asarray(y[tr_idx]))

    @jax.jit
    def fit(p0):
        def step(carry, _):
            p, opt = carry
            loss, g = jax.value_and_grad(loss_fn)(p, *tr)
            upd, opt = tx.update(g, opt, p)
            return (optax.apply_updates(p, upd), opt), loss

        (p, _), losses = jax.lax.scan(step, (p0, tx.init(p0)), None, length=steps)
        return p, losses

    params, losses = fit(params)
    params = jax.tree.map(np.asarray, params)

    def regret(pick_idx: np.ndarray, idx: np.ndarray) -> float:
        out = outcomes[idx]
        best = out.min(axis=1)
        return float(np.mean(out[np.arange(len(idx)), pick_idx] - best))

    val_pred = np.asarray(
        batched(params, jnp.asarray(trajs[val_idx]), jnp.asarray(targets[val_idx]))
    )
    metrics = {
        "n_train": int(len(tr_idx)),
        "n_val": int(len(val_idx)),
        "final_train_loss": float(losses[-1]),
        "val_mse": float(np.mean((val_pred - y[val_idx]) ** 2)),
        "val_top1_regret": regret(val_pred.argmin(axis=1), val_idx),
        "val_top1_regret_random": regret(
            rng.integers(0, outcomes.shape[1], len(val_idx)), val_idx
        ),
        "val_top1_regret_oracle": 0.0,
        "outcome_mu": mu,
        "outcome_sd": sd,
        # which rows were held out, so callers can baseline other scorers
        # on exactly the same split
        "val_indices": val_idx.tolist(),
    }
    return params, metrics


def save_scorer(path: str, params: Dict, hidden: Tuple[int, ...] = (64, 64)) -> None:
    """Persist scorer params as a flat .npz (keys are '/'-joined paths)."""
    import flax.traverse_util as tu

    flat = {"/".join(k): np.asarray(v) for k, v in tu.flatten_dict(params).items()}
    flat["__hidden__"] = np.asarray(hidden, np.int64)
    np.savez(path, **flat)


def load_scorer(path: str) -> Tuple[Dict, Tuple[int, ...]]:
    """Load (params, hidden) saved by ``save_scorer``."""
    import flax.traverse_util as tu

    with np.load(path) as z:
        hidden = tuple(int(v) for v in z["__hidden__"])
        flat = {tuple(k.split("/")): z[k] for k in z.files if k != "__hidden__"}
    return tu.unflatten_dict(flat), hidden
