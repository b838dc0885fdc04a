"""DiffusionPlanner: the jitted closed-loop planning engine.

The shared core of both closed-loop agents (reference: interact.py:54-168 and
e2e_driving/diffusion_agent.py:45-232): loads a checkpoint (torch ``.pth``
with EMA-shadow overwrite, or Orbax), builds the fused sampler for the
configured guidance mode, keeps the fixed per-session init noise
(interact.py:100), and exposes ``plan(rgb_u8, target) -> traj`` plus the
ego-frame coordinate transforms and control post-processing helpers.

TPU-native behaviors: image normalization happens on device inside the jitted
plan function (fused with the encoder); the sampler is compiled once at
construction so closed-loop steps never retrace.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..utils.constants import MAGIC_NUM, GuidanceType

__all__ = [
    "DiffusionPlanner",
    "process_next_waypoint",
    "agent_to_world",
    "way_point_to_pixel",
]


def way_point_to_pixel(waypoint: float, magic_num: float = 1.0) -> int:
    """Waypoint -> BEV pixel: 256 - 256*w/magic (reference: train.py:48-50 for
    normalized w with magic_num=1; diffusion_agent.py:35-37 for meters)."""
    return int(256 - waypoint / magic_num * 256)


def process_next_waypoint(next_point, cur_point, yaw):
    """World -> ego-frame target point (reference: interact.py:185-202,
    diffusion_agent.py:253-264): rotate by theta = yaw + pi/2, then
    [local_y, -local_x] / magic_num."""
    if math.isnan(yaw):
        yaw = 0.0
    theta = yaw + math.pi / 2.0
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    local = np.asarray(next_point, np.float64) - np.asarray(cur_point, np.float64)
    local = R.T.dot(local.reshape(-1, 2).T).T
    target = np.stack([local[:, 1], -local[:, 0]], axis=-1) / MAGIC_NUM
    return target.astype(np.float32)


def agent_to_world(agent_pos, yaw, cur_pos):
    """Ego-frame trajectory -> world xy, for in-world debug drawing
    (reference: interact.py:249-260). agent_pos: (H, 2) meters."""
    if math.isnan(yaw):
        yaw = 0.0
    theta = yaw + np.pi / 2.0
    agent_pos = np.asarray(agent_pos, np.float64)
    agent_pos = np.stack([-agent_pos[:, 1], agent_pos[:, 0]], axis=-1)
    R = np.array([[np.cos(theta), np.sin(theta)], [-np.sin(theta), np.cos(theta)]])
    world = R.T.dot(agent_pos.T).T
    return world + np.asarray(cur_pos, np.float64)[None]


class DiffusionPlanner:
    """Checkpoint-backed planner with a pre-compiled sampling function."""

    magic_num = MAGIC_NUM

    def __init__(self, cfg, checkpoint: Optional[str] = None, seed: int = 0):
        import jax
        import jax.numpy as jnp

        from ..data.augment import normalize_images
        from ..diffusion import make_schedule_from_cfg, sampler_from_cfg
        from ..models import build_model

        self.cfg = cfg
        self.use_guidance_type = GuidanceType[cfg.GUIDANCE.USE_COND]
        self.model = build_model(cfg)
        self._jax = jax

        ckpt_path = checkpoint or cfg.EVAL.CHECKPOINT
        if ckpt_path:
            # .pth state_dict + EMA shadow overwrite (interact.py:102-108),
            # or a native Orbax TrainState dir with the same EMA semantics
            from ..train import load_eval_variables

            self.variables = load_eval_variables(self.model, cfg, str(ckpt_path))
        else:
            rng = np.random.default_rng(seed)
            x = jnp.asarray(rng.standard_normal((1, 16, cfg.MODEL.TRANSITION_DIM)), jnp.float32)
            img = jnp.asarray(
                rng.standard_normal((1, cfg.TRAIN.IMAGE_HEIGHT, cfg.TRAIN.IMAGE_WIDTH, 3)),
                jnp.float32,
            )
            self.variables = self.model.init(
                jax.random.PRNGKey(seed), x, img=img, time=jnp.asarray([1.0])
            )

        schedule = make_schedule_from_cfg(cfg)
        sampler = sampler_from_cfg(self.model, schedule, cfg)

        # fixed init noise across plans (interact.py:100, diffusion_agent.py:94);
        # K hypotheses draw K distinct rows of it (TPU.NUM_HYPOTHESES)
        key = jax.random.PRNGKey(seed)
        self.num_hypotheses = max(1, int(cfg.TPU.NUM_HYPOTHESES))
        traj_shape = (self.num_hypotheses, cfg.MODEL.HORIZON, cfg.MODEL.TRANSITION_DIM)
        self.init_trajs = jax.random.normal(key, traj_shape, jnp.float32)
        self._fixed_noise = bool(cfg.TPU.FIXED_INIT_NOISE)
        self._noise_key = jax.random.fold_in(key, 1)

        needs_target = self.use_guidance_type != GuidanceType.NO_GUIDANCE
        hoisted = bool(cfg.TPU.HOIST_PERCEPTION)
        scorer = str(getattr(cfg.TPU, "HYPOTHESIS_SCORER", "auto")).lower()
        if scorer not in ("auto", "guidance_loss", "jerk", "learned"):
            raise ValueError(
                f"TPU.HYPOTHESIS_SCORER={scorer!r}; "
                "use auto | guidance_loss | jerk | learned"
            )
        scorer_params = scorer_hidden = None
        if scorer == "learned":
            # outcome-trained net (models/scorer.py); produced by
            # `learnability.py --learned-scorer`
            from ..models.scorer import load_scorer

            path = str(getattr(cfg.TPU, "SCORER_CHECKPOINT", ""))
            if not path:
                raise ValueError(
                    "TPU.HYPOTHESIS_SCORER=learned needs TPU.SCORER_CHECKPOINT "
                    "(a .npz written by models.scorer.save_scorer)"
                )
            scorer_params, scorer_hidden = load_scorer(path)
            scorer_params = jax.tree.map(jnp.asarray, scorer_params)
        from ..models.temporal_unet import TemporalMapUnet

        def _plan(variables, init_trajs, rgb_u8, target, rng):
            """One fused program: normalize + encode the frame ONCE, denoise
            K hypotheses in a single scan, score them, return (trajs, best)."""
            image = normalize_images(rgb_u8)[None]  # (1, H, W, 3), fused on device
            K = init_trajs.shape[0]
            kwargs = {}
            if hoisted:
                feat = self.model.apply(
                    variables, image, train=False, method=TemporalMapUnet.encode_image
                )
                kwargs["img_feature"] = jnp.tile(feat, (K, 1))
            else:  # strict mode re-encodes per step; tile the image instead
                kwargs["image"] = jnp.tile(image, (K, 1, 1, 1))
            trajs = sampler(
                variables,
                init_trajs,
                target=jnp.tile(target, (K, 1)) if needs_target else None,
                rng=rng,
                **kwargs,
            )
            if scorer == "learned":
                # net trained on counterfactual closed-loop outcomes
                # (models/scorer.py); params are jit-closure constants
                from ..models.scorer import score_trajs

                score = score_trajs(scorer_params, trajs, target[0], scorer_hidden)
            elif scorer == "guidance_loss" and needs_target:
                # score with the TargetGuidance objective itself (softmin-
                # weighted whole-trajectory distance, diffusion/guidance.py) —
                # the same loss classifier guidance descends, applied as a
                # selector over the K candidates (ROADMAP "hypothesis
                # selection"); vmapped per hypothesis on normalized coords
                from ..diffusion.guidance import target_guidance_loss

                score = jax.vmap(
                    lambda t: target_guidance_loss(
                        (t / MAGIC_NUM)[None, :, :2], target
                    )
                )(trajs)
            elif needs_target and scorer != "jerk":
                # closest final waypoint to the (normalized) target point
                err = trajs[:, -1, :2] / MAGIC_NUM - target[0][None]
                score = jnp.sum(err * err, axis=-1)
            else:
                # comfort: minimum squared jerk over the xy path
                jerk = jnp.diff(trajs[..., :2], n=2, axis=1)
                score = jnp.sum(jerk * jerk, axis=(1, 2))
            return trajs, jnp.argmin(score)

        self._plan = jax.jit(_plan)

    def plan(self, rgb_u8: np.ndarray, target: Optional[np.ndarray] = None) -> np.ndarray:
        """rgb_u8: (H, W, 3) uint8 RGB frame; target: (2,) or (1, 2) ego-frame
        normalized target point. Returns (1, horizon, 7) numpy trajectory with
        xy in meters (clamped + magic-scaled, interact.py:166-167). With
        TPU.NUM_HYPOTHESES > 1 this is the best-scoring of K sampled plans."""
        trajs, best = self.plan_hypotheses(rgb_u8, target)
        return trajs[int(best)][None]

    def plan_hypotheses(self, rgb_u8: np.ndarray, target: Optional[np.ndarray] = None):
        """All K hypotheses: ((K, horizon, 7) trajectories, best index)."""
        trajs, best = self.plan_begin(rgb_u8, target)
        return np.asarray(trajs), int(best)

    # ------------------------------------------------------------- pipelining

    def plan_begin(self, rgb_u8: np.ndarray, target: Optional[np.ndarray] = None):
        """Dispatch the fused plan WITHOUT waiting: returns device arrays
        (trajs, best) the TPU is still computing. JAX dispatch is
        asynchronous, so the caller can overlap the plan with host work (the
        next sim tick, sensor decode) and fetch one frame later —
        the standard latency-hiding deployment pattern; no reference
        analogue (its eager per-step loop is host-blocking throughout).
        Identical numerics to ``plan`` (tests/test_driving.py)."""
        import jax
        import jax.numpy as jnp

        if self._fixed_noise:
            init = self.init_trajs
            rng = self._noise_key
        else:
            self._noise_key, sub = jax.random.split(self._noise_key)
            init = jax.random.normal(sub, self.init_trajs.shape, jnp.float32)
            rng = sub
        if target is not None:
            tgt = jnp.asarray(np.asarray(target, np.float32).reshape(1, 2))
        else:
            tgt = jnp.zeros((1, 2), jnp.float32)
        return self._plan(self.variables, init, jnp.asarray(rgb_u8), tgt, rng)

    def plan_fetch(self, handle) -> np.ndarray:
        """Block on a ``plan_begin`` handle; returns the same (1, horizon, 7)
        best-hypothesis trajectory ``plan`` would."""
        trajs, best = handle
        return np.asarray(trajs)[int(best)][None]

    # ---------------------------------------------------------------- control

    @staticmethod
    def post_process_control_interact(throttle_res, steer_res, brake_res):
        """reference: interact.py:218-229 (zeroes steer on hard brake)."""
        if brake_res < 0.05:
            brake_res = 0.0
        if throttle_res > brake_res:
            brake_res = 0.0
        if brake_res > 0.5:
            brake_res = 1.0
            steer_res = 0.0
            throttle_res = 0.0
        return np.array([throttle_res, steer_res, brake_res])

    @staticmethod
    def post_process_control_leaderboard(throttle_res, steer_res, brake_res):
        """reference: diffusion_agent.py:270-278 (keeps steer and brake value)."""
        if brake_res < 0.05:
            brake_res = 0.0
        if throttle_res > brake_res:
            brake_res = 0.0
        if brake_res > 0.5:
            throttle_res = 0.0
        return throttle_res, steer_res, brake_res
