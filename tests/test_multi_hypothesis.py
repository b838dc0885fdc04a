"""Multi-hypothesis planning: K trajectories per plan in one fused program,
best-of-K selection (TPU-native extension; docs/ROADMAP item 2)."""

import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.driving.plan import DiffusionPlanner
from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg
from autonomous_driving_with_diffusion_model_tpu.utils.constants import MAGIC_NUM


def _cfg(k, use_cond="NO_GUIDANCE"):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.EVAL.SAMPLE_STEPS = 2
    cfg.TRAIN.USE_COND = use_cond
    cfg.GUIDANCE.USE_COND = use_cond
    cfg.TPU.NUM_HYPOTHESES = k
    return cfg


@pytest.fixture
def rgb(rng):
    return rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)


def test_k1_plan_contract_unchanged(rgb):
    planner = DiffusionPlanner(_cfg(1))
    traj = planner.plan(rgb)
    assert traj.shape == (1, 16, 7)
    trajs, best = planner.plan_hypotheses(rgb)
    assert trajs.shape == (1, 16, 7) and best == 0
    np.testing.assert_array_equal(traj[0], trajs[0])


def test_best_of_k_minimizes_jerk_no_guidance(rgb):
    planner = DiffusionPlanner(_cfg(4))
    trajs, best = planner.plan_hypotheses(rgb)
    assert trajs.shape == (4, 16, 7)
    # hypotheses are distinct (distinct init noise rows)
    assert not np.allclose(trajs[0], trajs[1])
    jerk = np.diff(trajs[..., :2], n=2, axis=1)
    scores = np.sum(jerk * jerk, axis=(1, 2))
    assert best == int(np.argmin(scores))
    np.testing.assert_array_equal(planner.plan(rgb)[0], trajs[best])


def test_best_of_k_minimizes_target_error_cfg(rgb):
    planner = DiffusionPlanner(_cfg(4, "FREE_GUIDANCE"))
    target = np.array([0.3, 0.1], np.float32)
    trajs, best = planner.plan_hypotheses(rgb, target)
    assert trajs.shape == (4, 16, 7)
    err = trajs[:, -1, :2] / MAGIC_NUM - target[None]
    scores = np.sum(err * err, axis=-1)
    assert best == int(np.argmin(scores))


def test_k_hypotheses_deterministic_with_fixed_noise(rgb):
    planner = DiffusionPlanner(_cfg(3))
    a, _ = planner.plan_hypotheses(rgb)
    b, _ = planner.plan_hypotheses(rgb)
    np.testing.assert_array_equal(a, b)  # fixed init noise across plans


def test_guidance_loss_scorer_picks_softmin_best(rng):
    """TPU.HYPOTHESIS_SCORER=guidance_loss selects with the TargetGuidance
    objective; equal-seed runs differ from the endpoint scorer only in the
    selected index (same K trajectories)."""
    import jax.numpy as jnp

    from autonomous_driving_with_diffusion_model_tpu.diffusion.guidance import (
        target_guidance_loss,
    )
    from autonomous_driving_with_diffusion_model_tpu.driving.plan import DiffusionPlanner
    from autonomous_driving_with_diffusion_model_tpu.utils.config import create_cfg
    from autonomous_driving_with_diffusion_model_tpu.utils.constants import MAGIC_NUM

    def make(scorer):
        cfg = create_cfg()
        cfg.MODEL.DIM = 8
        cfg.MODEL.PERCEPTION = "tiny"
        cfg.TRAIN.USE_COND = "FREE_GUIDANCE"
        cfg.GUIDANCE.USE_COND = "FREE_GUIDANCE"
        cfg.EVAL.SAMPLE_STEPS = 2
        cfg.TRAIN.IMAGE_HEIGHT = 32
        cfg.TRAIN.IMAGE_WIDTH = 48
        cfg.TPU.NUM_HYPOTHESES = 4
        cfg.TPU.HYPOTHESIS_SCORER = scorer
        return DiffusionPlanner(cfg, seed=0)

    rgb = rng.integers(0, 255, (32, 48, 3), np.uint8)
    target = np.array([0.3, 0.1], np.float32)
    trajs_a, best_a = make("auto").plan_hypotheses(rgb, target)
    trajs_b, best_b = make("guidance_loss").plan_hypotheses(rgb, target)
    np.testing.assert_allclose(trajs_a, trajs_b, atol=1e-5)  # same candidates

    # the guidance_loss pick minimizes the TargetGuidance objective over K
    losses = [
        float(
            target_guidance_loss(
                jnp.asarray(t[None, :, :2] / MAGIC_NUM), jnp.asarray(target[None])
            )
        )
        for t in trajs_b
    ]
    assert best_b == int(np.argmin(losses))
