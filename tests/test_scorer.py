"""Learned hypothesis scorer (models/scorer.py): module contract, outcome
training, persistence, planner integration, and the counterfactual labeling
machinery in learnability.py (env snapshot/restore + candidate_outcome).

TPU-native extension with no reference analogue (the reference drives a
single sample per plan, interact.py:100); see docs/ROADMAP "hypothesis
selection" and learnability.py --learned-scorer for the end-to-end run."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from autonomous_driving_with_diffusion_model_tpu.driving.fake_env import (  # noqa: E402
    FakeDrivingEnv,
)
from autonomous_driving_with_diffusion_model_tpu.driving.plan import (  # noqa: E402
    DiffusionPlanner,
)
from autonomous_driving_with_diffusion_model_tpu.models.scorer import (  # noqa: E402
    init_scorer,
    load_scorer,
    save_scorer,
    score_trajs,
    train_scorer,
)
from autonomous_driving_with_diffusion_model_tpu.utils.config import (  # noqa: E402
    create_cfg,
)
from autonomous_driving_with_diffusion_model_tpu.utils.constants import (  # noqa: E402
    MAGIC_NUM,
)


def test_scorer_shapes_and_per_candidate_independence(rng):
    params = init_scorer(seed=0)
    trajs = rng.standard_normal((5, 16, 7)).astype(np.float32)
    target = np.array([0.2, -0.5], np.float32)
    scores = np.asarray(score_trajs(params, trajs, target))
    assert scores.shape == (5,)
    # candidates are scored independently: permuting rows permutes scores
    perm = rng.permutation(5)
    scores_p = np.asarray(score_trajs(params, trajs[perm], target))
    np.testing.assert_allclose(scores_p, scores[perm], rtol=1e-5, atol=1e-6)


def test_train_scorer_learns_outcome_ranking(rng):
    """On a synthetic dataset whose outcome is a (noisy) function of the
    candidate's endpoint miss, the trained scorer's top-1 regret beats the
    random-pick baseline by a wide margin."""
    n, k = 600, 6
    trajs = rng.standard_normal((n, k, 16, 7)).astype(np.float32)
    trajs[..., :2] *= MAGIC_NUM  # xy channel is in meters at scoring time
    targets = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
    miss = np.linalg.norm(
        trajs[:, :, -1, :2] / MAGIC_NUM - targets[:, None, :], axis=-1
    )
    outcomes = miss + 0.05 * rng.standard_normal((n, k)).astype(np.float32)
    params, m = train_scorer(trajs, targets, outcomes, seed=0)
    assert m["val_top1_regret"] < 0.5 * m["val_top1_regret_random"]
    assert m["final_train_loss"] < 0.5  # standardized-MSE actually descends
    assert len(m["val_indices"]) == m["n_val"]


def test_scorer_save_load_roundtrip(tmp_path, rng):
    params = init_scorer(seed=3, hidden=(32, 16))
    path = str(tmp_path / "scorer.npz")
    save_scorer(path, params, hidden=(32, 16))
    loaded, hidden = load_scorer(path)
    assert hidden == (32, 16)
    trajs = rng.standard_normal((3, 16, 7)).astype(np.float32)
    target = np.zeros(2, np.float32)
    np.testing.assert_array_equal(
        np.asarray(score_trajs(params, trajs, target, (32, 16))),
        np.asarray(score_trajs(loaded, trajs, target, hidden)),
    )


def _tiny_cfg(**tpu):
    cfg = create_cfg()
    cfg.MODEL.DIM = 8
    cfg.MODEL.PERCEPTION = "tiny"
    cfg.EVAL.SAMPLE_STEPS = 2
    cfg.TRAIN.IMAGE_HEIGHT = 32
    cfg.TRAIN.IMAGE_WIDTH = 48
    for key, v in tpu.items():
        setattr(cfg.TPU, key, v)
    return cfg


def test_planner_learned_scorer_selects_net_argmin(tmp_path, rng):
    params = init_scorer(seed=1)
    path = str(tmp_path / "s.npz")
    save_scorer(path, params)
    planner = DiffusionPlanner(
        _tiny_cfg(NUM_HYPOTHESES=4, HYPOTHESIS_SCORER="learned", SCORER_CHECKPOINT=path)
    )
    rgb = rng.integers(0, 255, (32, 48, 3), np.uint8)
    trajs, best = planner.plan_hypotheses(rgb)
    assert trajs.shape == (4, 16, 7)
    # unguided plan passes a zero target through to the scorer
    scores = np.asarray(score_trajs(params, trajs, np.zeros(2, np.float32)))
    assert best == int(np.argmin(scores))


def test_planner_learned_scorer_requires_checkpoint():
    with pytest.raises(ValueError, match="SCORER_CHECKPOINT"):
        DiffusionPlanner(_tiny_cfg(NUM_HYPOTHESES=4, HYPOTHESIS_SCORER="learned"))


# ------------------------------------------------ counterfactual labeling


def test_fake_env_snapshot_restore_exact():
    env = FakeDrivingEnv(image_hw=(8, 12), seed=0)
    env.reset()
    for _ in range(5):
        env.step({0: np.array([0.6, 0.1, 0.0])})
    snap = env.snapshot()
    obs_a = [env.step({0: np.array([0.5, -0.2, 0.0])})[0] for _ in range(4)]
    pos_a, yaw_a = env.pos.copy(), env.yaw
    env.restore(snap)
    obs_b = [env.step({0: np.array([0.5, -0.2, 0.0])})[0] for _ in range(4)]
    np.testing.assert_array_equal(env.pos, pos_a)
    assert env.yaw == yaw_a
    for a, b in zip(obs_a, obs_b):  # RNG state restored -> identical frames
        np.testing.assert_array_equal(a["camera"][0], b["camera"][0])


def test_candidate_outcome_prefers_straight_and_restores_state():
    from learnability import candidate_outcome

    env = FakeDrivingEnv(image_hw=(8, 12), seed=0)
    env.reset()
    for _ in range(3):
        env.step({0: np.array([0.7, 0.0, 0.0])})
    before = env.snapshot()

    def cand(steer):
        c = np.zeros((16, 7), np.float32)
        c[:, 4] = 0.7  # throttle
        c[:, 5] = steer
        return c

    out_straight = candidate_outcome(env, cand(0.0))
    out_veer = candidate_outcome(env, cand(0.8))
    assert out_straight < out_veer
    after = env.snapshot()
    np.testing.assert_array_equal(after["pos"], before["pos"])
    assert after == {**after, **{k: before[k] for k in ("yaw", "speed", "steps")}}


def test_route_deviation_segment_accuracy():
    """Polyline distance must not charge a rollout for the longitudinal gap
    between waypoints (the straight default route has 2 m spacing)."""
    from learnability import _route_geometry, route_deviation_and_progress

    route = np.stack([np.arange(0.0, 20.0, 2.0), np.zeros(10)], axis=-1)
    geom = _route_geometry(route)
    d, s = route_deviation_and_progress(route, (5.0, 0.0), geom)  # between wps
    assert abs(d) < 1e-9 and abs(s - 5.0) < 1e-9
    d, s = route_deviation_and_progress(route, (5.0, 0.7), geom)
    assert abs(d - 0.7) < 1e-9 and abs(s - 5.0) < 1e-9
    # beyond the last waypoint: clamps to the endpoint
    d, s = route_deviation_and_progress(route, (30.0, 0.0), geom)
    assert abs(s - 18.0) < 1e-9 and abs(d - 12.0) < 1e-9


def test_train_scorer_group_split_holds_out_whole_episodes(rng):
    """With ``groups``, validation rows come from complete held-out episodes
    (no row-level leakage between temporally adjacent near-duplicates)."""
    n, k = 200, 4
    trajs = rng.standard_normal((n, k, 16, 7)).astype(np.float32)
    targets = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
    outcomes = rng.standard_normal((n, k)).astype(np.float32)
    groups = np.repeat(np.arange(8), 25)
    _, sm = train_scorer(trajs, targets, outcomes, seed=0, steps=5, groups=groups)
    val_idx = np.asarray(sm["val_indices"])
    val_groups = set(groups[val_idx].tolist())
    train_groups = set(groups[np.setdiff1d(np.arange(n), val_idx)].tolist())
    assert val_groups and val_groups.isdisjoint(train_groups)
    assert len(val_idx) >= int(0.2 * n)
