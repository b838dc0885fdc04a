import os.path as osp

import pytest

from autonomous_driving_with_diffusion_model_tpu.utils.config import (
    create_cfg,
    merge_possible_with_base,
)

CONFIG_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "configs")


def test_defaults_match_reference_keys():
    cfg = create_cfg()
    assert cfg.MODEL.HORIZON == 16
    assert cfg.MODEL.TRANSITION_DIM == 7
    assert cfg.MODEL.DIM == 64
    assert tuple(cfg.MODEL.DIM_MULTS) == (1, 2, 4, 8)
    assert cfg.TRAIN.TIME_STEPS == 100
    assert cfg.TRAIN.NOISE_SCHEDULER.TYPE == "squaredcos_cap_v2"
    assert cfg.TRAIN.NOISE_SCHEDULER.PRED_TYPE == "sample"
    assert cfg.EVAL.SCHEDULER == "ddim"
    assert cfg.GUIDANCE.USE_COND == "NO_GUIDANCE"


def test_base_merge_free_guidance():
    cfg = create_cfg()
    merge_possible_with_base(cfg, osp.join(CONFIG_DIR, "guidance", "free_guidance.yaml"))
    # child overrides
    assert cfg.TRAIN.USE_COND == "FREE_GUIDANCE"
    assert cfg.GUIDANCE.FREE_SCALE == 7.5
    assert cfg.EVAL.SAMPLE_STEPS == 10
    # parent (_BASE_) values survive
    assert cfg.TRAIN.ROOT == "data"
    assert cfg.PROJECT_DIR == "free_guidance_result"


def test_base_merge_classifier_guidance():
    cfg = create_cfg()
    merge_possible_with_base(cfg, osp.join(CONFIG_DIR, "guidance", "classifier_guidance.yaml"))
    assert cfg.GUIDANCE.CLASSIFIER_SCALE == 15.0
    assert cfg.GUIDANCE.LOSS_LIST == [["TargetGuidance", []]]
    assert cfg.EVAL.SAMPLE_STEPS == 2


def test_merge_from_list():
    cfg = create_cfg()
    cfg.merge_from_list(["EVAL.SAMPLE_STEPS", "50", "TRAIN.LR", "0.001", "EVAL.CHECKPOINT", "a.pth"])
    assert cfg.EVAL.SAMPLE_STEPS == 50
    assert cfg.TRAIN.LR == 0.001
    assert cfg.EVAL.CHECKPOINT == "a.pth"


def test_merge_rejects_unknown_key():
    cfg = create_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_tuple_coercion():
    cfg = create_cfg()
    cfg.merge_from_list(["MODEL.DIM_MULTS", "[1, 2]"])
    assert tuple(cfg.MODEL.DIM_MULTS) == (1, 2)
