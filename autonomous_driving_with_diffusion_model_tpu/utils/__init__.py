from .config import CfgNode, create_cfg, merge_possible_with_base, show_config
from .constants import ACTION_DIM, ANCHOR_DIMS, COLOR_LIST, MAGIC_NUM, STATE_DIM, GuidanceType
from .meters import AverageMeter, MetricMeter

__all__ = [
    "CfgNode",
    "create_cfg",
    "merge_possible_with_base",
    "show_config",
    "GuidanceType",
    "COLOR_LIST",
    "MAGIC_NUM",
    "STATE_DIM",
    "ACTION_DIM",
    "ANCHOR_DIMS",
    "AverageMeter",
    "MetricMeter",
]
