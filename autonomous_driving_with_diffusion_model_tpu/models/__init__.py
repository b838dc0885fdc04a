from .blocks import (
    Conv1dBlock,
    Downsample1d,
    LinearAttention,
    ResidualTemporalMapBlock,
    TrajPredict,
    Upsample1d,
)
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101, resnet152
from .scorer import (
    HypothesisScorer,
    init_scorer,
    load_scorer,
    save_scorer,
    score_trajs,
    train_scorer,
)
from .temporal_unet import TemporalMapUnet, build_model
from .torch_convert import (
    apply_ema_shadow_params,
    build_mapping,
    load_torch_checkpoint,
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)

__all__ = [
    "Conv1dBlock",
    "Downsample1d",
    "LinearAttention",
    "ResidualTemporalMapBlock",
    "TrajPredict",
    "Upsample1d",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "HypothesisScorer",
    "init_scorer",
    "score_trajs",
    "train_scorer",
    "save_scorer",
    "load_scorer",
    "TemporalMapUnet",
    "build_model",
    "build_mapping",
    "torch_state_dict_to_variables",
    "variables_to_torch_state_dict",
    "apply_ema_shadow_params",
    "load_torch_checkpoint",
]
