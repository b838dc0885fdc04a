from .nn import (
    channel_layer_norm,
    conv1d,
    conv1d_transpose,
    conv2d,
    group_norm,
    mish,
    sinusoidal_pos_emb,
)

__all__ = [
    "mish",
    "sinusoidal_pos_emb",
    "group_norm",
    "channel_layer_norm",
    "conv1d",
    "conv1d_transpose",
    "conv2d",
]
