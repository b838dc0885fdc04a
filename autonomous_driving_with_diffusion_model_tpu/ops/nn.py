"""Core neural-net ops, implemented TPU-first (channels-last layouts).

These are the primitive ops the temporal U-Net and perception encoder are built
from. Semantics match the torch ops used by the reference (cited per-function)
to float tolerance so converted checkpoints reproduce reference outputs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "mish",
    "sinusoidal_pos_emb",
    "group_norm",
    "channel_layer_norm",
    "conv1d",
    "conv1d_transpose",
    "conv2d",
]


def mish(x: jax.Array) -> jax.Array:
    """Mish activation: ``x * tanh(softplus(x))`` (reference: nn.Mish)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def sinusoidal_pos_emb(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal timestep embedding (reference: modeling/helpers.py:62-74).

    t: (B,) float or int array -> (B, dim) with [sin | cos] halves.
    """
    half_dim = dim // 2
    scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over channels-last input (reference: nn.GroupNorm in helpers.py:95-112).

    x: (..., L, C). Statistics are computed per sample, per group, over the
    group's channels and all spatial positions (torch semantics, biased var).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    *batch, L, C = x32.shape
    g = num_groups
    xg = x32.reshape(*batch, L, g, C // g)
    # reduce over spatial (L) and within-group channels
    mean = jnp.mean(xg, axis=(-3, -1), keepdims=True)
    var = jnp.var(xg, axis=(-3, -1), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    out = xg.reshape(*batch, L, C) * gamma + beta
    return out.astype(orig_dtype)


def channel_layer_norm(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Per-position channel LayerNorm with biased variance.

    Matches the reference's custom ``LayerNorm`` (modeling/helpers.py:129-139)
    which normalizes over the channel dim for each (batch, position).
    x: (..., L, C).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) / jnp.sqrt(var + eps) * gamma + beta
    return out.astype(orig_dtype)


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """1-D convolution, channels-last.

    x: (B, L, Cin); w: (K, Cin, Cout) [WIO]; returns (B, L', Cout).
    Equivalent to torch ``nn.Conv1d`` with weight transposed (O,I,K)->(K,I,O).
    """
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv1d_transpose(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int = 2,
    kernel_size: int = 4,
    padding: int = 1,
) -> jax.Array:
    """1-D transposed convolution, channels-last.

    Matches torch ``nn.ConvTranspose1d(C, C, kernel_size, stride, padding)``
    (reference: modeling/helpers.py:86-92 uses (4, 2, 1): doubles the length).

    w: (K, Cin, Cout) stored in the *forward-conv* orientation used by
    ``torch_convert`` (torch ConvTranspose1d weight is (Cin, Cout, K); the
    converter transposes it to (K, Cin, Cout) here). A transposed conv equals a
    dilated forward conv with the kernel flipped along K.
    """
    out = lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=0).astype(x.dtype),
        window_strides=(1,),
        padding=[(kernel_size - 1 - padding, kernel_size - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jax.Array:
    """2-D convolution, NHWC (optionally grouped).

    x: (B, H, W, Cin); w: (Kh, Kw, Cin/groups, Cout) [HWIO].
    Equivalent to torch ``nn.Conv2d`` with weight (O,I,Kh,Kw)->(Kh,Kw,I,O).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
