"""Temporal U-Net building blocks (flax.linen, channels-last).

Re-designed TPU-first versions of the reference blocks
(reference: modeling/helpers.py): trajectories flow as (B, horizon, channels)
so the channel dim sits on the TPU lane dimension and 1-D convs lower to MXU
matmuls. Parameter layouts are chosen so `models.torch_convert` can map torch
checkpoints 1:1 (conv weights stored WIO, dense kernels (in, out)).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nn import (
    channel_layer_norm,
    conv1d,
    conv1d_transpose,
    group_norm,
    mish,
    sinusoidal_pos_emb,
)

Dtype = Any


def _torch_conv_init(k: int, cin: int):
    """torch nn.ConvNd default init: kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)."""
    fan_in = k * cin
    bound = 1.0 / math.sqrt(fan_in)

    def init_w(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -math.sqrt(3.0) * bound, math.sqrt(3.0) * bound)

    def init_b(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init_w, init_b


class Conv1d(nn.Module):
    """Plain 1-D conv, weight (K, Cin, Cout)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        cin = x.shape[-1]
        init_w, init_b = _torch_conv_init(self.kernel_size, cin)
        w = self.param("weight", init_w, (self.kernel_size, cin, self.features))
        b = self.param("bias", init_b, (self.features,)) if self.use_bias else None
        if return_params:  # fused-kernel callers fetch raw params, no compute
            return w, b
        return conv1d(x.astype(self.dtype), w, b, self.stride, self.padding)


class Dense(nn.Module):
    """Linear layer, kernel (in, out), torch-default init."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        cin = x.shape[-1]
        init_w, init_b = _torch_conv_init(1, cin)
        w = self.param("weight", init_w, (cin, self.features))
        b = self.param("bias", init_b, (self.features,)) if self.use_bias else None
        if return_params:
            return w, b
        y = jnp.matmul(x.astype(self.dtype), w.astype(self.dtype))
        if b is not None:
            y = y + b.astype(y.dtype)
        return y


class Conv1dBlock(nn.Module):
    """Conv1d(k, pad=k//2) -> GroupNorm(8) -> Mish (reference: helpers.py:95-112).

    With ``use_pallas`` the whole block runs as one fused Pallas TPU kernel
    (ops.pallas_kernels.fused_conv1d_gn_mish); otherwise the XLA composite.
    Both paths share the same parameters and match to float tolerance.
    """

    features: int
    kernel_size: int = 5
    n_groups: int = 8
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        cin = x.shape[-1]
        init_w, init_b = _torch_conv_init(self.kernel_size, cin)
        w = self.param("weight", init_w, (self.kernel_size, cin, self.features))
        b = self.param("bias", init_b, (self.features,))
        gamma = self.param("norm_weight", nn.initializers.ones, (self.features,))
        beta = self.param("norm_bias", nn.initializers.zeros, (self.features,))
        if return_params:
            return w, b, gamma, beta
        if self.use_pallas:
            from ..ops.pallas_kernels import fused_conv1d_gn_mish

            return fused_conv1d_gn_mish(
                x.astype(self.dtype), w, b, gamma, beta, n_groups=self.n_groups
            )
        x = conv1d(x.astype(self.dtype), w, b, padding=self.kernel_size // 2)
        x = group_norm(x, gamma, beta, self.n_groups)
        return mish(x)


class Downsample1d(nn.Module):
    """Stride-2 conv halving the horizon (reference: helpers.py:77-83)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv1d(self.features, 3, stride=2, padding=1, dtype=self.dtype, name="conv")(x)


class Upsample1d(nn.Module):
    """ConvTranspose1d(4, 2, 1) doubling the horizon (reference: helpers.py:86-92)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        init_w, init_b = _torch_conv_init(4, cin)
        w = self.param("weight", init_w, (4, cin, self.features))
        b = self.param("bias", init_b, (self.features,))
        return conv1d_transpose(x.astype(self.dtype), w, b, stride=2, kernel_size=4, padding=1)


class SinusoidalPosEmb(nn.Module):
    dim: int

    def __call__(self, t):
        return sinusoidal_pos_emb(t, self.dim)


class TimeMLP(nn.Module):
    """SinusoidalPosEmb -> Dense(4d) -> Mish -> Dense(d) (reference: temporal.py:93-98)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        x = sinusoidal_pos_emb(t, self.dim)
        x = Dense(self.dim * 4, dtype=self.dtype, name="fc1")(x)
        x = mish(x)
        return Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class CondMLP(nn.Module):
    """Dense(d) -> Mish -> Dense(d) on the 2-d target point (reference: temporal.py:87-92)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        x = Dense(self.dim, dtype=self.dtype, name="fc1")(c)
        x = mish(x)
        return Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class ResidualTemporalMapBlock(nn.Module):
    """Two Conv1dBlocks with a per-channel conditioning bias and residual path.

    Reference: modeling/temporal.py:23-55 (``ResidualTemporalMapBlockConcat``).
    The conditioning vector t (B, embed_dim) passes Mish -> Dense(out) and is
    added as a per-channel bias after the first conv block.
    """

    features: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, t):
        cin = x.shape[-1]
        block1 = Conv1dBlock(self.features, self.kernel_size, dtype=self.dtype, name="block1")
        block2 = Conv1dBlock(self.features, self.kernel_size, dtype=self.dtype, name="block2")
        time_mlp = Dense(self.features, dtype=self.dtype, name="time_mlp")
        res_conv = (
            Conv1d(self.features, 1, dtype=self.dtype, name="residual_conv")
            if cin != self.features
            else None
        )
        if self.use_pallas:
            # whole residual block as one fused Pallas kernel (same params)
            from ..ops.pallas_kernels import fused_residual_block

            w1, b1, g1, be1 = block1(x, return_params=True)
            dummy_h = jnp.zeros((1, 1, self.features), self.dtype)
            w2, b2, g2, be2 = block2(dummy_h, return_params=True)
            tw, tb = time_mlp(t, return_params=True)
            wres = bres = None
            if res_conv is not None:
                wres, bres = res_conv(x, return_params=True)
            return fused_residual_block(
                x.astype(self.dtype), t.astype(self.dtype),
                w1, b1, g1, be1, tw, tb, w2, b2, g2, be2, wres, bres,
            )
        out = block1(x)
        t_bias = time_mlp(mish(t))
        out = out + t_bias[:, None, :]
        out = block2(out)
        res = res_conv(x) if res_conv is not None else x
        return out + res


class LinearAttention(nn.Module):
    """Linear attention over the horizon (reference: helpers.py:153-172).

    Keys are softmaxed over the sequence dim; context = k^T v is (d x e) per
    head, then queried. Channels-last: x (B, L, C).
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = Conv1d(hidden * 3, 1, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            # (B, L, h*d) -> (B, L, h, d); channel layout matches torch's
            # "(h c) d" split: heads are the slow axis of the channel dim.
            return t.reshape(B, L, self.heads, self.dim_head)

        q = to_heads(q) * (self.dim_head**-0.5)
        k = jax.nn.softmax(to_heads(k).astype(jnp.float32), axis=1).astype(q.dtype)
        v = to_heads(v)
        # context[b,h,d,e] = sum_n k[b,n,h,d] v[b,n,h,e]
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        # out[b,n,h,e] = sum_d context[b,h,d,e] q[b,n,h,d]
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, L, hidden)
        return Conv1d(self.dim, 1, dtype=self.dtype, name="to_out")(out)


class PreNormAttention(nn.Module):
    """Residual(PreNorm(LinearAttention)) (reference: helpers.py:120-150)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("norm_g", nn.initializers.ones, (self.dim,))
        beta = self.param("norm_b", nn.initializers.zeros, (self.dim,))
        h = channel_layer_norm(x, gamma, beta)
        return LinearAttention(self.dim, dtype=self.dtype, name="attn")(h) + x


class TorchLayerNorm(nn.Module):
    """Standard last-dim LayerNorm (torch nn.LayerNorm, eps=1e-5)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight", nn.initializers.ones, (self.dim,))
        beta = self.param("bias", nn.initializers.zeros, (self.dim,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = (x32 - mean) / jnp.sqrt(var + self.eps) * gamma + beta
        return out.astype(x.dtype)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer matching torch's
    ``nn.TransformerEncoderLayer(batch_first=True, activation=silu)``
    (used by the reference TrajPredict, helpers.py:35-41).

    x = norm1(x + MHA(x)); x = norm2(x + FF(x)). Dropout is applied in
    training mode only (rate 0.1, torch default).
    """

    dim: int
    num_heads: int = 4
    ff_dim: Optional[int] = None
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ff = self.ff_dim or self.dim * 4
        head_dim = self.dim // self.num_heads
        B, L, _ = x.shape

        # --- self attention (torch packed in_proj layout: [q; k; v]) ---
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (self.dim, 3 * self.dim)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * self.dim,))
        qkv = jnp.matmul(x.astype(self.dtype), in_proj_w.astype(self.dtype)) + in_proj_b.astype(
            self.dtype
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            return t.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(to_heads, (q, k, v))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(probs)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        attn = Dense(self.dim, dtype=self.dtype, name="out_proj")(attn)
        attn = nn.Dropout(self.dropout_rate, deterministic=deterministic)(attn)
        x = TorchLayerNorm(self.dim, name="norm1")(x + attn)

        # --- feed forward (silu) ---
        h = Dense(ff, dtype=self.dtype, name="linear1")(x)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return TorchLayerNorm(self.dim, name="norm2")(x + h)


class TrajPredict(nn.Module):
    """Transformer predicting the 4-d state sequence from detached actions.

    Reference: modeling/helpers.py:22-59. Used by the classifier-guidance model
    variant: actions (B, pred_len, 3) + time embedding -> states (B, pred_len, 4).
    """

    in_dim: int = 3
    out_dim: int = 4
    pred_len: int = 15
    hidden_dim: int = 64
    num_heads: int = 4
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_embed, deterministic: bool = True):
        B, L, _ = x.shape
        pos = sinusoidal_pos_emb(jnp.arange(L, dtype=jnp.float32), self.hidden_dim)
        h = Dense(self.hidden_dim, dtype=self.dtype, name="input_proj")(x)
        h = h + pos[None, :, :].astype(h.dtype) + time_embed[:, None, :].astype(h.dtype)
        for i in range(self.num_layers):
            h = TransformerEncoderLayer(
                self.hidden_dim,
                self.num_heads,
                self.hidden_dim * 4,
                dtype=self.dtype,
                name=f"layer{i}",
            )(h, deterministic=deterministic)
        h = TorchLayerNorm(self.hidden_dim, name="norm")(h)
        return Dense(self.out_dim, dtype=self.dtype, name="output_proj")(h)
