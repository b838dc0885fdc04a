"""ResNet perception encoders (flax.linen, NHWC).

A TPU-native re-design of the torchvision-style ResNet family the reference
vendors (reference: modeling/resnet.py:56-333). The planner uses
``resnet34`` with the classifier head re-pointed to the conditioning width
(reference: modeling/temporal.py:83-84). NHWC layout + bf16-capable compute
keep the convs on the MXU; BatchNorm supports train mode (mutable
``batch_stats``) and eval mode with converted running statistics.
"""

from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nn import conv2d
from .blocks import Dense

Dtype = Any


def _kaiming_conv_init(kh: int, kw: int, cin: int):
    """torchvision ResNet conv init: kaiming_normal(fan_out, relu)."""

    def init_w(key, shape, dtype=jnp.float32):
        fan_out = kh * kw * shape[-1]
        std = math.sqrt(2.0 / fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init_w


class Conv2d(nn.Module):
    """2-D conv, weight (Kh, Kw, Cin/groups, Cout), torchvision-style init, no bias."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // self.groups
        k = self.kernel_size
        w = self.param("weight", _kaiming_conv_init(k, k, cin), (k, k, cin, self.features))
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv2d(x.astype(self.dtype), w, b, self.stride, self.padding, self.groups)


class BatchNorm(nn.Module):
    """BatchNorm matching torch semantics (eps 1e-5, momentum 0.1).

    Running stats live in the ``batch_stats`` collection; ``use_running_average``
    selects eval mode. Normalization runs in fp32 regardless of compute dtype.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x32.ndim - 1))
            mean = jnp.mean(x32, axis=reduce_axes)
            var = jnp.var(x32, axis=reduce_axes)
            if not self.is_initializing():
                n = x32.size / self.features
                # torch stores the *unbiased* variance in running_var.
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.eps) * gamma
        out = (x32 - mean) * inv + beta
        return out.astype(orig_dtype)


def max_pool_3x3_s2(x):
    """torch nn.MaxPool2d(kernel_size=3, stride=2, padding=1), NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (reference: modeling/resnet.py:56-110)."""

    expansion = 1
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv2d(self.features, 3, self.stride, 1, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(self.features, name="bn1")(out, use_running_average=not train)
        out = jax.nn.relu(out)
        out = Conv2d(self.features, 3, 1, 1, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(self.features, name="bn2")(out, use_running_average=not train)
        if self.downsample:
            identity = Conv2d(self.features, 1, self.stride, 0, dtype=self.dtype, name="ds_conv")(x)
            identity = BatchNorm(self.features, name="ds_bn")(
                identity, use_running_average=not train
            )
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck block (reference: modeling/resnet.py:113-160)."""

    expansion = 4
    features: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        out_ch = self.features * self.expansion
        identity = x
        out = Conv2d(width, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(width, name="bn1")(out, use_running_average=not train)
        out = jax.nn.relu(out)
        out = Conv2d(
            width, 3, self.stride, 1, groups=self.groups, dtype=self.dtype, name="conv2"
        )(out)
        out = BatchNorm(width, name="bn2")(out, use_running_average=not train)
        out = jax.nn.relu(out)
        out = Conv2d(out_ch, 1, 1, 0, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(out_ch, name="bn3")(out, use_running_average=not train)
        if self.downsample:
            identity = Conv2d(out_ch, 1, self.stride, 0, dtype=self.dtype, name="ds_conv")(x)
            identity = BatchNorm(out_ch, name="ds_bn")(identity, use_running_average=not train)
        return jax.nn.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-compatible ResNet trunk + linear head.

    ``num_classes`` is the head width; the planner re-heads fc to the
    conditioning dim (reference: modeling/temporal.py:84).
    """

    block: Type[nn.Module]
    layers: List[int]
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(64, 7, 2, 3, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(64, name="bn1")(x, use_running_average=not train)
        x = jax.nn.relu(x)
        x = max_pool_3x3_s2(x)

        in_ch = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                needs_ds = s != 1 or in_ch != planes * self.block.expansion
                kwargs = dict(
                    features=planes,
                    stride=s,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )
                if self.block is Bottleneck:
                    kwargs.update(groups=self.groups, base_width=self.width_per_group)
                x = self.block(**kwargs)(x, train=train)
                in_ch = planes * self.block.expansion

        x = jnp.mean(x, axis=(1, 2))  # global average pool, NHWC -> (B, C)
        return Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def resnet18(num_classes=1000, dtype=jnp.float32) -> ResNet:
    return ResNet(BasicBlock, [2, 2, 2, 2], num_classes, dtype=dtype)


def resnet34(num_classes=1000, dtype=jnp.float32) -> ResNet:
    return ResNet(BasicBlock, [3, 4, 6, 3], num_classes, dtype=dtype)


def resnet50(num_classes=1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, [3, 4, 6, 3], num_classes, dtype=dtype)


def resnet101(num_classes=1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, [3, 4, 23, 3], num_classes, dtype=dtype)


def resnet152(num_classes=1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, [3, 8, 36, 3], num_classes, dtype=dtype)


def resnext50_32x4d(num_classes=1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, [3, 4, 6, 3], num_classes, groups=32, width_per_group=4, dtype=dtype)


def wide_resnet50_2(num_classes=1000, dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, [3, 4, 6, 3], num_classes, width_per_group=128, dtype=dtype)
