"""On-device image augmentation (jit-compiled, runs on TPU).

TPU-native re-design of the reference's host-side imgaug pipeline
(reference: dataset/augment.py:10-77, borrowed from COiLTRAiNE): seven
iteration-annealed ops — GaussianBlur, AdditiveGaussianNoise, CoarseDropout,
Dropout, Add, Multiply, LinearContrast — each gated per-image with probability
``frequency_factor`` and applied in random order.

Differences from imgaug (documented divergences; the pipeline is stochastic
data augmentation, not a numerics-parity surface):

* runs vectorized on device in float32 [0, 255] space, fused with
  normalization — the reference decodes + augments per-sample in dataloader
  worker processes;
* CoarseDropout samples its block mask on a fixed 1/8-resolution grid (the
  reference samples size_percent in [0.08, 0.2]);
* random order is a per-image permutation applied via a scanned
  ``lax.switch`` over the op list.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["augment_factors", "augment_batch", "normalize_images", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def augment_factors(image_iteration: jax.Array) -> dict:
    """Iteration-annealed augmentation strengths (reference: augment.py:11-26)."""
    iteration = image_iteration / 32.0
    return {
        "frequency": jnp.minimum(0.05 + iteration / 200000.0, 0.5),
        "color": jnp.minimum(iteration / 1000000.0, 0.5),
        "dropout": 0.198667
        + (0.03856658 - 0.198667) / (1.0 + (iteration / 196416.6) ** 1.863486),
        "blur": jnp.minimum(0.5 + 0.5 * iteration / 100000.0, 0.5),
        "add": 10.0 + 10.0 * iteration / 100000.0,
        "mul_pos": 1.0 + 2.5 * iteration / 200000.0,
        "mul_neg": 1.0 - 0.91 * iteration / 500000.0,
        "contrast_pos": 1.0 + 0.5 * iteration / 500000.0,
        "contrast_neg": 1.0 - 0.5 * iteration / 500000.0,
    }


def _gaussian_blur(x, rng, f):
    """sigma ~ U(0, blur_factor); separable 5-tap kernel built from sigma."""
    sigma = jax.random.uniform(rng, ()) * f["blur"]
    offsets = jnp.arange(-2.0, 3.0)
    sigma_safe = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (offsets / sigma_safe) ** 2)
    k = jnp.where(sigma < 1e-3, jnp.array([0.0, 0.0, 1.0, 0.0, 0.0]), k / jnp.sum(k))
    # separable blur over H then W; x: (H, W, C)
    xt = jnp.moveaxis(x, -1, 0)[:, None]  # (C, 1, H, W)
    kh = k.reshape(1, 1, 5, 1)
    kw = k.reshape(1, 1, 1, 5)
    out = jax.lax.conv_general_dilated(xt, kh, (1, 1), [(2, 2), (0, 0)])
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), [(0, 0), (2, 2)])
    return jnp.moveaxis(out[:, 0], 0, -1)


def _per_channel_shape(rng, f, x):
    """imgaug per_channel semantics: with prob color_factor sample per channel."""
    per_c = jax.random.bernoulli(rng, f["color"])
    return per_c


def _additive_noise(x, rng, f):
    r1, r2, r3 = jax.random.split(rng, 3)
    scale = jax.random.uniform(r1, ()) * f["dropout"] * 255.0
    noise_c = jax.random.normal(r2, x.shape) * scale
    noise_s = jnp.broadcast_to(
        jax.random.normal(r3, x.shape[:-1] + (1,)) * scale, x.shape
    )
    return x + jnp.where(_per_channel_shape(rng, f, x), noise_c, noise_s)


def _coarse_dropout(x, rng, f):
    H, W, C = x.shape
    h8, w8 = max(H // 8, 1), max(W // 8, 1)
    r1, r2, r3 = jax.random.split(rng, 3)
    p = jax.random.uniform(r1, ()) * f["dropout"]
    mask_c = jax.random.bernoulli(r2, p, (h8, w8, C))
    mask_s = jnp.broadcast_to(jax.random.bernoulli(r3, p, (h8, w8, 1)), (h8, w8, C))
    mask = jnp.where(_per_channel_shape(rng, f, x), mask_c, mask_s)
    mask = jax.image.resize(mask.astype(jnp.float32), (H, W, C), "nearest")
    return x * (1.0 - mask)


def _dropout(x, rng, f):
    r1, r2, r3 = jax.random.split(rng, 3)
    p = jax.random.uniform(r1, ()) * f["dropout"]
    drop_c = jax.random.bernoulli(r2, p, x.shape)
    drop_s = jnp.broadcast_to(jax.random.bernoulli(r3, p, x.shape[:-1] + (1,)), x.shape)
    drop = jnp.where(_per_channel_shape(rng, f, x), drop_c, drop_s)
    return x * (1.0 - drop.astype(x.dtype))


def _add(x, rng, f):
    r1, r2 = jax.random.split(rng)
    v_c = jax.random.uniform(r1, (1, 1, x.shape[-1]), minval=-f["add"], maxval=f["add"])
    v_s = jax.random.uniform(r2, (), minval=-f["add"], maxval=f["add"])
    return x + jnp.where(_per_channel_shape(rng, f, x), v_c, v_s)


def _multiply(x, rng, f):
    r1, r2 = jax.random.split(rng)
    v_c = jax.random.uniform(
        r1, (1, 1, x.shape[-1]), minval=f["mul_neg"], maxval=f["mul_pos"]
    )
    v_s = jax.random.uniform(r2, (), minval=f["mul_neg"], maxval=f["mul_pos"])
    return x * jnp.where(_per_channel_shape(rng, f, x), v_c, v_s)


def _linear_contrast(x, rng, f):
    r1, r2 = jax.random.split(rng)
    a_c = jax.random.uniform(
        r1, (1, 1, x.shape[-1]), minval=f["contrast_neg"], maxval=f["contrast_pos"]
    )
    a_s = jax.random.uniform(r2, (), minval=f["contrast_neg"], maxval=f["contrast_pos"])
    alpha = jnp.where(_per_channel_shape(rng, f, x), a_c, a_s)
    return 127.0 + alpha * (x - 127.0)


_OPS = (
    _gaussian_blur,
    _additive_noise,
    _coarse_dropout,
    _dropout,
    _add,
    _multiply,
    _linear_contrast,
)


def _augment_one(x: jax.Array, rng: jax.Array, f: dict) -> jax.Array:
    """Apply the 7 ops in random order, each gated by frequency_factor."""
    rng_perm, rng_ops = jax.random.split(rng)
    perm = jax.random.permutation(rng_perm, len(_OPS))
    op_rngs = jax.random.split(rng_ops, len(_OPS))

    def body(x, sel):
        idx, r = sel
        r_gate, r_op = jax.random.split(r)
        apply = jax.random.bernoulli(r_gate, f["frequency"])
        branches = [partial(op, rng=r_op, f=f) for op in _OPS]
        out = jax.lax.switch(idx, branches, x)
        return jnp.where(apply, out, x), None

    x, _ = jax.lax.scan(body, x, (perm, op_rngs))
    return jnp.clip(x, 0.0, 255.0)


def augment_batch(images_u8: jax.Array, rng: jax.Array, image_iteration: jax.Array) -> jax.Array:
    """Augment a uint8 NHWC batch on device -> float32 [0, 255]."""
    f = augment_factors(jnp.asarray(image_iteration, jnp.float32))
    x = images_u8.astype(jnp.float32)
    rngs = jax.random.split(rng, x.shape[0])
    return jax.vmap(lambda img, r: _augment_one(img, r, f))(x, rngs)


def normalize_images(images: jax.Array) -> jax.Array:
    """[0,255] -> ImageNet-normalized float32 (reference: train.py:156-161)."""
    return (images.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
