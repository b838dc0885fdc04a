"""Op-level parity of our TPU-native primitives vs torch semantics."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from autonomous_driving_with_diffusion_model_tpu.ops import (
    channel_layer_norm,
    conv1d,
    conv1d_transpose,
    conv2d,
    group_norm,
    mish,
    sinusoidal_pos_emb,
)


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


def test_mish(rng):
    x = rng.standard_normal((4, 16, 8)).astype(np.float32)
    ref = F.mish(torch.from_numpy(x)).numpy()
    assert_close(mish(jnp.asarray(x)), ref)


def test_sinusoidal_pos_emb(rng):
    t = np.array([0.0, 1.0, 5.0, 99.0], dtype=np.float32)
    dim = 64
    import math

    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    args = t[:, None] * freqs[None, :]
    ref = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    assert_close(sinusoidal_pos_emb(jnp.asarray(t), dim), ref, atol=1e-6)


def test_conv1d_matches_torch(rng):
    x = rng.standard_normal((2, 16, 7)).astype(np.float32)
    w = rng.standard_normal((5, 7, 32)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    out = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=1, padding=2)
    # torch: NCW input, weight (O, I, K)
    ref = F.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w.transpose(2, 1, 0)),
        torch.from_numpy(b),
        padding=2,
    ).numpy().transpose(0, 2, 1)
    assert_close(out, ref, atol=2e-5)


def test_conv1d_stride2(rng):
    x = rng.standard_normal((2, 16, 12)).astype(np.float32)
    w = rng.standard_normal((3, 12, 12)).astype(np.float32)
    b = np.zeros((12,), np.float32)
    out = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=1)
    ref = F.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w.transpose(2, 1, 0)),
        stride=2,
        padding=1,
    ).numpy().transpose(0, 2, 1)
    assert out.shape == (2, 8, 12)
    assert_close(out, ref, atol=2e-5)


def test_conv1d_transpose_matches_torch(rng):
    # torch ConvTranspose1d weight layout (I, O, K); ours (K, I, O)
    x = rng.standard_normal((2, 8, 12)).astype(np.float32)
    wt = rng.standard_normal((12, 12, 4)).astype(np.float32)
    b = rng.standard_normal((12,)).astype(np.float32)
    ref = F.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(wt),
        torch.from_numpy(b),
        stride=2,
        padding=1,
    ).numpy().transpose(0, 2, 1)
    w = wt.transpose(2, 0, 1)  # (K, I, O)
    out = conv1d_transpose(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 2, 4, 1)
    assert out.shape == (2, 16, 12)
    assert_close(out, ref, atol=2e-5)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 16, 20, 3)).astype(np.float32)
    w = rng.standard_normal((7, 7, 3, 8)).astype(np.float32)
    out = conv2d(jnp.asarray(x), jnp.asarray(w), None, stride=2, padding=3)
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        stride=2,
        padding=3,
    ).numpy().transpose(0, 2, 3, 1)
    assert_close(out, ref, atol=2e-5)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((3, 16, 32)).astype(np.float32)
    gamma = rng.standard_normal((32,)).astype(np.float32)
    beta = rng.standard_normal((32,)).astype(np.float32)
    out = group_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), num_groups=8)
    ref = F.group_norm(
        torch.from_numpy(x.transpose(0, 2, 1)),
        8,
        torch.from_numpy(gamma),
        torch.from_numpy(beta),
    ).numpy().transpose(0, 2, 1)
    assert_close(out, ref, atol=2e-5)


def test_channel_layer_norm_matches_reference_semantics(rng):
    # reference helpers.py:129-139: biased var over channel dim per position
    x = rng.standard_normal((2, 16, 32)).astype(np.float32)
    g = rng.standard_normal((32,)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 2, 1))  # (B, C, L)
    var = torch.var(xt, dim=1, unbiased=False, keepdim=True)
    mean = torch.mean(xt, dim=1, keepdim=True)
    ref = (
        ((xt - mean) / (var + 1e-5).sqrt() * torch.from_numpy(g)[None, :, None]
         + torch.from_numpy(b)[None, :, None])
        .numpy()
        .transpose(0, 2, 1)
    )
    out = channel_layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    assert_close(out, ref, atol=2e-5)
