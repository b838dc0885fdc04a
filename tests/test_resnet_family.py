"""ResNet family coverage: bottleneck variants + grouped-conv parity vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from autonomous_driving_with_diffusion_model_tpu.models.resnet import (
    resnet18,
    resnet50,
    resnext50_32x4d,
    wide_resnet50_2,
)
from autonomous_driving_with_diffusion_model_tpu.ops import conv2d


def test_grouped_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    groups = 4
    w = rng.standard_normal((3, 3, 32 // groups, 64)).astype(np.float32)
    out = conv2d(jnp.asarray(x), jnp.asarray(w), None, stride=1, padding=1, groups=groups)
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        padding=1,
        groups=groups,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


@pytest.mark.parametrize("builder", [resnet18, resnet50, resnext50_32x4d, wide_resnet50_2])
def test_family_builds_and_runs(rng, builder):
    model = builder(num_classes=8)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out.shape == (1, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_resnext_differs_from_wide(rng):
    """Same width math but grouped conv2 => different functions."""
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    mA, mB = resnext50_32x4d(num_classes=8), wide_resnet50_2(num_classes=8)
    vA = mA.init(jax.random.PRNGKey(0), img)
    # parameter shapes must differ in the grouped conv2 of every bottleneck
    wA = vA["params"]["layer1_0"]["conv2"]["weight"]
    vB = mB.init(jax.random.PRNGKey(0), img)
    wB = vB["params"]["layer1_0"]["conv2"]["weight"]
    assert wA.shape != wB.shape  # (3,3,width/32,width) vs (3,3,width,width)
