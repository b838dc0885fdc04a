"""Pallas kernel correctness (interpret mode on the CPU test mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.ops import conv1d, group_norm, mish
from autonomous_driving_with_diffusion_model_tpu.ops.pallas_kernels import fused_conv1d_gn_mish


@pytest.mark.parametrize("cin,cout", [(7, 64), (64, 64), (128, 256)])
def test_fused_conv_block_matches_composite(rng, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, 16, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(cout) * 0.5 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)

    ref = mish(group_norm(conv1d(x, w, b, padding=2), gamma, beta, 8))
    out = fused_conv1d_gn_mish(x, w, b, gamma, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
