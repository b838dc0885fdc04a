"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (TPU execution is covered by bench.py).

The image's sitecustomize pre-imports jax and forces
``jax_platforms="axon,cpu"`` (remote TPU tunnel) programmatically, overriding
any JAX_PLATFORMS env var — so we must override it back via jax.config before
any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU XLA compiles of the ResNet-sized graphs
# take ~1 min each; cache them across test runs under /tmp.
jax.config.update("jax_compilation_cache_dir", "/tmp/adm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
