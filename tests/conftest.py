"""Test harness: force an 8-virtual-device CPU platform before JAX initializes.

Multi-chip sharding paths are validated on a virtual CPU mesh (no TPU pod available in
CI); bench.py separately targets the real TPU chip.
"""

import os

# Force, don't setdefault: the session environment pre-sets JAX_PLATFORMS=axon (the
# remote-TPU tunnel), and running unit tests over the tunnel means multi-minute
# compiles and bf16 default matmuls.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize hook calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter boot, which overrides the env var — override it back before any jax use.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
