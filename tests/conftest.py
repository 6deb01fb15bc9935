"""Test harness: force an 8-virtual-device CPU platform before JAX initializes.

Multi-chip sharding paths are validated on a virtual CPU mesh (no TPU pod available in
CI); bench.py separately targets the real TPU chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
