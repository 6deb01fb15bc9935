"""Pallas fused stats head vs the plain-XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from voxactb_tpu.models.blocks import global_max_pool_3d, spatial_softmax_3d
from voxactb_tpu.ops.pallas.stats_head import stats_head


@pytest.mark.parametrize("n,c", [(8, 16), (10, 8)])
def test_matches_reference_path(rng, n, c):
    x = jnp.asarray(rng.normal(size=(2, n, n, n, c)).astype(np.float32) * 0.1)
    kp, gmax = stats_head(x, interpret=True)
    ref_kp = spatial_softmax_3d(x)
    ref_max = global_max_pool_3d(x)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(ref_kp),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gmax), np.asarray(ref_max), atol=1e-5)


def test_peaked_feature_finds_location(rng):
    """A single hot voxel puts the expected position at that voxel's coordinates."""
    n, c = 8, 4
    x = np.zeros((1, n, n, n, c), np.float32)
    x[0, 2, 5, 7, :] = 1.0  # d=2, h=5, w=7
    kp, gmax = stats_head(jnp.asarray(x), interpret=True)
    kp = np.asarray(kp).reshape(c, 3)
    lin = np.linspace(-1, 1, n)
    # reference axis quirk: E[x]=lin[h], E[y]=lin[d], E[z]=lin[w]
    np.testing.assert_allclose(kp[:, 0], lin[5], atol=1e-3)
    np.testing.assert_allclose(kp[:, 1], lin[2], atol=1e-3)
    np.testing.assert_allclose(kp[:, 2], lin[7], atol=1e-3)
    np.testing.assert_allclose(np.asarray(gmax)[0], 1.0, atol=1e-6)


def test_bf16_input(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 8)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    kp, gmax = stats_head(x, interpret=True)
    ref_kp = spatial_softmax_3d(x)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(ref_kp),
                               atol=5e-3, rtol=5e-2)


def test_fused_xla_stats_matches_unfused(rng):
    """softargmax_stats_3d == (spatial_softmax_3d, global_max_pool_3d) exactly."""
    from voxactb_tpu.models.blocks import softargmax_stats_3d

    for n, c, dt in [(8, 16, np.float32), (10, 8, np.float32)]:
        x = jnp.asarray(rng.normal(size=(2, n, n, n, c)).astype(dt) * 0.1)
        kp, gmax = softargmax_stats_3d(x)
        np.testing.assert_allclose(np.asarray(kp), np.asarray(spatial_softmax_3d(x)),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gmax),
                                   np.asarray(global_max_pool_3d(x)), atol=0)

    xb = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 8)).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    kp, gmax = softargmax_stats_3d(xb)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(spatial_softmax_3d(xb)),
                               atol=1e-4, rtol=1e-3)
