"""Fused Pallas decoder head vs the plain-XLA decoder tail (interpret mode, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxactb_tpu.ops.pallas.decoder_head import LRELU_SLOPE, decoder_head
from voxactb_tpu.models.blocks import softargmax_stats_3d


def _conv3d_edge(x, k, bias):
    pad = k.shape[0] // 2
    xp = jnp.pad(x, ((0, 0),) + ((pad, pad),) * 3 + ((0, 0),), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp.astype(jnp.float32), k.astype(jnp.float32), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return y + bias


def _reference_chain(d0, u0, wf, bf, wt, bt):
    cat = jnp.concatenate([d0, u0], axis=-1)
    u = _conv3d_edge(cat, wf, bf)
    u = jnp.where(u >= 0, u, u * LRELU_SLOPE).astype(d0.dtype)
    trans = jnp.concatenate(
        [_conv3d_edge(u, wt[i], bt[i]) for i in range(wt.shape[0])], axis=-1)
    kp, gmax = softargmax_stats_3d(u)
    return trans, kp, gmax


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-4), (jnp.bfloat16, 6e-2)])
def test_matches_xla_chain(rng, dtype, atol):
    b, n, c, t = 2, 10, 8, 2
    d0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32) * .3, dtype)
    u0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32) * .3, dtype)
    wf = jnp.asarray(rng.normal(size=(3, 3, 3, 2 * c, c)).astype(np.float32) * .2)
    bf = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * .1)
    wt = jnp.asarray(rng.normal(size=(t, 3, 3, 3, c, 1)).astype(np.float32) * .2)
    bt = jnp.asarray(rng.normal(size=(t,)).astype(np.float32) * .1)

    trans, kp, gmax = decoder_head(d0, u0, wf.astype(dtype), bf,
                                   wt.astype(dtype), bt, interpret=True)
    rt, rkp, rgmax = _reference_chain(d0, u0, wf.astype(dtype), bf,
                                      wt.astype(dtype), bt)
    scale = np.abs(np.asarray(rt)).max()
    np.testing.assert_allclose(np.asarray(trans), np.asarray(rt),
                               atol=atol * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(kp), np.asarray(rkp), atol=5e-2)
    np.testing.assert_allclose(np.asarray(gmax), np.asarray(rgmax),
                               atol=atol * max(scale, 1.0))


def test_single_head(rng):
    b, n, c = 1, 8, 4
    d0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32) * .3)
    u0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32) * .3)
    wf = jnp.asarray(rng.normal(size=(3, 3, 3, 2 * c, c)).astype(np.float32) * .2)
    bf = jnp.zeros((c,), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(1, 3, 3, 3, c, 1)).astype(np.float32) * .2)
    bt = jnp.zeros((1,), jnp.float32)
    trans, kp, gmax = decoder_head(d0, u0, wf, bf, wt, bt, interpret=True)
    rt, rkp, rgmax = _reference_chain(d0, u0, wf, bf, wt, bt)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(rt), atol=2e-4)
    # argmax — the property act() actually consumes — must agree exactly
    assert (np.asarray(trans).reshape(-1).argmax()
            == np.asarray(rt).reshape(-1).argmax())
