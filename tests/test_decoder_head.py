"""Fused Pallas decoder head vs the plain-XLA decoder tail (interpret mode, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxactb_tpu.ops.pallas.common import LRELU_SLOPE
from voxactb_tpu.ops.pallas.decoder_head import decoder_head
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


def test_model_fused_tail_matches_xla_path(rng):
    """Perceiver forward with pallas_decoder (interpret) == plain XLA path."""
    import jax.numpy as jnp
    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    kw = dict(depth=1, voxel_size=10, num_latents=16, latent_dim=64,
              im_channels=8, final_dim=8, num_rotation_classes=4,
              voxel_patch_size=5, voxel_patch_stride=5, two_arm_heads=True,
              num_proprio=2)
    m_ref = PerceiverVoxelLangEncoder(**kw)
    m_fused = PerceiverVoxelLangEncoder(**kw, pallas_decoder=True,
                                        pallas_interpret=True)
    grid = jnp.asarray(rng.normal(size=(1, 10, 10, 10, 10)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(1, 2, 4)).astype(np.float32))
    lang = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    tok = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))
    params = m_ref.init(jax.random.key(0), grid, proprio, lang, tok)
    params2 = m_fused.init(jax.random.key(0), grid, proprio, lang, tok)
    # identical param trees (names, shapes, values): checkpoints interchange freely
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(params2)}
    assert set(flat2) == {jax.tree_util.keystr(k) for k, _ in flat1}
    for k, v in flat1:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat2[jax.tree_util.keystr(k)]))

    out_ref = m_ref.apply(params, grid, proprio, lang, tok)
    out_fused = m_fused.apply(params, grid, proprio, lang, tok)
    assert set(out_ref) == set(out_fused)
    for k in out_ref:
        np.testing.assert_allclose(np.asarray(out_fused[k]), np.asarray(out_ref[k]),
                                   atol=2e-3, rtol=1e-2)
