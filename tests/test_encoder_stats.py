"""Fused encoder head (1x1 conv + lrelu + stats) vs XLA ops (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from voxactb_tpu.models.blocks import softargmax_stats_3d
from voxactb_tpu.ops.pallas.common import LRELU_SLOPE
from voxactb_tpu.ops.pallas.encoder_stats import encoder_stats


def test_matches_xla(rng):
    b, n, cin, c = 2, 10, 10, 8
    x = jnp.asarray(rng.normal(size=(b, n, n, n, cin)).astype(np.float32) * .3,
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(cin, c)).astype(np.float32) * .2)
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * .1)

    d0, kp, gmax = encoder_stats(x, w, bias, interpret=True)

    # bf16 multiply, f32 accumulate — Conv3D's dtype semantics (the kernel casts
    # w to x.dtype exactly as Conv3D casts its params to the compute dtype)
    ref = jax.lax.dot_general(
        x, jnp.broadcast_to(w.astype(x.dtype), w.shape),
        dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bias
    ref_d0 = jnp.where(ref >= 0, ref, ref * LRELU_SLOPE).astype(jnp.bfloat16)
    ref_kp, ref_gmax = softargmax_stats_3d(ref_d0)

    np.testing.assert_allclose(np.asarray(d0, np.float32),
                               np.asarray(ref_d0, np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(ref_kp), atol=2e-2)
    np.testing.assert_allclose(np.asarray(gmax), np.asarray(ref_gmax), atol=1e-2)


def test_model_fused_front_matches_xla_path(rng):
    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    kw = dict(depth=1, voxel_size=10, num_latents=16, latent_dim=64,
              im_channels=8, final_dim=8, num_rotation_classes=4,
              voxel_patch_size=5, voxel_patch_stride=5, dtype=jnp.bfloat16)
    m_ref = PerceiverVoxelLangEncoder(**kw)
    m_fused = PerceiverVoxelLangEncoder(**kw, pallas_encoder=True,
                                        pallas_interpret=True)
    grid = jnp.asarray(rng.normal(size=(1, 10, 10, 10, 10)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    lang = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    tok = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))
    params = m_ref.init(jax.random.key(0), grid, proprio, lang, tok)
    out_ref = m_ref.apply(params, grid, proprio, lang, tok)
    out_fused = m_fused.apply(params, grid, proprio, lang, tok)
    assert set(out_ref) == set(out_fused)
    for k in out_ref:
        a, b = np.asarray(out_fused[k], np.float32), np.asarray(out_ref[k],
                                                                np.float32)
        np.testing.assert_allclose(a, b, atol=5e-2 * max(np.abs(b).max(), 1.0))
