"""decoder_head_v3 (inline phase-upsample) vs the XLA oracle and v1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _mk(rng, n, c, t_heads):
    b, s = 2, n // 5
    d0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32),
                     jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(b, s, s, s, c)).astype(np.float32),
                    jnp.bfloat16)
    upk = jnp.asarray((rng.normal(size=(5, 5, 5, c, c)) * 0.08)
                      .astype(np.float32))
    upb = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))
    wf = jnp.asarray((rng.normal(size=(3, 3, 3, 2 * c, c)) * 0.1)
                     .astype(np.float32))
    bf = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(t_heads, 3, 3, 3, c, 1)) * 0.1)
                     .astype(np.float32))
    bt = jnp.asarray((rng.normal(size=(t_heads,)) * 0.1).astype(np.float32))
    return b, d0, h, upk, upb, wf, bf, wt, bt


@pytest.mark.parametrize("t_heads", [1, 2])
def test_v3_matches_oracle(rng, t_heads):
    from voxactb_tpu.ops.pallas.decoder_head import decoder_head
    from voxactb_tpu.ops.pallas.decoder_head_v3 import decoder_head_v3
    from voxactb_tpu.ops.upsample_conv import upsample_conv

    n, c = 20, 16
    b, d0, h, upk, upb, wf, bf, wt, bt = _mk(rng, n, c, t_heads)

    # oracle u0 exactly as Conv3DUpsample's fast path computes it
    # (phase conv + bias, cast to bf16, then lrelu)
    u0 = jax.nn.leaky_relu(
        upsample_conv(h, upk.astype(jnp.bfloat16), upb.astype(jnp.bfloat16),
                      5), 0.02).astype(jnp.bfloat16)
    t1, kp1, g1 = decoder_head(d0, u0, wf, bf, wt, bt, interpret=True)
    t3, kp3, g3 = decoder_head_v3(d0, h, upk, upb, wf, bf, wt, bt,
                                  interpret=True)

    # tolerance note: the oracle composes the 125-phase weight table in bf16
    # (upsample_conv casts the kernel to the compute dtype BEFORE the einsum,
    # rounding intermediates), while v3 composes in f32 and rounds the table
    # once — a ~0.5% systematic weight difference that propagates through the
    # final conv. The action-level contract is the argmax assertion below.
    np.testing.assert_allclose(np.asarray(t3), np.asarray(t1),
                               atol=1.5e-1, rtol=8e-2)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g1),
                               atol=2e-2, rtol=2e-2)
    # kp is a T=0.01 soft-argmax (near-hard): a near-tie flipped by the weight
    # rounding moves a keypoint by one voxel (2/(n-1) ~ 0.105). Allow single-
    # voxel jumps on a few channels but require the bulk to agree tightly.
    kp_d = np.abs(np.asarray(kp3) - np.asarray(kp1))
    assert kp_d.max() < 0.12, kp_d.max()
    assert np.mean(kp_d < 2e-2) > 0.9
    # argmax exactness across the Q field (the action-level contract)
    assert (np.asarray(t3).reshape(b, -1).argmax(-1)
            == np.asarray(t1).reshape(b, -1).argmax(-1)).all()


def test_phase_weight_table_matches_composition(rng):
    """The v3 weight table is a relayout of compose_upsample_kernel's output."""
    from voxactb_tpu.ops.pallas.decoder_head_v3 import _phase_weight_table
    from voxactb_tpu.ops.upsample_conv import compose_upsample_kernel

    c = 8
    k = jnp.asarray(rng.normal(size=(5, 5, 5, c, c)).astype(np.float32))
    comp = np.asarray(compose_upsample_kernel(k, 5))       # [3,3,3,ci,125*co]
    comp = comp.reshape(3, 3, 3, c, 5, 5, 5, c)            # rz, ry, rx, co
    tab = np.asarray(_phase_weight_table(k, 5))            # [5,5,9c,15c]
    tab = tab.reshape(5, 5, 3, 3, c, 3, 5, c)              # rz,ry,dz,dy,ci,dx,rx,co
    # comp[dz,dy,dx,ci,rz,ry,rx,co] == tab[rz,ry,dz,dy,ci,dx,rx,co]
    np.testing.assert_allclose(tab, comp.transpose(4, 5, 0, 1, 3, 2, 6, 7),
                               atol=1e-6)


def test_model_v3_tail_matches_xla_path(rng):
    """Perceiver forward with pallas_decoder_v3 (interpret) == plain XLA path.

    Model dtype is f32 here, so both paths compose the phase table in f32 and
    only reassociation separates them — tolerances are tight.
    """
    import jax
    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    kw = dict(depth=1, voxel_size=10, num_latents=16, latent_dim=64,
              im_channels=8, final_dim=8, num_rotation_classes=4,
              voxel_patch_size=5, voxel_patch_stride=5, two_arm_heads=True,
              num_proprio=2)
    m_ref = PerceiverVoxelLangEncoder(**kw)
    m_v3 = PerceiverVoxelLangEncoder(**kw, pallas_decoder_v3=True,
                                     pallas_interpret=True)
    grid = jnp.asarray(rng.normal(size=(1, 10, 10, 10, 10)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(1, 2, 4)).astype(np.float32))
    lang = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    tok = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))
    params = m_ref.init(jax.random.key(0), grid, proprio, lang, tok)
    params2 = m_v3.init(jax.random.key(0), grid, proprio, lang, tok)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(params2)}
    assert set(flat2) == {jax.tree_util.keystr(k) for k, _ in flat1}

    out_ref = m_ref.apply(params, grid, proprio, lang, tok)
    out_v3 = m_v3.apply(params, grid, proprio, lang, tok)
    assert set(out_ref) == set(out_v3)
    for k in out_ref:
        np.testing.assert_allclose(np.asarray(out_v3[k]),
                                   np.asarray(out_ref[k]),
                                   atol=5e-3, rtol=1e-2, err_msg=k)
