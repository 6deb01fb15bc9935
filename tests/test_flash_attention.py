"""Flash attention kernel (ops/pallas/flash_attention.py) parity vs the XLA
formulation, interpret mode on CPU; plus the perceiver trunk with
pallas_attention on vs off."""

import numpy as np

import jax
import jax.numpy as jnp

from voxactb_tpu.ops.pallas.flash_attention import flash_attention


def _xla(q, k, v):
    sim = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bij,bjd->bid", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def test_kernel_matches_xla(rng):
    bh, tq, tk, hd = 4, 24, 40, 16   # deliberately unaligned everywhere
    q = jnp.asarray(rng.normal(size=(bh, tq, hd)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bh, tk, hd)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bh, tk, hd)).astype(np.float32),
                    jnp.bfloat16)
    ref = np.asarray(_xla(q, k, v), np.float32)
    out = np.asarray(flash_attention(q, k, v, interpret=True), np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_kernel_multiblock_q(rng):
    bh, tq, tk, hd = 2, 96, 64, 8
    q = jnp.asarray(rng.normal(size=(bh, tq, hd)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bh, tk, hd)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bh, tk, hd)).astype(np.float32),
                    jnp.bfloat16)
    ref = np.asarray(_xla(q, k, v), np.float32)
    out = np.asarray(
        flash_attention(q, k, v, q_block=32, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_trunk_flash_matches_xla(rng):
    """Tiny perceiver: pallas_attention on (interpret) vs off, bf16."""
    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    def enc(flash):
        return PerceiverVoxelLangEncoder(
            depth=1, iterations=1, voxel_size=10, initial_dim=10,
            low_dim_size=4, num_rotation_classes=72, num_latents=16,
            latent_dim=32, cross_heads=1, latent_heads=2, cross_dim_head=16,
            latent_dim_head=16, voxel_patch_size=5, voxel_patch_stride=5,
            final_dim=8, pallas_attention=flash, pallas_interpret=True,
            dtype=jnp.bfloat16)

    grid = jnp.asarray(rng.normal(size=(1, 10, 10, 10, 10)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    lang_emb = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    lang_tok = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))

    params = enc(False).init(jax.random.key(0), grid, proprio, lang_emb,
                             lang_tok)
    out0 = enc(False).apply(params, grid, proprio, lang_emb, lang_tok)
    out1 = enc(True).apply(params, grid, proprio, lang_emb, lang_tok)
    for key in out0:
        np.testing.assert_allclose(
            np.asarray(out1[key], np.float32),
            np.asarray(out0[key], np.float32), atol=5e-2, rtol=5e-2,
            err_msg=key)
    # argmax of the translation head must agree (the action decode contract)
    assert (np.asarray(out0["trans"]).reshape(-1).argmax()
            == np.asarray(out1["trans"]).reshape(-1).argmax())
