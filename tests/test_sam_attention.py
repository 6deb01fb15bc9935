"""Fused global-attention kernel (ops/pallas/sam_attention.py) parity vs the
XLA formulation, in interpret mode on CPU (tiny grids)."""

import numpy as np

import jax
import jax.numpy as jnp

from voxactb_tpu.models.sam_encoder import SamImageEncoder, _rel_pos_embed
from voxactb_tpu.ops.pallas.sam_attention import global_rel_attention


def _xla_reference(q, k, v, rel_h_term, rel_w_term, kh, kw):
    """The exact math of WindowAttention's XLA path (q pre-scaled)."""
    bh, t, hd = q.shape
    attn = jnp.einsum("bid,bjd->bij", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(bh, t, kh, kw)
    attn = (attn + rel_h_term[..., :, None].reshape(bh, t, kh, 1)
            + rel_w_term.reshape(bh, t, 1, kw)).reshape(bh, t, t)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bij,bjd->bid", attn, v)


def test_kernel_matches_xla_math(rng):
    kh = kw = 8
    t, bh, hd = kh * kw, 3, 16
    q = jnp.asarray(rng.normal(size=(bh, t, hd)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bh, t, hd)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bh, t, hd)).astype(np.float32),
                    jnp.bfloat16)
    rel_h = jnp.asarray(rng.normal(size=(bh, t, kh)).astype(np.float32))
    rel_w = jnp.asarray(rng.normal(size=(bh, t, kw)).astype(np.float32))

    ref = np.asarray(_xla_reference(q, k, v, rel_h, rel_w, kh, kw),
                     np.float32)
    out = np.asarray(
        global_rel_attention(q, k, v, rel_h, rel_w, kh=kh, kw=kw,
                             interpret=True), np.float32)
    assert out.shape == ref.shape
    # bf16 inputs + hi/lo-split bias: agreement to bf16-level tolerance
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_hi_lo_bias_is_f32_accurate(rng):
    """The hi/lo split must reconstruct the f32 bias far beyond bf16 rounding."""
    r = rng.normal(size=(4, 64)).astype(np.float32) * 7.3
    hi = r.astype(jnp.bfloat16)
    lo = (r - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    rec = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    assert np.abs(rec - r).max() < 2e-4


def test_encoder_fused_matches_xla(rng):
    """Full tiny encoder, fused global path (interpret) vs XLA path at bf16."""
    def enc(fused):
        return SamImageEncoder(
            img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            window_size=2, global_attn_indexes=(1,), out_chans=16,
            fused_global=fused, fused_interpret=True, dtype=jnp.bfloat16)

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = enc(False).init(jax.random.key(0), x)
    # nonzero rel-pos so the bias path is actually exercised
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    for kk in flat:
        if "rel_pos" in "/".join(kk):
            flat[kk] = 0.1 * np.arange(np.prod(flat[kk].shape)).reshape(
                flat[kk].shape).astype(np.float32)
    params = {"params": flax.traverse_util.unflatten_dict(flat)}

    out_xla = np.asarray(enc(False).apply(params, x), np.float32)
    out_fused = np.asarray(enc(True).apply(params, x), np.float32)
    np.testing.assert_allclose(out_fused, out_xla, atol=5e-2, rtol=5e-2)


def test_rel_pos_embed_shapes():
    r = _rel_pos_embed(4, 4, jnp.ones((7, 5)))
    assert r.shape == (4, 4, 5)


def test_encoder_fused_windowed_matches_xla(rng):
    """Windowed blocks through the same kernel (kh=kw=window): parity vs the
    XLA path on a tiny encoder whose block 0 is windowed and block 1 global."""
    def enc(fused_win):
        return SamImageEncoder(
            img_size=64, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            window_size=4, global_attn_indexes=(1,), out_chans=16,
            fused_global=False, fused_windowed=fused_win,
            fused_interpret=True, dtype=jnp.bfloat16)

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = enc(False).init(jax.random.key(0), x)
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    for kk in flat:
        if "rel_pos" in "/".join(kk):
            flat[kk] = 0.1 * np.arange(np.prod(flat[kk].shape)).reshape(
                flat[kk].shape).astype(np.float32)
    params = {"params": flax.traverse_util.unflatten_dict(flat)}

    out_xla = np.asarray(enc(False).apply(params, x), np.float32)
    out_fused = np.asarray(enc(True).apply(params, x), np.float32)
    np.testing.assert_allclose(out_fused, out_xla, atol=5e-2, rtol=5e-2)
