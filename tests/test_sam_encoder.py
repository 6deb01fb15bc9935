"""SAM image encoder: shapes, windowing, preprocessing (tiny config on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxactb_tpu.models.sam_encoder import (
    SamImageEncoder,
    preprocess_image,
    window_partition,
    window_unpartition,
)


def tiny_encoder():
    return SamImageEncoder(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        window_size=2, global_attn_indexes=(1,), out_chans=16,
    )


def test_encoder_shapes(rng):
    enc = tiny_encoder()
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 7, 7, 5)).astype(np.float32))
    wins, pad_hw = window_partition(x, 3)
    assert wins.shape == (2 * 3 * 3, 3, 3, 5)
    back = window_unpartition(wins, 3, pad_hw, (7, 7))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_rel_pos_changes_attention(rng):
    """Relative position params must influence the output when nonzero."""
    enc = tiny_encoder()
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = enc.init(jax.random.key(0), x)
    out0 = enc.apply(params, x)

    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    for k in flat:
        if "rel_pos_h" in k:
            flat[k] = np.ones_like(flat[k])
    params2 = {"params": flax.traverse_util.unflatten_dict(flat)}
    out1 = enc.apply(params2, x)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_preprocess_image(rng):
    rgb = rng.integers(0, 255, (48, 96, 3)).astype(np.uint8)
    out = preprocess_image(rgb, img_size=64)
    assert out.shape == (1, 64, 64, 3)
    # aspect-preserving: the long side fills, the short side is padded with zeros
    assert np.abs(out[0, 40:, :, :]).sum() == 0.0  # 48*(64/96)=32 rows used
    assert np.abs(out[0, :32, :64]).sum() > 0


def test_vit_h_config_param_count():
    from voxactb_tpu.models.sam_encoder import sam_vit_h

    enc = sam_vit_h()
    shapes = jax.eval_shape(
        enc.init, jax.random.key(0),
        jnp.zeros((1, 1024, 1024, 3), jnp.float32))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    # SAM ViT-H image encoder is ~637M params
    assert 0.55e9 < n < 0.70e9, n
