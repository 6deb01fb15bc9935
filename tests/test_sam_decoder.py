"""SAM mask decoder: shapes, box sensitivity, end-to-end segmenter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxactb_tpu.models.sam_decoder import SamMaskDecoder, SamSegmenter
from voxactb_tpu.models.sam_encoder import SamImageEncoder


def test_decoder_shapes(rng):
    dec = SamMaskDecoder(dim=64, heads=4, num_masks=3)
    emb = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5], [0.2, 0.3, 0.9, 0.8]], jnp.float32)
    params = dec.init(jax.random.key(0), emb, boxes)
    masks, iou = dec.apply(params, emb, boxes)
    assert masks.shape == (2, 3, 32, 32)
    assert iou.shape == (2, 3)
    assert np.isfinite(np.asarray(masks)).all()


def test_decoder_box_sensitivity(rng):
    dec = SamMaskDecoder(dim=64, heads=4, num_masks=2)
    emb = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    b1 = jnp.asarray([[0.0, 0.0, 0.3, 0.3]], jnp.float32)
    b2 = jnp.asarray([[0.6, 0.6, 1.0, 1.0]], jnp.float32)
    params = dec.init(jax.random.key(0), emb, b1)
    m1, _ = dec.apply(params, emb, b1)
    m2, _ = dec.apply(params, emb, b2)
    assert not np.allclose(np.asarray(m1), np.asarray(m2))


def test_segmenter_end_to_end(rng):
    enc = SamImageEncoder(img_size=64, patch_size=16, embed_dim=32, depth=1,
                          num_heads=2, window_size=2, global_attn_indexes=(0,),
                          out_chans=32)
    enc_params = enc.init(jax.random.key(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
    seg = SamSegmenter(enc, enc_params, decoder=SamMaskDecoder(dim=32, heads=2),
                       img_size=64)
    rgb = rng.integers(0, 255, (48, 96, 3)).astype(np.uint8)
    mask = seg.segment_box(rgb, [10, 10, 60, 40])
    assert mask.shape == (48, 96) and mask.dtype == bool
