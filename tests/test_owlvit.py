"""OWL-ViT detector: shapes, box bias, pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxactb_tpu.models.owlvit import (
    OwlViTDetector,
    OwlViTImageEncoder,
    OwlViTPipeline,
)


def tiny_detector():
    enc = OwlViTImageEncoder(img_size=64, patch=16, dim=32, depth=1, heads=2)
    return OwlViTDetector(embed_dim=16, image_encoder=enc)


def test_detector_shapes(rng):
    det = tiny_detector()
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    params = det.init(jax.random.key(0), img, txt)
    logits, boxes = det.apply(params, img, txt)
    assert logits.shape == (1, 16, 3)
    assert boxes.shape == (1, 16, 4)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()


def test_box_bias_centers_match_grid(rng):
    det = tiny_detector()
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0)
    txt = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    params = det.init(jax.random.key(0), img, txt)
    _, boxes = det.apply(params, img, txt)
    # with near-zero inputs the box head output is dominated by the grid bias:
    # centers should spread across the 4x4 grid, not collapse
    centers = np.asarray(boxes)[0, :, :2]
    assert len(np.unique(np.round(centers[:, 0], 2))) >= 3
    assert len(np.unique(np.round(centers[:, 1], 2))) >= 3


def test_pipeline_detect(rng):
    det = tiny_detector()
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    txt = rng.normal(size=(2, 16)).astype(np.float32)
    params = det.init(jax.random.key(0), img0, jnp.asarray(txt))
    pipe = OwlViTPipeline(det, params, img_size=64)
    rgb = rng.integers(0, 255, (48, 80, 3)).astype(np.uint8)
    box, score = pipe.detect(rgb, txt, score_threshold=0.0)
    assert box.shape == (4,)
    assert 0 <= box[0] <= box[2] <= 80 and 0 <= box[1] <= box[3] <= 48
    with pytest.raises(ValueError, match="no detection"):
        pipe.detect(rgb, txt, score_threshold=1.1)
