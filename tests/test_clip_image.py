"""CLIP RN50 image tower: shapes + param count (tiny + canonical-eval-shape)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxactb_tpu.models.clip_image import (
    ClipResNetImageEncoder,
    preprocess_clip_image,
)


def test_tiny_encoder_shapes(rng):
    enc = ClipResNetImageEncoder(layers=(1, 1, 1, 1), width=16, output_dim=32,
                                 heads=4)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = enc.init(jax.random.key(0), x)
    emb = enc.apply(variables, x)
    assert emb.shape == (1, 32)
    assert np.isfinite(np.asarray(emb)).all()

    emb2, pyramid = enc.apply(variables, x, return_pyramid=True)
    assert len(pyramid) == 4
    # stages halve resolution after the stem's /4
    assert pyramid[0].shape[1] == 16 and pyramid[-1].shape[1] == 2


def test_rn50_param_count():
    enc = ClipResNetImageEncoder()
    shapes = jax.eval_shape(
        enc.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
    n = sum(int(np.prod(s.shape))
            for s in jax.tree_util.tree_leaves(shapes["params"]))
    # CLIP RN50 visual tower is ~38.3M params
    assert 30e6 < n < 45e6, n


def test_preprocess():
    rgb = np.random.default_rng(0).integers(0, 255, (100, 160, 3)).astype(np.uint8)
    out = preprocess_clip_image(rgb)
    assert out.shape == (1, 224, 224, 3)
    assert -3.0 < out.mean() < 3.0
