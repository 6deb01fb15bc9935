"""PerceiverVoxelLangEncoder: shapes, determinism, variants, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

SMALL = dict(
    depth=2, voxel_size=10, low_dim_size=4, num_latents=32, latent_dim=64,
    im_channels=8, cross_dim_head=16, latent_dim_head=16, final_dim=8,
    num_rotation_classes=72,
)


def _inputs(rng, b=2, n=10, low_dim=4, num_proprio=1):
    vox = jnp.asarray(rng.normal(size=(b, n, n, n, 10)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(b, num_proprio * low_dim)).astype(np.float32))
    lang_goal = jnp.asarray(rng.normal(size=(b, 1024)).astype(np.float32))
    lang_tok = jnp.asarray(rng.normal(size=(b, 77, 512)).astype(np.float32))
    return vox, proprio, lang_goal, lang_tok


def test_shapes_single_arm(rng):
    model = PerceiverVoxelLangEncoder(**SMALL, arm_pred=True)
    args = _inputs(rng)
    params = model.init(jax.random.key(0), *args)
    out = model.apply(params, *args)
    assert out["trans"].shape == (2, 10, 10, 10, 1)
    assert out["rot_grip"].shape == (2, 72 * 3 + 2)
    assert out["collision"].shape == (2, 2)
    assert out["arm"].shape == (2, 2)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_shapes_two_arm_heads(rng):
    model = PerceiverVoxelLangEncoder(**SMALL, num_proprio=2, two_arm_heads=True)
    args = _inputs(rng, num_proprio=2)
    params = model.init(jax.random.key(0), *args)
    out = model.apply(params, *args)
    for side in ("right", "left"):
        assert out[f"trans_{side}"].shape == (2, 10, 10, 10, 1)
        assert out[f"rot_grip_{side}"].shape == (2, 218)
        assert out[f"collision_{side}"].shape == (2, 2)
    # the two sides share a trunk but have separate heads -> different outputs
    assert not np.allclose(np.asarray(out["trans_right"]), np.asarray(out["trans_left"]))


def test_eval_deterministic_train_stochastic(rng):
    model = PerceiverVoxelLangEncoder(**SMALL)
    args = _inputs(rng)
    params = model.init(jax.random.key(0), *args)
    a = model.apply(params, *args)
    b = model.apply(params, *args)
    np.testing.assert_array_equal(np.asarray(a["trans"]), np.asarray(b["trans"]))
    # train mode applies attention dropout -> different rngs give different outputs
    t1 = model.apply(params, *args, train=True, rngs={"dropout": jax.random.key(1)})
    t2 = model.apply(params, *args, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(t1["trans"]), np.asarray(t2["trans"]))


def test_gradients_flow_everywhere(rng):
    model = PerceiverVoxelLangEncoder(**SMALL)
    args = _inputs(rng, b=1)
    params = model.init(jax.random.key(0), *args)

    def loss(p):
        out = model.apply(p, *args)
        return sum(jnp.sum(v ** 2) for v in out.values())

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero = [jax.tree_util.keystr(k) for k, g in flat if not np.any(np.asarray(g))]
    assert not zero, f"dead params: {zero}"


def test_canonical_param_count():
    """Canonical VoxAct-B config (PERACT_BC.yaml) lands in the reference's ~30-50M range."""
    model = PerceiverVoxelLangEncoder(
        depth=6, voxel_size=50, low_dim_size=8, num_latents=2048, latent_dim=512,
        im_channels=64, cross_dim_head=64, latent_dim_head=64, final_dim=64,
        arm_pred=True,
    )
    shapes = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, 50, 50, 50, 10)), jnp.zeros((1, 8)),
        jnp.zeros((1, 1024)), jnp.zeros((1, 77, 512)),
    )
    n_params = sum(np.prod(s.shape) for s in jax.tree_util.tree_leaves(shapes))
    assert 25e6 < n_params < 60e6, n_params


def test_bfloat16_compute(rng):
    model = PerceiverVoxelLangEncoder(**SMALL, dtype=jnp.bfloat16)
    args = _inputs(rng)
    params = model.init(jax.random.key(0), *args)
    out = model.apply(params, *args)
    assert out["trans"].dtype == jnp.float32  # heads cast back to f32
    assert np.isfinite(np.asarray(out["rot_grip"])).all()
