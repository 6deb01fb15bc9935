"""The 'one_policy_more_heads' (2Robots) variant: fused train step + dual-head infer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxactb_tpu.agents.qfunction import (
    make_infer_fn,
    make_optimizer,
    make_train_step,
)
from voxactb_tpu.config import MethodConfig

CAMERAS = ["wrist", "wrist2"]
IMG = 16
BOUNDS = np.asarray([-0.8, -1.0, 0.1, 1.2, 1.0, 2.1], np.float32)


def two_head_cfg():
    return MethodConfig(
        voxel_sizes=[10], num_latents=16, latent_dim=32, transformer_depth=1,
        cross_dim_head=16, latent_dim_head=16, final_dim=8,
        which_arm="both", variant="one_policy_more_heads", apply_se3=True,
    )


def make_batch(rng, cfg, b=2):
    batch = {
        "trans_action_indicies": rng.integers(0, 10, (b, 3)).astype(np.int32),
        "rot_grip_action_indicies": np.concatenate(
            [rng.integers(0, 72, (b, 3)), rng.integers(0, 2, (b, 1))],
            -1).astype(np.int32),
        "trans_action_indicies_left": rng.integers(0, 10, (b, 3)).astype(np.int32),
        "rot_grip_action_indicies_left": np.concatenate(
            [rng.integers(0, 72, (b, 3)), rng.integers(0, 2, (b, 1))],
            -1).astype(np.int32),
        "ignore_collisions": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "gripper_pose": np.concatenate(
            [rng.uniform([-0.3, -0.5, 0.5], [0.7, 0.5, 1.5], (b, 3)),
             np.tile([0, 0, 0, 1.0], (b, 1))], -1).astype(np.float32),
        "gripper_pose_left": np.concatenate(
            [rng.uniform([-0.3, -0.5, 0.5], [0.7, 0.5, 1.5], (b, 3)),
             np.tile([0, 0, 0, 1.0], (b, 1))], -1).astype(np.float32),
        "lang_goal_emb": rng.normal(size=(b, 1024)).astype(np.float32),
        "lang_token_embs": rng.normal(size=(b, 77, 512)).astype(np.float32),
        # two proprio streams (right + left), 4 each
        "low_dim_state": rng.normal(size=(b, 8)).astype(np.float32),
        "scene_bounds": BOUNDS,
    }
    for c in CAMERAS:
        batch[f"{c}_rgb"] = rng.integers(0, 255, (b, IMG, IMG, 3)).astype(
            np.float32)
        batch[f"{c}_point_cloud"] = rng.uniform(
            -0.5, 1.5, (b, IMG, IMG, 3)).astype(np.float32)
    return batch


def test_two_head_train_step_decreases_loss(rng):
    cfg = two_head_cfg()
    opt = make_optimizer(cfg, 100)
    _, init_fn, step_fn = make_train_step(cfg, opt, CAMERAS, low_dim_size=4)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, cfg).items()}
    state = init_fn(jax.random.key(0), batch)
    losses = []
    for i in range(4):
        state, metrics = step_fn(state, batch, jax.random.key(1))
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_two_head_infer_returns_both_arms(rng):
    cfg = two_head_cfg()
    model, infer = make_infer_fn(cfg, low_dim_size=4)
    b = 1
    proprio = jnp.asarray(rng.normal(size=(b, 8)).astype(np.float32))
    lang_goal = jnp.zeros((b, 1024), jnp.float32)
    lang_tok = jnp.asarray(rng.normal(size=(b, 77, 512)).astype(np.float32))
    params = model.init(jax.random.key(0), jnp.zeros((b, 10, 10, 10, 10)),
                        proprio, lang_goal, lang_tok)
    rgbs = tuple(jnp.asarray(rng.integers(0, 255, (b, IMG, IMG, 3)).astype(
        np.float32)) for _ in CAMERAS)
    pcds = tuple(jnp.asarray(rng.uniform(-0.5, 1.5, (b, IMG, IMG, 3)).astype(
        np.float32)) for _ in CAMERAS)
    out = infer(params, rgbs, pcds, proprio, lang_goal, lang_tok, BOUNDS[None])
    # leading head axis: 0 = right, 1 = left
    assert out.trans_idx.shape == (2, b, 3)
    assert out.continuous_action.shape == (2, b, 9)
    right, left = np.asarray(out.continuous_action)
    assert not np.allclose(right, left)  # separate heads
