"""QAttentionBCAgent: update/act/save/load through the Agent contract."""

import numpy as np
import pytest

from voxactb_tpu.agents.qattention_agent import QAttentionBCAgent
from voxactb_tpu.config import MethodConfig

CAMERAS = ["wrist", "wrist2"]
BOUNDS = [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]
IMG = 16


def tiny_cfg(**kw):
    base = dict(
        voxel_sizes=[10], num_latents=16, latent_dim=32, transformer_depth=1,
        cross_dim_head=16, latent_dim_head=16, final_dim=8, lr=1e-3,
        which_arm="dominant", arm_pred_loss=True, apply_se3=True,
    )
    base.update(kw)
    return MethodConfig(**base)


def synthetic_batch(rng, cfg, b=2):
    batch = {
        "trans_action_indicies": rng.integers(0, 10, (b, 3)).astype(np.int32),
        "rot_grip_action_indicies": np.concatenate(
            [rng.integers(0, 72, (b, 3)), rng.integers(0, 2, (b, 1))], -1
        ).astype(np.int32),
        "ignore_collisions": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "gripper_pose": np.concatenate(
            [rng.uniform([-0.3, -0.5, 0.5], [0.7, 0.5, 1.5], (b, 3)),
             rng.normal(size=(b, 4))], -1).astype(np.float32),
        "lang_goal_emb": rng.normal(size=(b, 1024)).astype(np.float32),
        "lang_token_embs": rng.normal(size=(b, 77, 512)).astype(np.float32),
        "low_dim_state": rng.normal(size=(b, cfg.low_dim_size())).astype(np.float32),
        "label": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "scene_bounds": np.asarray(BOUNDS, np.float32),
    }
    batch["gripper_pose"][:, 3:] /= np.linalg.norm(
        batch["gripper_pose"][:, 3:], axis=-1, keepdims=True)
    for c in CAMERAS:
        batch[f"{c}_rgb"] = rng.integers(0, 255, (b, IMG, IMG, 3)).astype(np.float32)
        batch[f"{c}_point_cloud"] = rng.uniform(
            -0.5, 1.5, (b, IMG, IMG, 3)).astype(np.float32)
    return batch


def synthetic_obs(rng):
    obs = {
        "lang_goal_emb": rng.normal(size=(1024,)).astype(np.float32),
        "lang_token_embs": rng.normal(size=(77, 512)).astype(np.float32),
        "low_dim_state_left_arm": rng.normal(size=(1, 4)).astype(np.float32),
        "low_dim_state_right_arm": rng.normal(size=(1, 5)).astype(np.float32),
    }
    for c in CAMERAS:
        obs[f"{c}_rgb"] = rng.integers(0, 255, (1, IMG, IMG, 3)).astype(np.float32)
        obs[f"{c}_point_cloud"] = rng.uniform(
            -0.5, 1.5, (1, IMG, IMG, 3)).astype(np.float32)
        obs[f"{c}_camera_extrinsics"] = np.eye(4, dtype=np.float32)
        obs[f"{c}_camera_intrinsics"] = np.array(
            [[110.0, 0, IMG / 2], [0, 110.0, IMG / 2], [0, 0, 1]], np.float32)
    return obs


@pytest.fixture(scope="module")
def trained_agent():
    rng = np.random.default_rng(0)
    cfg = tiny_cfg()
    agent = QAttentionBCAgent(cfg, CAMERAS, BOUNDS, batch_size=2,
                              training_iterations=100)
    agent.build(training=True)
    batch = synthetic_batch(rng, cfg)
    losses = [float(np.asarray(agent.update(i, dict(batch))["total_loss"]))
              for i in range(4)]
    return agent, losses


def test_update_decreases_loss(trained_agent):
    _, losses = trained_agent
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch repeated -> loss must drop


def test_act_returns_valid_action(trained_agent):
    agent, _ = trained_agent
    rng = np.random.default_rng(1)
    res = agent.act(0, synthetic_obs(rng), which_arm="dominant",
                    dominant_assitive_policy=True,
                    new_scene_bounds=[0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    action = np.asarray(res.action)
    assert action.shape == (9,)
    assert (action[:3] >= 0).all() and (action[:3] <= 1).all()  # inside crop bounds
    np.testing.assert_allclose(np.linalg.norm(action[3:7]), 1.0, atol=1e-5)
    assert action[7] in (0.0, 1.0) and action[8] in (0.0, 1.0)
    assert "attention_coordinate" in res.observation_elements
    assert res.observation_elements["trans_action_indicies"].shape == (3,)
    assert "wrist_pixel_coord" in res.observation_elements


def test_save_load_roundtrip(trained_agent, tmp_path):
    agent, _ = trained_agent
    rng = np.random.default_rng(2)
    obs = synthetic_obs(rng)
    before = np.asarray(agent.act(0, obs, which_arm="dominant",
                                  dominant_assitive_policy=True).action)
    agent.save_weights(str(tmp_path))

    cfg = tiny_cfg()
    fresh = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    fresh.build(training=False)
    fresh.load_weights(str(tmp_path))
    after = np.asarray(fresh.act(0, obs, which_arm="dominant",
                                 dominant_assitive_policy=True).action)
    np.testing.assert_allclose(before, after, atol=1e-5)


def test_resume_restores_optimizer_state_and_step(trained_agent, tmp_path):
    """Regression: OfflineTrainRunner loads a checkpoint BEFORE the first
    update, when no TrainState exists yet — the optimizer state and step must
    survive into the rebuilt state (a silent reset restarts the LR schedule
    and the fold_in(rng, step) augmentation stream)."""
    agent, _ = trained_agent
    agent.save_weights(str(tmp_path))
    saved_step = int(agent._state.step)
    assert saved_step > 0

    cfg = tiny_cfg()
    batch = synthetic_batch(np.random.default_rng(0), cfg)
    fresh = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    fresh.build(training=True)
    fresh.load_weights(str(tmp_path))  # resume path: before any update
    fresh.update(saved_step, dict(batch))
    assert int(fresh._state.step) == saved_step + 1
    # LAMB second moments must be the checkpoint's, not zeros
    import jax
    nu_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        fresh._state.opt_state) if hasattr(x, "shape")]
    assert any(np.abs(leaf).sum() > 0 for leaf in nu_leaves)


def test_real_robot_tuple(trained_agent):
    agent, _ = trained_agent
    rng = np.random.default_rng(3)
    res = agent.act(0, synthetic_obs(rng), which_arm="dominant",
                    dominant_assitive_policy=True, is_real_robot=True)
    pos, quat, grip = res.action
    assert pos.shape == (3,) and quat.shape == (4,) and grip.shape == (1,)


def test_agent_memorizes_training_batch(rng):
    """End-to-end learning correctness: enough updates on one batch drive the
    translation argmax to the ground-truth voxel (loss path + gradients + decode
    all consistent)."""
    cfg = tiny_cfg(apply_se3=False, lr=5e-3, arm_pred_loss=False,
                   input_dropout=0.0, attn_dropout=0.0)
    agent = QAttentionBCAgent(cfg, CAMERAS, BOUNDS, batch_size=2,
                              training_iterations=200)
    agent.build(training=True)
    batch = synthetic_batch(rng, cfg)
    batch.pop("label")
    for i in range(60):
        out = agent.update(i, dict(batch))
    assert float(np.asarray(out["total_loss"])) < 2.0

    # act on the training observations with the same bounds: argmax == GT voxel
    import jax.numpy as jnp
    from voxactb_tpu.agents.qfunction import make_infer_fn

    _, infer = make_infer_fn(cfg)
    rgbs = tuple(jnp.asarray(batch[f"{c}_rgb"]) for c in CAMERAS)
    pcds = tuple(jnp.asarray(batch[f"{c}_point_cloud"]) for c in CAMERAS)
    res = infer(agent.params, rgbs, pcds,
                jnp.asarray(batch["low_dim_state"]),
                jnp.asarray(batch["lang_goal_emb"]),
                jnp.asarray(batch["lang_token_embs"]),
                jnp.asarray(BOUNDS, jnp.float32)[None])
    pred = np.asarray(res.trans_idx)
    np.testing.assert_array_equal(pred, batch["trans_action_indicies"])
    rot_pred = np.asarray(res.rot_grip_idx)
    np.testing.assert_array_equal(rot_pred, batch["rot_grip_action_indicies"])


def test_remat_train_step_runs_and_matches(rng):
    """cfg.remat=True must produce the same loss as remat=False (rematerialization
    changes scheduling, not math). Regression: jax.checkpoint used to receive
    train=True as a traced kwarg and crash on the module's bool conversion."""
    batch = synthetic_batch(rng, tiny_cfg())
    losses = {}
    for remat in (False, True):
        cfg = tiny_cfg(remat=remat, apply_se3=False,
                       input_dropout=0.0, attn_dropout=0.0)
        agent = QAttentionBCAgent(cfg, CAMERAS, BOUNDS, batch_size=2,
                                  training_iterations=100)
        agent.build(training=True)
        out = agent.update(0, dict(batch))
        losses[remat] = float(np.asarray(out["total_loss"]))
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)
