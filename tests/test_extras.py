"""Baselines, prioritized replay, video recorder, gym adapter, domain randomization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# -- baselines -------------------------------------------------------------------


def _cams(rng, b=2, img=16, n=2):
    rgbs = [jnp.asarray(rng.uniform(-1, 1, (b, img, img, 3)).astype(np.float32))
            for _ in range(n)]
    pcds = [jnp.asarray(rng.uniform(-1, 1, (b, img, img, 3)).astype(np.float32))
            for _ in range(n)]
    return rgbs, pcds


def test_cnn_lang_policy(rng):
    from voxactb_tpu.models.baselines import CnnLangPolicy

    m = CnnLangPolicy()
    rgbs, pcds = _cams(rng)
    proprio = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    lang = jnp.asarray(rng.normal(size=(2, 1024)).astype(np.float32))
    params = m.init(jax.random.key(0), rgbs, pcds, proprio, lang)
    out = m.apply(params, rgbs, pcds, proprio, lang)
    assert out.shape == (2, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[:, 3:7]), axis=-1), 1.0, atol=1e-5)


def test_vit_lang_policy(rng):
    from voxactb_tpu.models.baselines import ViTLangPolicy

    m = ViTLangPolicy(patch=8, dim=32, depth=1, heads=2)
    rgbs, pcds = _cams(rng)
    proprio = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    lang = jnp.asarray(rng.normal(size=(2, 1024)).astype(np.float32))
    params = m.init(jax.random.key(0), rgbs, pcds, proprio, lang)
    out = m.apply(params, rgbs, pcds, proprio, lang)
    assert out.shape == (2, 8) and np.isfinite(np.asarray(out)).all()


def test_lingunet_qnet(rng):
    from voxactb_tpu.models.baselines import LingUNetQNet

    m = LingUNetQNet(base_channels=8, levels=2)
    vox = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 10)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    lang = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    params = m.init(jax.random.key(0), vox, proprio, lang)
    out = m.apply(params, vox, proprio, lang)
    assert out["trans"].shape == (1, 16, 16, 16, 1)
    assert out["rot_grip"].shape == (1, 72 * 3 + 2)
    assert out["collision"].shape == (1, 2)


# -- prioritized replay -------------------------------------------------------------


def test_sum_tree_proportional(rng):
    from voxactb_tpu.replay.prioritized import SumTree

    t = SumTree(8)
    t.set(0, 1.0)
    t.set(3, 3.0)
    counts = np.zeros(8)
    g = np.random.default_rng(0)
    for _ in range(2000):
        counts[t.sample(g)] += 1
    assert counts[3] / max(counts[0], 1) == pytest.approx(3.0, rel=0.3)
    assert counts[[1, 2, 4, 5, 6, 7]].sum() == 0


def test_prioritized_buffer(rng):
    from voxactb_tpu.replay import bc_replay_signature
    from voxactb_tpu.replay.prioritized import PrioritizedReplayBuffer

    sig = bc_replay_signature(["wrist"], (8, 8), low_dim_size=4)
    buf = PrioritizedReplayBuffer(32, sig, alpha=1.0)
    for i in range(8):
        buf.add({"reward": float(i),
                 "wrist_rgb": rng.integers(0, 255, (8, 8, 3))})
    # boost one index's priority and confirm it dominates sampling
    buf.set_priority(np.array([5]), np.array([100.0]))
    batch = buf.sample_transition_batch(64)
    assert (batch["reward"] == 5.0).mean() > 0.5
    assert "sampling_probabilities" in batch


# -- video / gym / randomization -----------------------------------------------------


def test_task_recorder(tmp_path, rng):
    from voxactb_tpu.utils.video import CircleCameraMotion, TaskRecorder

    frames = iter(rng.integers(0, 255, (5, 16, 16, 3)).astype(np.uint8))
    rec = TaskRecorder(lambda: next(frames), fps=10)
    for _ in range(5):
        rec.take_snap()
    out = rec.save(str(tmp_path / "ep0"))
    assert out.endswith((".mp4", ".npz"))
    cam = CircleCameraMotion(origin=[0.3, 0, 0.8])
    p1, p2 = cam.step(), cam.step()
    assert not np.allclose(p1, p2)


def test_gym_adapter():
    from voxactb_tpu.envs.gym_adapter import BimanualGymEnv
    from voxactb_tpu.sim.environment import BimanualTaskEnvironment
    from voxactb_tpu.sim.tasks import OpenDrawer

    env = BimanualGymEnv(
        BimanualTaskEnvironment(OpenDrawer, image_size=16, episode_length=3))
    obs, info = env.reset()
    assert "wrist_rgb" in obs
    action = np.r_[0.3, 0.0, 1.0, 0, 0, 0, 1, 1.0, 1.0]
    obs, reward, terminated, truncated, info = env.step(action)
    assert isinstance(reward, float)
    frame = env.render()
    assert frame.shape[-1] == 3
    env.close()


def test_domain_randomization():
    from voxactb_tpu.sim.environment import BimanualTaskEnvironment
    from voxactb_tpu.sim.randomization import (
        DomainRandomizedEnv,
        VisualRandomizationConfig,
    )
    from voxactb_tpu.sim.tasks import OpenJar

    base = BimanualTaskEnvironment(OpenJar, image_size=16, episode_length=3,
                                   seed=5)
    env = DomainRandomizedEnv(base, VisualRandomizationConfig(), seed=1)
    env.launch()
    obs1 = env.reset()
    color1 = base.backend.get_object("jar").color
    obs2 = env.reset()
    color2 = base.backend.get_object("jar").color
    assert color1 != color2  # colors resampled per episode
    assert obs1["wrist_rgb"].dtype == obs2["wrist_rgb"].dtype
    t = env.step(np.r_[0.3, 0.0, 1.0, 0, 0, 0, 1, 1.0, 1.0], "right")
    assert "wrist_point_cloud" in t.observation


def test_bc_lang_agent_update_and_act(rng):
    from voxactb_tpu.agents.baseline_agents import BCLangAgent

    agent = BCLangAgent(["wrist", "wrist2"], network="cnn")
    agent.build(training=True)
    b, img = 2, 16
    batch = {
        "low_dim_state": rng.normal(size=(b, 4)).astype(np.float32),
        "lang_goal_emb": rng.normal(size=(b, 1024)).astype(np.float32),
        "gripper_pose": rng.normal(size=(b, 7)).astype(np.float32),
        "rot_grip_action_indicies": rng.integers(0, 72, (b, 4)).astype(np.int32),
    }
    for c in ("wrist", "wrist2"):
        batch[f"{c}_rgb"] = rng.integers(0, 255, (b, img, img, 3)).astype(np.float32)
        batch[f"{c}_point_cloud"] = rng.normal(size=(b, img, img, 3)).astype(np.float32)
    losses = [float(np.asarray(agent.update(i, batch)["total_loss"]))
              for i in range(5)]
    assert losses[-1] < losses[0]

    obs = {k: (v[:1] if hasattr(v, "ndim") and v.ndim else v)
           for k, v in batch.items()}
    res = agent.act(0, obs, which_arm=None)
    assert np.asarray(res.action).shape == (9,)
