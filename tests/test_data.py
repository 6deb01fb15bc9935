"""Demo format reader + replay fill pipeline."""

import os
import pickle

import numpy as np
import pytest

from voxactb_tpu.data.fill_replay import (
    discretize_keyframe,
    fill_multi_task_replay,
    fill_replay,
    point_to_voxel_index_np,
)
from voxactb_tpu.data.rlbench_format import (
    DemoReader,
    LoadedDemo,
    decode_depth_rgb,
    encode_depth_rgb,
    permissive_load,
    pointcloud_from_depth,
)
from voxactb_tpu.replay import TaskUniformReplayBuffer, bc_replay_signature

REFERENCE_PKL = (
    "/root/reference/RLBench/tests/unit/assets/tasks/reach_target/"
    "variation0/episodes/episode0/low_dim_obs.pkl"
)


def test_depth_rgb_roundtrip(rng):
    d = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    back = decode_depth_rgb(encode_depth_rgb(d))
    np.testing.assert_allclose(back, d, atol=1.0 / (2 ** 24 - 1) * 2)


def test_pointcloud_from_depth_identity_camera():
    # camera at origin looking along -z with f=-1-ish intrinsics: verify that a known
    # depth produces finite, depth-consistent world points
    h = w = 8
    depth = np.full((h, w), 2.0, np.float32)
    intr = np.array([[-4.0, 0, 4.0], [0, -4.0, 4.0], [0, 0, 1.0]])
    ext = np.eye(4)
    pc = pointcloud_from_depth(depth, ext, intr)
    assert pc.shape == (h, w, 3)
    assert np.isfinite(pc).all()
    np.testing.assert_allclose(pc[..., 2], 2.0, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REFERENCE_PKL),
                    reason="reference demo asset unavailable")
def test_permissive_unpickler_loads_reference_demo():
    demo = permissive_load(REFERENCE_PKL)
    observations = list(getattr(demo, "_observations", demo))
    assert len(observations) > 0
    # single-arm RLBench Observation fields resolve as attributes
    assert hasattr(observations[0], "joint_positions") or hasattr(
        observations[0], "gripper_pose")


class SynthObs:
    """Observation2Robots-shaped synthetic frame."""

    def __init__(self, i, n, rng, target):
        moving = i < n - 3
        self.gripper_right_open = 1.0 if i < n // 2 else 0.0
        self.gripper_left_open = 1.0
        self.joint_velocities_right = np.full(7, 1.0 if moving else 0.0)
        self.joint_velocities_left = np.full(7, 1.0)
        self.gripper_right_pose = np.r_[
            rng.uniform([-0.2, -0.4, 0.6], [0.6, 0.4, 1.2]), 0, 0, 0, 1]
        self.gripper_left_pose = np.r_[
            rng.uniform([-0.2, -0.4, 0.6], [0.6, 0.4, 1.2]), 0, 0, 0, 1]
        self.gripper_right_joint_positions = np.array([0.02, 0.02])
        self.gripper_left_joint_positions = np.array([0.02, 0.02])
        self.ignore_collisions = 1.0
        self.target_object_pos = target
        self.auto_crop_radius = 0.25
        self.rgb = {}
        self.point_cloud = {}
        self.misc = {}
        for cam in ("wrist", "wrist2"):
            self.rgb[cam] = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
            self.point_cloud[cam] = rng.uniform(
                -0.5, 1.5, (8, 8, 3)).astype(np.float32)


def synth_demo(rng, n=14):
    target = rng.uniform([-0.1, -0.3, 0.7], [0.5, 0.3, 1.0]).astype(np.float32)
    return LoadedDemo([SynthObs(i, n, rng, target) for i in range(n)],
                      ["grasp the jar with the right hand"], 0, "synthetic")


def test_discretize_keyframe_matches_host_oracle(rng):
    demo = synth_demo(rng)
    obs = demo.observations[5]
    bounds = [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]
    trans, rot_grip, ign, action = discretize_keyframe(
        obs, demo.observations[4], bounds, 50, 5, "right")
    expect = point_to_voxel_index_np(obs.gripper_right_pose[:3], 50, bounds)
    np.testing.assert_array_equal(trans, expect)
    assert rot_grip.shape == (4,)
    assert rot_grip[3] == int(obs.gripper_right_open)
    assert (0 <= rot_grip[:3]).all() and (rot_grip[:3] < 72).all()
    assert ign == 1


def test_fill_replay_populates_buffer(rng):
    sig = bc_replay_signature(["wrist", "wrist2"], (8, 8), low_dim_size=8,
                              crop_target_obj_voxel=True, arm_pred_loss=True)
    buf = TaskUniformReplayBuffer(256, sig)
    demos = [synth_demo(rng) for _ in range(3)]
    n = fill_replay(
        buf, demos, ["wrist", "wrist2"], [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1],
        voxel_size=50, rotation_resolution=5, which_arm="dominant",
        dominant_assistive_arm_fn=lambda d: "right",
        crop_target_obj_voxel=True, crop_radius=0.3, arm_pred_loss=True,
        arm_id_to_proprio=True,
    )
    assert n > 0 and buf.size == n
    batch = buf.sample_transition_batch(4)
    assert batch["low_dim_state"].shape == (4, 8)
    assert batch["target_object_scene_bounds"].shape == (4, 6)
    # crop bounds must be centered on the rounded target position
    b = batch["target_object_scene_bounds"][0]
    np.testing.assert_allclose(b[3:] - b[:3], 0.6, atol=1e-5)
    assert set(np.unique(batch["label"])) <= {0, 1}
    # terminal rows carry the success reward
    rows = buf.gather(np.arange(buf.size))
    assert (rows["reward"][rows["terminal"]] == 100.0).all()
    assert (rows["reward"][~rows["terminal"]] == 0.0).all()


def test_fill_replay_multiarm_runs_and_routes_per_keyframe_arm(rng):
    """Regression: which_arm='multiarm' crashed in extract_obs (no branch).
    The reference resolves multiarm to the keyframe's arm before extracting
    (launch_utils.py:368-383) and conditions on that arm's instruction half."""
    calls = []

    def fake_encoder(text):
        calls.append(text)
        return np.ones((1, 1024), np.float32), np.ones((1, 77, 512), np.float32)

    sig = bc_replay_signature(["wrist", "wrist2"], (8, 8), low_dim_size=4,
                              arm_pred_loss=True)
    buf = TaskUniformReplayBuffer(256, sig)
    demos = [synth_demo(rng) for _ in range(2)]
    for d in demos:
        d.descriptions = ["hold the jar with left hand and "
                          "open the lid with right hand"]
    n = fill_replay(
        buf, demos, ["wrist", "wrist2"], [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1],
        voxel_size=50, rotation_resolution=5, which_arm="multiarm",
        lang_encoder=fake_encoder, arm_pred_loss=True, arm_pred_input=True,
    )
    assert n > 0 and buf.size == n
    batch = buf.sample_transition_batch(4)
    # arm_pred_input: proprio = gripper state (3) + arm id (1), no timestep
    assert batch["low_dim_state"].shape == (4, 4)
    assert set(np.unique(batch["label"])) <= {0, 1}
    # the instruction halves were encoded (memoized once each + full desc)
    assert "hold the jar with left hand" in calls
    assert "open the lid with right hand" in calls


def test_two_head_pipeline_proprio_contract(rng):
    """Regression: the fill -> replay -> two-head train step shapes must line
    up END TO END (the unit tests hand-built an 8-wide proprio, hiding that
    extract_obs('both') never emitted low_dim_state and the replay column was
    4-wide zero-fill -> perceiver reshape(b,2,4) crash)."""
    import jax
    import jax.numpy as jnp

    from voxactb_tpu.agents.qfunction import make_optimizer, make_train_step
    from voxactb_tpu.config import MethodConfig

    cfg = MethodConfig(
        voxel_sizes=[10], num_latents=16, latent_dim=32, transformer_depth=1,
        cross_dim_head=16, latent_dim_head=16, final_dim=8,
        which_arm="both", variant="one_policy_more_heads", apply_se3=False,
    )
    assert cfg.proprio_width() == 8
    sig = bc_replay_signature(["wrist", "wrist2"], (8, 8),
                              low_dim_size=cfg.proprio_width(), two_arm=True)
    buf = TaskUniformReplayBuffer(64, sig)
    n = fill_replay(
        buf, [synth_demo(rng)], ["wrist", "wrist2"],
        [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1],
        voxel_size=10, rotation_resolution=5, which_arm="both",
    )
    assert n > 0
    batch = buf.sample_transition_batch(2)
    assert batch["low_dim_state"].shape == (2, 8)
    assert np.abs(batch["low_dim_state"]).sum() > 0  # not zero-filled

    batch["scene_bounds"] = np.asarray(
        [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1], np.float32)
    opt = make_optimizer(cfg, 100)
    _, init_fn, step_fn = make_train_step(cfg, opt, ["wrist", "wrist2"])
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = init_fn(jax.random.key(0), jbatch)
    state, metrics = step_fn(state, jbatch, jax.random.key(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_fill_replay_both_arms_routes_labels_per_arm(rng):
    """Regression: which_arm='both' is right-primary — the main action keys must
    store the RIGHT arm's discretized pose and the *_left keys the LEFT arm's."""
    sig = bc_replay_signature(["wrist", "wrist2"], (8, 8), low_dim_size=8,
                              two_arm=True)
    buf = TaskUniformReplayBuffer(256, sig)
    demos = [synth_demo(rng)]
    bounds = [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]
    n = fill_replay(
        buf, demos, ["wrist", "wrist2"], bounds,
        voxel_size=50, rotation_resolution=5, which_arm="both",
        demo_augmentation=False,
    )
    assert n > 0
    rows = buf.gather(np.arange(buf.size))
    right_poses = rows["gripper_pose"]
    left_poses = rows["gripper_pose_left"]
    # left and right arms are at different random positions in the synthetic demo
    assert not np.allclose(right_poses, left_poses)
    for i in range(buf.size):
        expect_r = point_to_voxel_index_np(right_poses[i, :3], 50, bounds)
        expect_l = point_to_voxel_index_np(left_poses[i, :3], 50, bounds)
        np.testing.assert_array_equal(rows["trans_action_indicies"][i], expect_r)
        np.testing.assert_array_equal(
            rows["trans_action_indicies_left"][i], expect_l)
    # rot_grip grip bits come from each arm's own gripper state
    assert set(np.unique(rows["rot_grip_action_indicies"][:, 3])) <= {0, 1}
    assert (rows["rot_grip_action_indicies_left"][:, 3] == 1).all()  # left stays open


def test_fill_multi_task_replay_threads(rng):
    sig = bc_replay_signature(["wrist", "wrist2"], (8, 8), low_dim_size=7)
    buf = TaskUniformReplayBuffer(512, sig)
    tasks = {f"task{j}": [synth_demo(rng) for _ in range(2)] for j in range(3)}
    counts = fill_multi_task_replay(
        buf, tasks, cameras=["wrist", "wrist2"],
        scene_bounds=[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1],
        voxel_size=50, rotation_resolution=5, which_arm="dominant",
        dominant_assistive_arm_fn=lambda d: "right",
    )
    assert sum(counts.values()) == buf.size
    ids = buf.gather(np.arange(buf.size))["task_id"]
    assert set(ids.tolist()) == {0, 1, 2}


class _DiskObs:
    pass


class _DiskDemo:
    def __init__(self, obs):
        self._observations = obs


def test_demo_reader_roundtrip(tmp_path, rng):
    """Write a dataset in the RLBench on-disk format, read it back."""
    from PIL import Image

    ep = tmp_path / "open_jar" / "variation0" / "episodes" / "episode0"
    for cam in ("wrist", "wrist2"):
        (ep / f"{cam}_rgb").mkdir(parents=True)
        (ep / f"{cam}_depth").mkdir(parents=True)

    n = 3
    observations = []
    for i in range(n):
        o = _DiskObs()
        o.misc = {}
        for cam in ("wrist", "wrist2"):
            o.misc[f"{cam}_camera_near"] = 0.1
            o.misc[f"{cam}_camera_far"] = 3.0
            o.misc[f"{cam}_camera_extrinsics"] = np.eye(4)
            o.misc[f"{cam}_camera_intrinsics"] = np.array(
                [[-8.0, 0, 8.0], [0, -8.0, 8.0], [0, 0, 1.0]])
            rgb = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
            depth01 = rng.uniform(0.2, 0.8, (16, 16)).astype(np.float32)
            Image.fromarray(rgb).save(ep / f"{cam}_rgb" / f"{i}.png")
            Image.fromarray(encode_depth_rgb(depth01)).save(
                ep / f"{cam}_depth" / f"{i}.png")
        observations.append(o)

    with open(ep / "low_dim_obs.pkl", "wb") as f:
        pickle.dump(_DiskDemo(observations), f)
    with open(ep / "variation_descriptions.pkl", "wb") as f:
        pickle.dump(["open the jar"], f)

    reader = DemoReader(str(tmp_path))
    demos = reader.load("open_jar", amount=1)
    assert len(demos) == 1
    d = demos[0]
    assert d.descriptions == ["open the jar"]
    assert len(d.observations) == n
    o = d.observations[0]
    assert o.wrist_rgb.shape == (16, 16, 3)
    assert o.wrist_depth.shape == (16, 16)
    assert 0.1 <= o.wrist_depth.min() and o.wrist_depth.max() <= 3.0
    assert o.wrist_point_cloud.shape == (16, 16, 3)


def test_demo_augmentation_multiplies_samples(rng):
    """Every Nth intermediate frame starts a keyframe chain (launch_utils.py:577-596)."""
    from voxactb_tpu.data.fill_replay import reference_split_arm_fn

    sig = bc_replay_signature(["wrist", "wrist2"], (8, 8), low_dim_size=7)
    base_kwargs = dict(
        cameras=["wrist", "wrist2"],
        scene_bounds=[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1],
        voxel_size=50, rotation_resolution=5, which_arm="dominant",
        dominant_assistive_arm_fn=lambda d: "right",
    )
    demos = [synth_demo(rng, n=14)]

    buf_plain = TaskUniformReplayBuffer(512, sig)
    n_plain = fill_replay(buf_plain, demos, demo_augmentation=False, **base_kwargs)

    buf_aug = TaskUniformReplayBuffer(512, sig)
    n_aug = fill_replay(buf_aug, demos, demo_augmentation=True,
                        demo_augmentation_every_n=2, **base_kwargs)
    assert n_aug > n_plain  # intermediate start frames add samples
    # the split convention: first half left-dominant, second half right
    split = reference_split_arm_fn(10)
    assert split(0) == "left" and split(4) == "left"
    assert split(5) == "right" and split(9) == "right"
    assert reference_split_arm_fn(1)(0) == "left"


def test_real_world_demo_reader(tmp_path):
    """RealWorldDemoReader: raw uint16 depth -> meters, front camera only
    (rlbench/utils.py:281-360 semantics)."""
    import pickle

    from PIL import Image

    from voxactb_tpu.data.rlbench_format import RealWorldDemoReader

    from types import SimpleNamespace

    ep = tmp_path / "open_jar" / "variation0" / "episodes" / "episode0"
    (ep / "front_rgb").mkdir(parents=True)
    (ep / "front_depth").mkdir()
    obs_list = [SimpleNamespace(), SimpleNamespace()]
    for i in range(2):
        Image.fromarray(
            np.full((8, 8, 3), 10 * (i + 1), np.uint8)).save(
            ep / "front_rgb" / f"{i}.png")
        Image.fromarray(
            np.full((8, 8), 1500 * (i + 1), np.uint16)).save(
            ep / "front_depth" / f"{i}.png")
    with open(ep / "low_dim_obs.pkl", "wb") as f:
        pickle.dump(obs_list, f)
    with open(ep / "variation_descriptions.pkl", "wb") as f:
        pickle.dump(["open the jar"], f)

    reader = RealWorldDemoReader(str(tmp_path))
    demos = reader.load("open_jar", amount=1)
    assert len(demos) == 1
    o0, o1 = demos[0].observations
    assert o0.front_rgb.shape == (8, 8, 3)
    np.testing.assert_allclose(o0.front_depth, 1.5)   # 1500 mm -> 1.5 m
    np.testing.assert_allclose(o1.front_depth, 3.0)
    assert demos[0].descriptions == ["open the jar"]
