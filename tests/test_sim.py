"""Sim framework: backend, tasks, scripted demos, validator, end-to-end replay fill."""

import numpy as np
import pytest

from voxactb_tpu.sim.backend import KinematicBackend, SceneObject
from voxactb_tpu.sim.environment import (
    BimanualTaskEnvironment,
    InvalidActionError,
    SimEnvironment,
)
from voxactb_tpu.sim.tasks import TASK_REGISTRY, HandOverItem, OpenDrawer, OpenJar
from voxactb_tpu.sim.validator import task_smoke, validate_all


def test_backend_grasp_and_carry():
    b = KinematicBackend()
    b.add_object(SceneObject("cube", np.array([0.3, 0.0, 0.8])))
    for _ in range(50):
        if b.move_arm_towards("right", [0.3, 0.0, 0.8], [0, 0, 0, 1], 0.05):
            break
        b.step()
    b.set_gripper("right", 0.0)
    assert b.get_object("cube").grasped_by == "right"
    for _ in range(50):
        if b.move_arm_towards("right", [0.3, 0.2, 1.0], [0, 0, 0, 1], 0.05):
            break
    np.testing.assert_allclose(b.get_object("cube").position, [0.3, 0.2, 1.0],
                               atol=1e-6)
    b.set_gripper("right", 1.0)
    assert b.get_object("cube").grasped_by is None


@pytest.mark.parametrize("task_name", sorted(TASK_REGISTRY))
def test_task_smoke_all(task_name):
    """The reference runs task_smoke over its task files (test_tasks.py:20-55)."""
    report = task_smoke(TASK_REGISTRY[task_name], image_size=16,
                        episode_length=25)
    assert report["successes"] == TASK_REGISTRY[task_name].num_variations


def test_dominant_arm_tracks_placement():
    env = BimanualTaskEnvironment(OpenJar, image_size=16, seed=0)
    env.launch()
    env.set_variation(0)  # jar on the right half
    env.reset()
    assert env.dominant_arm() == "right"
    env.set_variation(1)
    env.reset()
    assert env.dominant_arm() == "left"


def test_step_contract_and_success():
    env = BimanualTaskEnvironment(HandOverItem, image_size=16, episode_length=20,
                                  seed=3)
    env.launch()
    obs = env.reset_to_demo(0)
    assert "wrist_rgb" in obs and obs["low_dim_state"].shape == (1, 8)
    cube = env.backend.get_object("cube").position
    dom = env.dominant_arm()
    assistive = "left" if dom == "right" else "right"

    # assistive grasps the cube and presents it; dominant receives
    t = env.step(np.r_[cube, 0, 0, 0, 1, 0.0, 1.0], assistive)
    assert not t.terminal
    meet = np.array([0.3, 0.0, 1.0])
    env.step(np.r_[meet, 0, 0, 0, 1, 0.0, 1.0], assistive)
    env.step(np.r_[meet, 0, 0, 0, 1, 1.0, 1.0], assistive)  # release
    t = env.step(np.r_[meet, 0, 0, 0, 1, 0.0, 1.0], dom)    # receive
    assert t.info["success"] and t.reward == 100.0 and t.terminal


def test_out_of_workspace_action_rejected():
    env = BimanualTaskEnvironment(OpenDrawer, image_size=16)
    env.launch()
    env.reset()
    with pytest.raises(InvalidActionError, match="outside workspace"):
        env.step(np.r_[5.0, 5.0, 5.0, 0, 0, 0, 1, 1.0, 1.0], "right")


def test_scripted_demo_feeds_keypoints_and_replay():
    """sim demo -> keypoint discovery -> fill_replay: the full data path."""
    from voxactb_tpu.data.fill_replay import fill_replay
    from voxactb_tpu.data.rlbench_format import LoadedDemo
    from voxactb_tpu.replay import TaskUniformReplayBuffer, bc_replay_signature
    from voxactb_tpu.utils.keypoints import keypoint_discovery

    env = BimanualTaskEnvironment(OpenJar, image_size=16, episode_length=25,
                                  seed=1)
    env.launch()
    frames, descriptions = env.get_demo(0)
    dom = env.dominant_arm()
    kps, labels = keypoint_discovery(frames, which_arm="dominant",
                                     dominant_assistive_arm=dom)
    assert kps, "scripted demo produced no keyframes"
    assert len(kps) == len(labels)

    sig = bc_replay_signature(["wrist", "wrist2"], (16, 16), low_dim_size=8,
                              crop_target_obj_voxel=True, arm_pred_loss=True)
    buf = TaskUniformReplayBuffer(128, sig)
    demos = [LoadedDemo(frames, descriptions, 0, "sim")]
    n = fill_replay(
        buf, demos, ["wrist", "wrist2"], [-0.45, -0.6, 0.55, 0.65, 0.6, 1.5],
        voxel_size=50, rotation_resolution=5, which_arm="dominant",
        dominant_assistive_arm_fn=lambda d: dom,
        crop_target_obj_voxel=True, crop_radius=0.3, arm_pred_loss=True,
        arm_id_to_proprio=True, demo_augmentation=False,
    )
    assert n == len(kps) and buf.size == n
    batch = buf.sample_transition_batch(2)
    assert batch["target_object_scene_bounds"].shape == (2, 6)
    # with per-frame demo augmentation the same demo yields strictly more samples
    buf2 = TaskUniformReplayBuffer(512, sig)
    n_aug = fill_replay(
        buf2, demos, ["wrist", "wrist2"], [-0.45, -0.6, 0.55, 0.65, 0.6, 1.5],
        voxel_size=50, rotation_resolution=5, which_arm="dominant",
        dominant_assistive_arm_fn=lambda d: dom,
        crop_target_obj_voxel=True, crop_radius=0.3, arm_pred_loss=True,
        arm_id_to_proprio=True, demo_augmentation=True,
        demo_augmentation_every_n=10,
    )
    assert n_aug > n


def test_sim_environment_vends_tasks():
    sim = SimEnvironment(image_size=16)
    sim.launch()
    env = sim.get_task("open_drawer")
    obs = env.reset()
    assert "lang_goal" in obs
    env2 = sim.get_task(OpenJar)
    assert env2.task.name == "open_jar"


def test_validate_all_tasks():
    reports = validate_all(image_size=16)
    assert len(reports) == 4
    assert all(r["successes"] >= 1 for r in reports)


def test_dataset_generator_roundtrip(tmp_path):
    """sim scripted demos -> on-disk dataset -> DemoReader -> replay fill."""
    import sys
    sys.path.insert(0, "tools")
    from dataset_generator import generate

    from voxactb_tpu.data.fill_replay import fill_replay
    from voxactb_tpu.data.rlbench_format import DemoReader
    from voxactb_tpu.replay import TaskUniformReplayBuffer, bc_replay_signature

    n = generate(str(tmp_path), ["open_jar"], episodes=2, image_size=16, seed=0)
    assert n == 2

    reader = DemoReader(str(tmp_path))
    demos = reader.load("open_jar", amount=-1, variation=-1)
    assert len(demos) == 2
    o = demos[0].observations[0]
    assert o.wrist_rgb.shape == (16, 16, 3)
    assert o.wrist_point_cloud.shape == (16, 16, 3)
    assert hasattr(o, "gripper_right_pose") and hasattr(o, "target_object_pos")

    buf = TaskUniformReplayBuffer(
        64, bc_replay_signature(["wrist", "wrist2"], (16, 16), low_dim_size=7,
                                crop_target_obj_voxel=True))
    filled = fill_replay(
        buf, demos, ["wrist", "wrist2"], [-0.45, -0.6, 0.55, 0.65, 0.6, 1.5],
        voxel_size=50, rotation_resolution=5, which_arm="dominant",
        dominant_assistive_arm_fn=lambda d: "right",
        crop_target_obj_voxel=True, crop_radius=0.3,
    )
    assert filled > 0 and buf.size == filled


def test_pyrep_backend_gates_cleanly():
    from voxactb_tpu.sim.pyrep_backend import PyRepBackend, pyrep_available

    if pyrep_available():
        pytest.skip("CoppeliaSim present; adapter exercised by sim-in-the-loop runs")
    with pytest.raises(RuntimeError, match="KinematicBackend"):
        PyRepBackend("/nonexistent/scene.ttt")
