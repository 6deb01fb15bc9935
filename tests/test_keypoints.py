"""Keypoint discovery: reference heuristics on synthetic demos."""

import numpy as np
import pytest

from voxactb_tpu.utils.keypoints import KeypointConfig, keypoint_discovery


class Obs:
    def __init__(self, r_open=1.0, l_open=1.0, r_vel=1.0, l_vel=1.0,
                 r_pose=None, l_pose=None):
        self.gripper_right_open = r_open
        self.gripper_left_open = l_open
        self.joint_velocities_right = np.full(7, r_vel)
        self.joint_velocities_left = np.full(7, l_vel)
        self.gripper_right_pose = r_pose if r_pose is not None else np.zeros(7)
        self.gripper_left_pose = l_pose if l_pose is not None else np.zeros(7)


def moving_demo(n=20):
    return [Obs(r_vel=1.0, l_vel=1.0) for _ in range(n)]


def test_last_frame_is_always_a_keypoint():
    kps = keypoint_discovery(moving_demo(), which_arm="right")
    assert kps == [19]


def test_gripper_change_makes_keypoint():
    demo = moving_demo(20)
    for i in range(10, 20):
        demo[i].gripper_right_open = 0.0
    kps = keypoint_discovery(demo, which_arm="right")
    assert 10 in kps and 19 in kps


def test_stopped_arm_makes_keypoint():
    demo = moving_demo(30)
    # arm rests at steps 10..14 (not near the end, gripper stable)
    for i in range(10, 15):
        demo[i].joint_velocities_right = np.zeros(7)
    kps = keypoint_discovery(demo, which_arm="right")
    assert 10 in kps
    # the 4-step stop buffer suppresses immediate re-triggers
    assert 11 not in kps and 12 not in kps and 13 not in kps and 14 not in kps


def test_adjacent_tail_keypoints_deduped():
    demo = moving_demo(20)
    demo[18].gripper_right_open = 0.0
    demo[19].gripper_right_open = 1.0
    kps = keypoint_discovery(demo, which_arm="right")
    # 18 (gripper change) and 19 (last + change) are adjacent -> 18 dropped
    assert kps == [19]


def test_dominant_assistive_labels():
    demo = moving_demo(20)
    for i in range(8, 20):
        demo[i].gripper_left_open = 0.0
    kps, labels = keypoint_discovery(
        demo, which_arm="assistive", dominant_assistive_arm="left"
    )
    assert 8 in kps and 19 in kps
    assert all(l == 1 for l in labels)  # all left-armed


def test_both_mode_right_wins_ties():
    demo = moving_demo(20)
    demo[5].gripper_right_open = 0.0
    for i in range(6, 20):
        demo[i].gripper_right_open = 0.0
        demo[i].gripper_left_open = 0.0 if i >= 12 else 1.0
    kps, labels = keypoint_discovery(demo, which_arm="both")
    assert 5 in kps and 12 in kps
    assert labels[kps.index(5)] == 0   # right-armed
    assert labels[kps.index(12)] == 1  # left-armed


def test_no_duplicate_skips_static_pose():
    demo = moving_demo(20)
    # left gripper flips at 10 but the left pose never moves -> no_duplicate skips it;
    # the final frame also has an unchanged pose, so it is skipped too
    for i in range(10, 20):
        demo[i].gripper_left_open = 0.0
    cfg = KeypointConfig(no_duplicate=True)
    kps, labels = keypoint_discovery(
        demo, which_arm="assistive", dominant_assistive_arm="left", cfg=cfg
    )
    assert kps == []
    # with a moving pose it is kept
    for i, o in enumerate(demo):
        o.gripper_left_pose = np.full(7, float(i))
    kps2, _ = keypoint_discovery(
        demo, which_arm="assistive", dominant_assistive_arm="left", cfg=cfg
    )
    assert 10 in kps2 and 19 in kps2


def test_no_duplicate_pending_flip_emitted_at_next_movement():
    """Reference parity (demo_loading_utils.py:274-289): a gripper flip at a
    STATIONARY pose is not lost — prev_open stays stale through skipped frames,
    so the flip registers as a keyframe when the arm next moves (the
    hand-over release-then-withdraw pattern)."""
    demo = moving_demo(20)
    # left arm parked at pose P for frames 0..14, flips gripper at 10,
    # then moves away over frames 15..19
    for i in range(10, 20):
        demo[i].gripper_left_open = 0.0
    for i in range(15, 20):
        demo[i].gripper_left_pose = np.full(7, float(i))
    cfg = KeypointConfig(no_duplicate=True)
    kps, labels = keypoint_discovery(
        demo, which_arm="assistive", dominant_assistive_arm="left", cfg=cfg
    )
    # the flip surfaces at 15 (first moved frame), not 10, and not dropped
    assert 15 in kps and 10 not in kps
    assert all(l == 1 for l in labels)


def test_no_duplicate_drops_idle_home_keyframes():
    """The padding scanner emits 'arm idling at home' stopped-events every
    stop-buffer window; no_duplicate must drop them all (the open_drawer 0.0
    diagnosis, tools/probe_policy_open_loop.py)."""
    demo = moving_demo(40)
    # dominant right arm idles at home (zero velocity, unmoved pose) for
    # frames 0..29, then moves 30..39
    for i in range(0, 30):
        demo[i].joint_velocities_right = np.zeros(7)
    for i in range(30, 40):
        demo[i].gripper_right_pose = np.full(7, float(i))
    padded, _ = keypoint_discovery(
        demo, which_arm="dominant", dominant_assistive_arm="right"
    )
    assert any(k < 30 for k in padded)  # the padding scanner does emit them
    clean, _ = keypoint_discovery(
        demo, which_arm="dominant", dominant_assistive_arm="right",
        cfg=KeypointConfig(no_duplicate=True),
    )
    assert all(k >= 30 for k in clean) and clean  # nd drops every home kf


def test_saved_every_last_inserted():
    demo = moving_demo(30)
    cfg = KeypointConfig(saved_every_last_inserted=10)
    kps = keypoint_discovery(demo, which_arm="right", cfg=cfg)
    # periodic keyframes every 10 quiet steps, plus the final frame
    assert 9 in kps and 19 in kps and 29 in kps
