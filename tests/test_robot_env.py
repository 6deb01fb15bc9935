"""RealRobotEnv + offline checkpoint-selection utilities with fake robots/cameras
(eval_real.py:412-788, 1059-1115 semantics, no hardware)."""

import math
import os

import numpy as np
import pytest

from voxactb_tpu.realrobot.robot_env import (
    RealRobotEnv,
    _deproject,
    guard_gimbal_lock,
    open_loop_errors,
    select_best_checkpoint,
)

DOWN = np.array([0.0, 1.0, 0.0, 0.0])


def test_gimbal_guard_passes_safe_orientations():
    q = guard_gimbal_lock(DOWN)
    np.testing.assert_allclose(q, DOWN, atol=1e-9)
    # a small tilt stays untouched
    tilt = np.array([0.05, 0.995, 0.0, 0.0])
    tilt /= np.linalg.norm(tilt)
    np.testing.assert_allclose(guard_gimbal_lock(tilt), tilt, atol=1e-9)


def test_gimbal_guard_clamps_extreme_tilt_to_limit():
    sideways = np.array([0.0, 0.0, 0.0, 1.0])  # 180 deg from reference
    q = guard_gimbal_lock(sideways, max_tilt_deg=30.0)
    dot = abs(float(np.dot(q, DOWN)))
    angle = 2 * math.degrees(math.acos(min(1.0, dot)))
    assert angle <= 30.0 + 1e-6
    assert abs(np.linalg.norm(q) - 1.0) < 1e-9


def test_deproject_inverts_pinhole_projection():
    K = np.array([[100.0, 0, 8.0], [0, 100.0, 6.0], [0, 0, 1.0]])
    depth = np.full((12, 16), 2.0, np.float32)
    cloud = _deproject(depth, K, np.eye(4))
    # the principal-point pixel deprojects to (0, 0, depth)
    np.testing.assert_allclose(cloud[6, 8], [0, 0, 2.0], atol=1e-6)
    # one pixel right of center: x = depth / fx
    np.testing.assert_allclose(cloud[6, 9], [0.02, 0, 2.0], atol=1e-6)


class _FakeRobots:
    def __init__(self):
        self.moves = []

    def move_arm(self, arm, pos, quat, gripper_open):
        self.moves.append((arm, np.asarray(pos), np.asarray(quat),
                           gripper_open))

    def observation(self):
        return {"gripper_right_pose": np.zeros((1, 7), np.float32),
                "gripper_left_pose": np.zeros((1, 7), np.float32)}


def _camera():
    K = np.array([[100.0, 0, 8.0], [0, 100.0, 6.0], [0, 0, 1.0]])
    return (np.zeros((12, 16, 3), np.uint8),
            np.full((12, 16), 1.5, np.float32), K)


def test_real_robot_env_applies_hand_eye_extrinsics():
    robots = _FakeRobots()
    T = np.eye(4)
    T[:3, 3] = [0.1, -0.2, 0.05]   # hand-eye offset for the right arm
    env = RealRobotEnv(robots, {"front": _camera},
                       extrinsics={"right": T, "left": np.eye(4)},
                       episode_length=3, dominant_arm="right")
    obs = env.reset()
    assert obs["front_rgb"].shape == (1, 12, 16, 3)
    assert obs["front_point_cloud"].shape == (1, 12, 16, 3)

    action = np.array([0.3, 0.1, 0.8, *DOWN, 1.0, 0.0])
    tr = env.step(action, "dominant")
    arm, pos, quat, grip = robots.moves[-1]
    assert arm == "right"
    np.testing.assert_allclose(pos, [0.4, -0.1, 0.85], atol=1e-9)  # T @ p
    assert not tr.terminal
    env.step(action, "assistive")
    assert robots.moves[-1][0] == "left"
    tr = env.step(action, "right")
    assert tr.terminal  # episode_length reached


class _ScriptedAgent:
    """act() returns a fixed action; load_weights records the step loaded."""

    def __init__(self, actions_by_step):
        self._by_step = actions_by_step
        self._current = None

    def load_weights(self, path):
        self._current = int(os.path.basename(path))

    def act(self, step, obs, **kw):
        from voxactb_tpu.agents.base import ActResult

        return ActResult(self._by_step[self._current])


def test_select_best_checkpoint_picks_lowest_error(tmp_path):
    gt = np.array([0.3, 0.1, 0.8, *DOWN, 1.0])
    val = [{"observation": {}, "action": gt}]
    # ckpt 1000 is 10cm off; ckpt 2000 is exact
    actions = {1000: np.concatenate([gt[:3] + [0.1, 0, 0], gt[3:]]),
               2000: gt.copy()}
    for step in actions:
        os.makedirs(tmp_path / "weights" / str(step))
    agent = _ScriptedAgent(actions)

    csv_path = str(tmp_path / "real_eval.csv")
    best, row = select_best_checkpoint(
        agent, str(tmp_path / "weights"), val, "right", csv_path=csv_path)
    assert best == 2000
    assert row["positional_error"] < 1e-9
    assert os.path.exists(csv_path)

    errs = open_loop_errors(agent, val, "right")
    assert errs["positional_error"] < 1e-9 and errs["gripper_error"] < 1e-9
