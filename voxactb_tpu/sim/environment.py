"""Scene orchestration + task environments over a SimBackend.

Counterparts of ``Environment2Robots`` (rlbench/environments_two_robots.py:29-262),
``TaskEnvironment2Robots`` (task_environment_two_robots.py:24-209 — reset /
reset_to_demo / step(action, which_arm) / get_demos) and the observation/demo halves
of ``Scene2Robots`` (backend/scene_two_robots.py:32-2800): camera rigs, episode
placement with retry, per-step observations, and scripted bimanual demo recording that
interleaves left/right waypoints with arm labels.

The action mode reproduces ``EndEffectorPoseViaPlanning2Robots``'s contract
(action_modes/arm_action_modes.py:284-435): workspace bound check, then stepped
path execution to the commanded pose, then the gripper bit
(``MoveArmThenGripper2Robots``, action_mode.py:42).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from voxactb_tpu.envs.base import BimanualEnv, Transition
from voxactb_tpu.sim.backend import ARMS, KinematicBackend, SimBackend
from voxactb_tpu.sim.task import BimanualTask

REWARD_SCALE = 100.0


class InvalidActionError(RuntimeError):
    pass


@dataclass
class SimObservation:
    """Observation2Robots-shaped frame (observation_two_robots.py:5-74) produced by
    the scene; flat per-camera attributes so demos feed fill_replay directly."""

    misc: Dict = field(default_factory=dict)

    def __getattr__(self, item):  # missing camera fields -> clear error
        raise AttributeError(item)


class SceneRenderer:
    """Synthetic camera rig: splats scene objects + gripper markers into RGB-D."""

    def __init__(self, cameras: Sequence[str], image_size: int, workspace):
        self.cameras = tuple(cameras)
        self.img = image_size
        self.ws = np.asarray(workspace, np.float32)

    def render(self, backend: SimBackend, rng) -> Dict[str, np.ndarray]:
        out = {}
        for cam_i, cam in enumerate(self.cameras):
            rgb = np.full((self.img, self.img, 3), 110, np.uint8)
            # table plane cloud
            xs = rng.uniform(self.ws[0], self.ws[3], (self.img, self.img))
            ys = rng.uniform(self.ws[1], self.ws[4], (self.img, self.img))
            zs = np.full((self.img, self.img), self.ws[2])
            pcd = np.stack([xs, ys, zs], -1).astype(np.float32)
            # splat objects into deterministic blocks
            block = max(2, self.img // 8)
            items = [backend.get_object(n) for n in backend.object_names()]
            items += [backend.arm(a) for a in ARMS]
            for k, obj in enumerate(items):
                r0 = (k * block) % (self.img - block)
                c0 = ((k + cam_i) * 2 * block) % (self.img - block)
                pos = getattr(obj, "position", None)
                if pos is None:
                    pos = obj.tcp_position
                    color, size = (40, 40, 220), 0.02
                else:
                    color = tuple(int(c * 255) for c in obj.color)
                    size = float(obj.size.max() / 2)
                pts = pos + rng.uniform(-size, size, (block, block, 3))
                pcd[r0:r0 + block, c0:c0 + block] = pts
                rgb[r0:r0 + block, c0:c0 + block] = color
            out[f"{cam}_rgb"] = rgb
            out[f"{cam}_point_cloud"] = pcd
        return out


class BimanualTaskEnvironment(BimanualEnv):
    """One task's session: reset / step / scripted demos / success scoring."""

    def __init__(self, task_cls, backend: Optional[SimBackend] = None,
                 cameras=("wrist", "wrist2"), image_size: int = 32,
                 episode_length: int = 25, seed: int = 0,
                 max_tick_per_action: int = 40):
        self.backend = backend or KinematicBackend(seed)
        self.task: BimanualTask = task_cls(self.backend)
        self.task.init_task()
        self._renderer = SceneRenderer(cameras, image_size,
                                       KinematicBackend.workspace)
        self._cameras = tuple(cameras)
        self._episode_length = episode_length
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self._variation = 0
        self._step_count = 0
        self._max_tick = max_tick_per_action
        self._launched = False

    # -- lifecycle ----------------------------------------------------------------------

    def launch(self) -> None:
        self._launched = True

    def shutdown(self) -> None:
        self._launched = False

    def set_variation(self, v: int) -> None:
        self._variation = v % self.task.num_variations

    def reset(self) -> Dict:
        self._step_count = 0
        self.backend.reset_arms()
        self._descriptions = self.task.init_episode(self._variation, self._rng)
        return self._observation_dict()

    def reset_to_demo(self, demo_index: int) -> Dict:
        self._rng = np.random.default_rng(self._seed + demo_index)
        self.set_variation(demo_index)
        return self.reset()

    # -- stepping (action mode semantics) --------------------------------------------

    def step(self, action, which_arm: str) -> Transition:
        action = np.asarray(action, np.float64)
        arm = {"dominant": self.task.dominant_arm(),
               "assistive": "left" if self.task.dominant_arm() == "right"
               else "right"}.get(which_arm, which_arm)

        pos, quat, grip = action[:3], action[3:7], float(action[7])
        ws = KinematicBackend.workspace
        if np.any(pos < ws[:3]) or np.any(pos > ws[3:]):
            # workspace bound check (arm_action_modes.py:324)
            raise InvalidActionError(
                f"target {pos} outside workspace bounds {ws}")

        # stepped path execution loop (arm_action_modes.py:425-435)
        for _ in range(self._max_tick):
            reached = self.backend.move_arm_towards(arm, pos, quat, max_step=0.05)
            self.backend.step()
            if reached:
                break
        self.backend.set_gripper(arm, grip)
        self.backend.step()

        self._step_count += 1
        success = self.task.success()
        timeout = self._step_count >= self._episode_length
        return Transition(
            self._observation_dict(),
            REWARD_SCALE if success else 0.0,
            success or timeout,
            info={"success": success},
        )

    # -- observations -------------------------------------------------------------------

    def _frame(self, velocities: Optional[Dict[str, float]] = None
               ) -> SimObservation:
        """One Observation2Robots-shaped frame from current backend state."""
        o = SimObservation()
        cams = self._renderer.render(self.backend, self._rng)
        for k, v in cams.items():
            setattr(o, k, v)
        for cam in self._cameras:
            o.misc[f"{cam}_camera_extrinsics"] = np.eye(4, dtype=np.float32)
            o.misc[f"{cam}_camera_intrinsics"] = np.array(
                [[110.0, 0, self._renderer.img / 2],
                 [0, 110.0, self._renderer.img / 2], [0, 0, 1]], np.float32)
        for arm in ARMS:
            a = self.backend.arm(arm)
            vel = (velocities or {}).get(arm, a.joint_velocity_norm)
            setattr(o, f"gripper_{arm}_pose",
                    np.concatenate([a.tcp_position, a.tcp_quaternion]).astype(
                        np.float32))
            setattr(o, f"gripper_{arm}_open", float(a.gripper_open > 0.5))
            setattr(o, f"gripper_{arm}_joint_positions",
                    np.full(2, 0.04 * a.gripper_open, np.float32))
            setattr(o, f"joint_velocities_{arm}", np.full(7, vel, np.float32))
            setattr(o, f"joint_positions_{arm}", np.zeros(7, np.float32))
        o.ignore_collisions = 1.0
        target = self.task.target_object_name()
        if target and getattr(self.backend, "has_object", lambda n: False)(target):
            o.target_object_pos = self.backend.get_object(
                target).position.astype(np.float32)
            o.auto_crop_radius = float(
                self.backend.get_object(target).size.max() / 2 + 0.05)
        return o

    def _observation_dict(self) -> Dict:
        """Policy-facing dict (what the rollout/agents consume)."""
        o = self._frame()
        obs: Dict = {}
        for cam in self._cameras:
            obs[f"{cam}_rgb"] = getattr(o, f"{cam}_rgb")[None]
            obs[f"{cam}_point_cloud"] = getattr(o, f"{cam}_point_cloud")[None]
            obs[f"{cam}_camera_extrinsics"] = o.misc[
                f"{cam}_camera_extrinsics"][None]
            obs[f"{cam}_camera_intrinsics"] = o.misc[
                f"{cam}_camera_intrinsics"][None]
        t = self._step_count
        time_ch = (1.0 - t / max(1, self._episode_length - 1)) * 2.0 - 1.0
        right = np.array([o.gripper_right_open,
                          *o.gripper_right_joint_positions, time_ch, 0.0],
                         np.float32)
        left = np.array([o.gripper_left_open,
                         *o.gripper_left_joint_positions, time_ch], np.float32)
        obs["low_dim_state_right_arm"] = right[None]
        obs["low_dim_state_left_arm"] = left[None]
        obs["low_dim_state"] = np.concatenate([left[:3], right]).astype(
            np.float32)[None]
        obs["gripper_right_pose"] = o.gripper_right_pose
        obs["gripper_left_pose"] = o.gripper_left_pose
        obs["lang_goal"] = self._descriptions[0]
        seed = abs(hash(self._descriptions[0])) % (2 ** 31)
        lrng = np.random.default_rng(seed)
        obs["lang_goal_emb"] = lrng.normal(size=(1024,)).astype(np.float32)
        obs["lang_token_embs"] = lrng.normal(size=(77, 512)).astype(np.float32)
        return obs

    # -- VoxAct-B hooks -------------------------------------------------------------------

    def target_object_world_coords(self):
        name = self.task.target_object_name()
        if name is None:
            return None
        return self.backend.get_object(name).position.copy()

    def auto_crop_radius(self) -> float:
        name = self.task.target_object_name()
        if name is None:
            return 0.0
        return float(self.backend.get_object(name).size.max() / 2 + 0.05)

    def dominant_arm(self) -> str:
        return self.task.dominant_arm()

    @property
    def env_language_goal(self) -> str:
        return self._descriptions[0]

    @property
    def episode_length(self) -> int:
        return self._episode_length

    # -- scripted demos (scene_two_robots.py:793-2800 machinery) --------------------------

    def get_demo(self, demo_index: int) -> Tuple[List[SimObservation], List[str]]:
        """Record one scripted bimanual demo: walk the task's labeled waypoints,
        emitting a frame per control tick (arms rest at waypoints -> keyframes)."""
        self.reset_to_demo(demo_index)
        frames = [self._frame(velocities={"right": 1.0, "left": 1.0})]
        for wp in self.task.get_waypoints(self.task.dominant_arm()):
            reached = False
            for _ in range(self._max_tick):
                reached = self.backend.move_arm_towards(
                    wp.arm, wp.position, wp.quaternion, max_step=0.05)
                self.backend.step()
                frames.append(self._frame())
                if reached:
                    break
            if wp.gripper_open is not None:
                self.backend.set_gripper(wp.arm, wp.gripper_open)
            for _ in range(wp.dwell):
                self.backend.step()
                frames.append(self._frame(velocities={wp.arm: 0.0}))
        return frames, list(self._descriptions)

    def get_demos(self, amount: int, start_index: int = 0):
        return [self.get_demo(start_index + i) for i in range(amount)]


class SimEnvironment:
    """Environment2Robots counterpart: boots a backend and vends task sessions."""

    def __init__(self, cameras=("wrist", "wrist2"), image_size: int = 32,
                 episode_length: int = 25, seed: int = 0, headless: bool = True):
        self._kw = dict(cameras=cameras, image_size=image_size,
                        episode_length=episode_length, seed=seed)
        self._launched = False

    def launch(self) -> None:
        self._launched = True

    def shutdown(self) -> None:
        self._launched = False

    def get_task(self, task_cls) -> BimanualTaskEnvironment:
        if isinstance(task_cls, str):
            from voxactb_tpu.sim.tasks import TASK_REGISTRY

            task_cls = TASK_REGISTRY[task_cls]
        env = BimanualTaskEnvironment(task_cls, **self._kw)
        env.launch()
        return env
