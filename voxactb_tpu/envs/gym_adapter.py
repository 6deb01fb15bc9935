"""Classic gym-style adapter over the bimanual envs.

Counterpart of RLBench's gym wrapper (rlbench/gym/rlbench_env.py, unused by VoxAct-B
but part of the benchmark surface). Standalone API (reset/step/render/close with
gym return conventions) that also registers with gymnasium when it is importable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from voxactb_tpu.envs.base import BimanualEnv


class BimanualGymEnv:
    """step() returns (obs, reward, terminated, truncated, info)."""

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, env: BimanualEnv, which_arm: str = "dominant",
                 render_camera: str = "wrist"):
        self._env = env
        self._which_arm = which_arm
        self._render_camera = render_camera
        self._last_obs: Optional[Dict] = None
        self._steps = 0
        env.launch()

    @property
    def action_dim(self) -> int:
        return 9  # xyz + quat + grip + ignore_collision

    def reset(self, seed: Optional[int] = None
              ) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
        self._steps = 0
        self._last_obs = self._env.reset()
        return self._last_obs, {}

    def step(self, action) -> Tuple[Dict, float, bool, bool, Dict]:
        t = self._env.step(np.asarray(action, np.float32), self._which_arm)
        self._steps += 1
        truncated = (not t.info.get("success", False)) and t.terminal
        self._last_obs = t.observation
        return t.observation, t.reward, t.terminal and not truncated, truncated, t.info

    def render(self) -> Optional[np.ndarray]:
        if self._last_obs is None:
            return None
        frame = self._last_obs.get(f"{self._render_camera}_rgb")
        return None if frame is None else np.asarray(frame)[0]

    def close(self) -> None:
        self._env.shutdown()


def register_gymnasium(task_name: str = "open_jar", **env_kw) -> Optional[str]:
    """Register 'VoxActB/<task>-v0' with gymnasium when present; returns the id."""
    try:
        import gymnasium as gym
    except ImportError:
        return None

    env_id = f"VoxActB/{task_name}-v0"

    def make(**kw):
        from voxactb_tpu.sim.environment import SimEnvironment

        sim = SimEnvironment(**env_kw)
        sim.launch()
        return BimanualGymEnv(sim.get_task(task_name))

    gym.register(env_id, make)
    return env_id
