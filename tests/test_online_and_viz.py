"""Online env runner + visualizers."""

import numpy as np
import pytest

from voxactb_tpu.utils.visualize import ValueMapVisualizer, visualise_voxel


def test_online_env_runner_collects_into_replay(rng):
    from voxactb_tpu.agents.qattention_agent import QAttentionBCAgent
    from voxactb_tpu.config import MethodConfig
    from voxactb_tpu.envs.fake_env import FakeBimanualEnv
    from voxactb_tpu.replay import UniformReplayBuffer, bc_replay_signature
    from voxactb_tpu.runners.env_runner import EnvRunner

    cfg = MethodConfig(
        voxel_sizes=[10], num_latents=16, latent_dim=32, transformer_depth=1,
        cross_dim_head=16, latent_dim_head=16, final_dim=8, which_arm="right",
    )
    agent = QAttentionBCAgent(cfg, ["wrist", "wrist2"],
                              [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1])
    agent.build(training=False)
    buf = UniformReplayBuffer(
        64, bc_replay_signature(["wrist", "wrist2"], (16, 16), low_dim_size=4))

    runner = EnvRunner(
        lambda: FakeBimanualEnv(image_size=16, episode_length=3, seed=0),
        agent, buf, num_envs=1, episodes=2, episode_length=3,
        which_arm="right", crop_target_obj_voxel=False,
    )
    runner.start(background=False)
    assert runner.total_episodes == 2
    assert buf.size == runner.total_transitions > 0
    sums = runner.summaries()
    names = {s.name for s in sums}
    assert "eval_envs/return" in names


def test_visualise_voxel(rng):
    n = 12
    grid = np.zeros((n, n, n, 10), np.float32)
    grid[4:7, 4:7, 4:7, -1] = 1.0
    grid[4:7, 4:7, 4:7, 3:6] = 0.8
    q = rng.normal(size=(n, n, n)).astype(np.float32)
    img = visualise_voxel(grid, q, highlight_coordinate=[5, 5, 5],
                          gt_coordinate=[2, 9, 4])
    assert img.shape == (n, 3 * n + 2, 3) and img.dtype == np.uint8
    assert img.max() > 100  # something rendered


def test_value_map_visualizer(tmp_path, rng):
    viz = ValueMapVisualizer(str(tmp_path), max_dumps=2)
    maps = {"affordance": rng.uniform(size=(8, 8, 8)),
            "costmap": rng.uniform(size=(8, 8, 8))}
    p1 = viz.update(maps, path=rng.uniform(size=(5, 3)))
    assert p1 and p1.endswith(".npz")
    data = np.load(p1)
    assert "affordance_proj_z" in data and data["path"].shape == (5, 3)
    viz.update(maps)
    assert viz.update(maps) is None  # max_dumps respected
