"""End-to-end CLI integration: train a tiny seed from live sim demos, then eval
its checkpoints — the train.py → eval.py workflow (peract/train.py:28-109 →
eval.py:269-373) at miniature scale on the kinematic sim."""

import csv
import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def seed_dir(tmp_path_factory):
    from voxactb_tpu.cli import train

    root = tmp_path_factory.mktemp("cli_run")
    out = train.main([
        "rlbench.demo_path=sim", 'rlbench.tasks=["reach_target"]',
        "rlbench.task_name=reach_target", "rlbench.demos=2",
        'rlbench.cameras=["wrist"]', "rlbench.camera_resolution=[12,12]",
        "rlbench.episode_length=6",
        "method.voxel_sizes=[10]", "method.num_latents=16",
        "method.latent_dim=32", "method.transformer_depth=1",
        "method.cross_dim_head=16", "method.latent_dim_head=16",
        "method.final_dim=8", "method.which_arm=right",
        "replay.batch_size=2",
        "framework.training_iterations=3", "framework.save_freq=3",
        "framework.log_freq=2", f"log_dir={root}",
    ], lang_encoder=lambda text: (np.zeros((1, 1024), np.float32),
                                  np.zeros((1, 77, 512), np.float32)))
    return out


def test_train_cli_writes_config_weights_and_logs(seed_dir):
    assert os.path.exists(os.path.join(seed_dir, "config.json"))
    weights = glob.glob(os.path.join(seed_dir, "weights", "*"))
    assert weights, "no checkpoint written"
    assert os.path.exists(os.path.join(seed_dir, "train_data.csv"))


def test_eval_cli_scores_checkpoints(seed_dir):
    from voxactb_tpu.cli import eval as eval_cli

    results = eval_cli.main([
        f"seed_dir={seed_dir}",
        "framework.eval_type=missing", "framework.eval_episodes=1",
    ])
    csv_path = os.path.join(seed_dir, "eval_data.csv")
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert rows, "eval CSV is empty"
    assert any("return" in k for k in rows[0])
    ret = float(rows[0]["eval_envs/return"])
    assert np.isfinite(ret)


def test_train_cli_native_disk_replay(tmp_path):
    """replay.use_disk=True routes through the native mmap store + C++ async
    batch feed (the reference's disk-mode replay, one mmap instead of
    per-transition pickles)."""
    import shutil

    import pytest as _pytest

    if shutil.which("g++") is None:
        _pytest.skip("no C++ toolchain")

    from voxactb_tpu.cli import train

    out = train.main([
        "rlbench.demo_path=sim", 'rlbench.tasks=["push_button"]',
        "rlbench.task_name=push_button", "rlbench.demos=1",
        'rlbench.cameras=["wrist"]', "rlbench.camera_resolution=[12,12]",
        "rlbench.episode_length=6",
        "method.voxel_sizes=[10]", "method.num_latents=16",
        "method.latent_dim=32", "method.transformer_depth=1",
        "method.cross_dim_head=16", "method.latent_dim_head=16",
        "method.final_dim=8", "method.which_arm=right",
        "replay.batch_size=2", "replay.use_disk=True",
        f"replay.path={tmp_path}/store",
        "framework.training_iterations=2", "framework.save_freq=2",
        "framework.log_freq=1", f"log_dir={tmp_path}/run",
    ], lang_encoder=lambda text: (np.zeros((1, 1024), np.float32),
                                  np.zeros((1, 77, 512), np.float32)))
    assert os.path.exists(os.path.join(out, "train_data.csv"))
    assert glob.glob(os.path.join(str(tmp_path), "store", "*.replay"))
