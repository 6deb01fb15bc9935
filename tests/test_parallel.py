"""Mesh-sharding tests on the virtual 8-device CPU platform (conftest.py).

The reference's only distribution is DDP gradient all-reduce over gloo
(peract/run_seed_fn.py:34-36); here the same step runs under dp / fsdp /
megatron-tp / latent-sequence-sp shardings via GSPMD and must produce the
same loss.
"""

import jax
import numpy as np
import pytest

from voxactb_tpu.agents.qfunction import make_optimizer, make_train_step
from voxactb_tpu.config import MethodConfig
from voxactb_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    shard_params_model_parallel,
    tp_param_spec,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup():
    cfg = MethodConfig(
        voxel_sizes=[10], num_latents=16, latent_dim=32, transformer_depth=1,
        cross_dim_head=16, latent_dim_head=16, final_dim=8,
        which_arm="dominant", arm_pred_loss=True, apply_se3=False,
    )
    cameras = ["wrist"]
    optimizer = make_optimizer(cfg, training_iterations=100)
    _, init_fn, train_step = make_train_step(cfg, optimizer, cameras)

    rng = np.random.default_rng(0)
    b, img = 8, 8
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
        "low_dim_state": rng.normal(size=(b, cfg.low_dim_size())).astype(
            np.float32),
        "label": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "scene_bounds": np.asarray([-0.8, -1.0, 0.1, 1.2, 1.0, 2.1], np.float32),
    }
    batch["gripper_pose"][:, 3:] /= np.linalg.norm(
        batch["gripper_pose"][:, 3:], axis=-1, keepdims=True)
    batch["wrist_rgb"] = rng.integers(0, 255, (b, img, img, 3)).astype(np.float32)
    batch["wrist_point_cloud"] = rng.uniform(
        -0.5, 1.5, (b, img, img, 3)).astype(np.float32)
    return init_fn, train_step, batch


def _one_step(mesh, init_fn, train_step, batch, **kw):
    with mesh:
        state, place, step = make_parallel_train_step(
            mesh, init_fn, train_step, batch, jax.random.key(0), **kw)
        state, metrics = step(state, place(batch), jax.random.key(1))
        return float(np.asarray(metrics["total_loss"]))


def test_tp_sp_matches_dp_loss():
    init_fn, train_step, batch = _setup()
    loss_dp = _one_step(make_mesh({"dp": 8}), init_fn, train_step, batch)
    loss_mp = _one_step(make_mesh({"dp": 2, "tp": 2, "sp": 2}),
                        init_fn, train_step, batch, model_parallel=True)
    assert np.isfinite(loss_dp) and np.isfinite(loss_mp)
    np.testing.assert_allclose(loss_mp, loss_dp, rtol=1e-3)


def test_tp_param_specs_are_megatron_shaped():
    assert tp_param_spec("a/attn/to_q/kernel", (128, 64), 2) == \
        jax.sharding.PartitionSpec(None, "tp")
    assert tp_param_spec("a/attn/to_out/kernel", (64, 128), 2) == \
        jax.sharding.PartitionSpec("tp", None)
    assert tp_param_spec("x/latents", (16, 32), 2, sp_size=2) == \
        jax.sharding.PartitionSpec("sp", None)
    # indivisible dims fall through
    assert tp_param_spec("a/attn/to_q/kernel", (128, 63), 2) is None


def test_model_parallel_sharding_actually_shards():
    init_fn, train_step, batch = _setup()
    mesh = make_mesh({"dp": 2, "tp": 2, "sp": 2})
    state = init_fn(jax.random.key(0), batch)
    shards = shard_params_model_parallel(mesh, state.params)
    flat = jax.tree_util.tree_flatten_with_path(shards)[0]
    specs = {"/".join(str(getattr(p, "key", p)) for p in path): s.spec
             for path, s in flat}
    sharded = [p for p, s in specs.items() if any(s)]
    assert any("to_q" in p for p in sharded)
    assert any("to_out" in p for p in sharded)
    assert any(p.endswith("latents") for p in sharded)
