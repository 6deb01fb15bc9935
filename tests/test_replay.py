"""Replay buffers: signature, ring semantics, task-uniform sampling, persistence."""

import numpy as np
import pytest

from voxactb_tpu.replay import (
    TaskUniformReplayBuffer,
    UniformReplayBuffer,
    bc_replay_signature,
)


def make_transition(rng, task_id=0, low_dim=4, img=8):
    t = {
        "low_dim_state": rng.normal(size=(low_dim,)).astype(np.float32),
        "trans_action_indicies": rng.integers(0, 50, (3,)).astype(np.int32),
        "rot_grip_action_indicies": rng.integers(0, 72, (4,)).astype(np.int32),
        "ignore_collisions": np.array([1], np.int32),
        "gripper_pose": rng.normal(size=(7,)).astype(np.float32),
        "lang_goal_emb": rng.normal(size=(1024,)).astype(np.float32),
        "lang_token_embs": rng.normal(size=(77, 512)).astype(np.float32),
        "task_id": task_id,
        "demo": True,
        "terminal": False,
        "timeout": False,
        "reward": 0.0,
    }
    for cam in ("wrist", "wrist2"):
        t[f"{cam}_rgb"] = rng.integers(0, 255, (img, img, 3)).astype(np.uint8)
        t[f"{cam}_point_cloud"] = rng.normal(size=(img, img, 3)).astype(np.float32)
        t[f"{cam}_camera_extrinsics"] = np.eye(4, dtype=np.float32)
        t[f"{cam}_camera_intrinsics"] = np.eye(3, dtype=np.float32)
    return t


def sig(**kw):
    return bc_replay_signature(["wrist", "wrist2"], image_size=(8, 8), **kw)


def test_signature_has_voxactb_extras():
    names = {s.name for s in sig(crop_target_obj_voxel=True, arm_pred_loss=True,
                                 two_arm=True)}
    assert {"target_object_scene_bounds", "label", "trans_action_indicies_left",
            "gripper_pose_left"} <= names


def test_add_sample_roundtrip(rng):
    buf = UniformReplayBuffer(16, sig())
    trans = [make_transition(rng) for _ in range(5)]
    buf.extend(trans)
    assert buf.size == 5
    batch = buf.sample_transition_batch(4)
    assert batch["wrist_rgb"].shape == (4, 8, 8, 3)
    assert batch["wrist_rgb"].dtype == np.uint8
    assert batch["lang_token_embs"].shape == (4, 77, 512)


def test_ring_overwrite(rng):
    buf = UniformReplayBuffer(4, sig())
    for i in range(10):
        t = make_transition(rng)
        t["reward"] = float(i)
        buf.add(t)
    assert buf.size == 4
    assert buf.add_count == 10
    rewards = set(buf.gather(np.arange(4))["reward"].tolist())
    assert rewards == {6.0, 7.0, 8.0, 9.0}


def test_task_uniform_sampling(rng):
    buf = TaskUniformReplayBuffer(128, sig())
    # 90 transitions of task 0, 10 of task 1 -> uniform-over-task sampling should give
    # ~50/50, not ~90/10
    for i in range(90):
        buf.add(make_transition(rng, task_id=0))
    for i in range(10):
        buf.add(make_transition(rng, task_id=1))
    batch = buf.sample_transition_batch(400)
    frac_task1 = (batch["task_id"] == 1).mean()
    assert 0.4 < frac_task1 < 0.6, frac_task1


def test_save_load_roundtrip(rng, tmp_path):
    buf = UniformReplayBuffer(16, sig())
    buf.extend([make_transition(rng) for _ in range(6)])
    p = str(tmp_path / "replay.npz")
    buf.save(p)

    buf2 = UniformReplayBuffer(16, sig())
    buf2.load(p)
    assert buf2.size == 6
    np.testing.assert_array_equal(
        buf.gather(np.arange(6))["gripper_pose"],
        buf2.gather(np.arange(6))["gripper_pose"],
    )


def test_prefetch_iterator(rng):
    from voxactb_tpu.replay.dataset import PrefetchIterator

    buf = UniformReplayBuffer(16, sig())
    buf.extend([make_transition(rng) for _ in range(4)])
    it = PrefetchIterator(lambda: buf.sample_transition_batch(2))
    try:
        for _ in range(3):
            batch = next(it)
            assert batch["wrist_rgb"].shape == (2, 8, 8, 3)
    finally:
        it.close()


def test_prioritized_new_adds_get_max_priority_once(rng):
    """Regression: max_recorded_priority is already alpha-exponentiated — a
    default-priority add must take it AS IS, not raise it to alpha again
    (fresh transitions are meant to be sampled at least once)."""
    from voxactb_tpu.replay.prioritized import PrioritizedReplayBuffer

    sig = bc_replay_signature(["wrist"], (4, 4), low_dim_size=4)
    buf = PrioritizedReplayBuffer(16, sig, alpha=0.6)
    i0 = buf.add({"reward": 1.0})
    buf.set_priority([i0], [4.0])
    stored = buf._tree.get(i0)
    assert stored == pytest.approx(4.0 ** 0.6)
    i1 = buf.add({"reward": 0.0})
    assert buf._tree.get(i1) == pytest.approx(stored)


def test_sum_tree_zero_query_skips_zero_priority_leaf():
    """Regression: q == left-subtree sum must walk RIGHT (strict '<'), or a
    0.0 query over a zero-priority left subtree returns a zero-priority leaf
    (-> infinite importance weights downstream)."""
    import numpy as np

    from voxactb_tpu.replay.prioritized import SumTree

    t = SumTree(4)
    t.set(0, 0.0)
    t.set(1, 2.0)

    class _ZeroRng:
        def uniform(self, *a, **k):
            return 0.0

    idx = t.sample(_ZeroRng())
    assert t.get(idx) > 0.0
