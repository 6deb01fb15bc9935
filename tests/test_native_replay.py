"""Native mmap replay store: build, pack/unpack, persistence, threaded gather."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

from voxactb_tpu.replay import bc_replay_signature  # noqa: E402
from voxactb_tpu.replay.native_buffer import NativeReplayBuffer  # noqa: E402


def sig():
    return bc_replay_signature(["wrist"], (8, 8), low_dim_size=4)


def trans(rng, i):
    t = {
        "low_dim_state": rng.normal(size=(4,)).astype(np.float32),
        "trans_action_indicies": rng.integers(0, 50, (3,)).astype(np.int32),
        "rot_grip_action_indicies": rng.integers(0, 72, (4,)).astype(np.int32),
        "ignore_collisions": np.array([1], np.int32),
        "gripper_pose": rng.normal(size=(7,)).astype(np.float32),
        "lang_goal_emb": rng.normal(size=(1024,)).astype(np.float32),
        "lang_token_embs": rng.normal(size=(77, 512)).astype(np.float32),
        "task_id": i, "demo": True, "terminal": False, "timeout": False,
        "reward": float(i),
        "wrist_rgb": rng.integers(0, 255, (8, 8, 3)).astype(np.uint8),
        "wrist_point_cloud": rng.normal(size=(8, 8, 3)).astype(np.float32),
        "wrist_camera_extrinsics": np.eye(4, dtype=np.float32),
        "wrist_camera_intrinsics": np.eye(3, dtype=np.float32),
    }
    return t


def test_native_roundtrip(tmp_path, rng):
    buf = NativeReplayBuffer(32, sig(), str(tmp_path / "replay.bin"))
    ts = [trans(rng, i) for i in range(6)]
    buf.extend(ts)
    assert buf.size == 6

    got = buf.gather(np.arange(6))
    for i in range(6):
        np.testing.assert_array_equal(got["wrist_rgb"][i], ts[i]["wrist_rgb"])
        np.testing.assert_allclose(got["gripper_pose"][i], ts[i]["gripper_pose"])
        assert got["reward"][i] == float(i)
        assert got["task_id"][i] == i
    assert got["lang_token_embs"].shape == (6, 77, 512)
    buf.close()


def test_native_persistence(tmp_path, rng):
    path = str(tmp_path / "replay.bin")
    buf = NativeReplayBuffer(16, sig(), path)
    ts = [trans(rng, i) for i in range(4)]
    buf.extend(ts)
    buf.flush()
    buf.close()

    # reopen: the file IS the buffer
    buf2 = NativeReplayBuffer(16, sig(), path)
    assert buf2.size == 4
    got = buf2.gather(np.array([2]))
    np.testing.assert_array_equal(got["wrist_rgb"][0], ts[2]["wrist_rgb"])
    buf2.close()


def test_native_ring_overwrite(tmp_path, rng):
    buf = NativeReplayBuffer(4, sig(), str(tmp_path / "replay.bin"))
    for i in range(10):
        buf.add(trans(rng, i))
    assert buf.size == 4 and buf.add_count == 10
    rewards = sorted(buf.gather(np.arange(4))["reward"].tolist())
    assert rewards == [6.0, 7.0, 8.0, 9.0]
    buf.close()


def test_native_threaded_gather_large_batch(tmp_path, rng):
    buf = NativeReplayBuffer(64, sig(), str(tmp_path / "replay.bin"),
                             gather_threads=4)
    ts = [trans(rng, i) for i in range(64)]
    buf.extend(ts)
    idx = rng.integers(0, 64, 256)
    got = buf.gather(idx)
    for j in (0, 100, 255):
        np.testing.assert_array_equal(
            got["wrist_rgb"][j], ts[idx[j]]["wrist_rgb"])
    buf.close()


def test_native_stride_mismatch_detected(tmp_path, rng):
    path = str(tmp_path / "replay.bin")
    buf = NativeReplayBuffer(8, sig(), path)
    buf.add(trans(rng, 0))
    buf.close()
    other_sig = bc_replay_signature(["wrist"], (16, 16), low_dim_size=4)
    with pytest.raises(IOError, match="row stride"):
        NativeReplayBuffer(8, other_sig, path)


def test_async_batch_sampler(tmp_path, rng):
    """C++ producer threads deliver valid batches concurrently with writes."""
    from voxactb_tpu.replay.native_buffer import AsyncBatchSampler

    buf = NativeReplayBuffer(64, sig(), str(tmp_path / "replay.bin"))
    ts = [trans(rng, i) for i in range(16)]
    buf.extend(ts)

    sampler = AsyncBatchSampler(buf, batch_size=8, ring_size=3, num_threads=2,
                                seed=7)
    try:
        rewards = {float(t["reward"]) for t in ts}
        for _ in range(20):
            batch = sampler.next()
            assert batch["wrist_rgb"].shape == (8, 8, 8, 3)
            assert batch["lang_token_embs"].shape == (8, 77, 512)
            # every sampled row must be one of the written transitions
            assert set(np.asarray(batch["reward"]).tolist()) <= rewards
        # writes during sampling are picked up (monotone add counter)
        buf.add(trans(rng, 99))
        seen_new = any(99.0 in np.asarray(sampler.next()["reward"]).tolist()
                       for _ in range(50))
        assert seen_new
    finally:
        sampler.close()
        buf.close()


def test_async_batch_sampler_blocks_until_filled(tmp_path, rng):
    """Producers wait for the store to hold a full batch before publishing."""
    import threading
    import time

    from voxactb_tpu.replay.native_buffer import AsyncBatchSampler

    buf = NativeReplayBuffer(32, sig(), str(tmp_path / "replay.bin"))
    sampler = AsyncBatchSampler(buf, batch_size=4, ring_size=2, num_threads=1)
    got = {}

    def consume():
        got["batch"] = sampler.next()

    th = threading.Thread(target=consume, daemon=True)
    th.start()
    time.sleep(0.15)
    assert "batch" not in got  # nothing written yet -> sampler must block
    for i in range(4):
        buf.add(trans(rng, i))
    th.join(timeout=5.0)
    assert "batch" in got and got["batch"]["wrist_rgb"].shape[0] == 4
    sampler.close()
    buf.close()
