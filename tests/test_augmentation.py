"""SE(3) augmentation: geometric consistency + bounds rejection behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from voxactb_tpu.ops import geometry as G
from voxactb_tpu.ops.augmentation import Se3AugConfig, apply_se3_augmentation


def _setup(rng, b=4):
    bounds = np.tile(np.array([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]], np.float32), (b, 1))
    pose = np.concatenate(
        [
            rng.uniform([-0.3, -0.5, 0.5], [0.7, 0.5, 1.5], size=(b, 3)),
            rng.normal(size=(b, 4)),
        ],
        axis=-1,
    ).astype(np.float32)
    pose[:, 3:] /= np.linalg.norm(pose[:, 3:], axis=-1, keepdims=True)
    rot_grip = np.concatenate(
        [rng.integers(0, 72, size=(b, 3)), rng.integers(0, 2, size=(b, 1))], -1
    ).astype(np.int32)
    pcd = rng.uniform(-1, 2, size=(b, 16, 16, 3)).astype(np.float32)
    return jnp.asarray(bounds), jnp.asarray(pose), jnp.asarray(rot_grip), jnp.asarray(pcd)


def test_identity_candidate_reproduces_unaugmented_action(rng):
    bounds, pose, rot_grip, pcd = _setup(rng)
    cfg = Se3AugConfig(trans_range=(0, 0, 0), rot_range_deg=(0, 0, 0), num_candidates=2)
    out = apply_se3_augmentation(
        jax.random.key(0), [pcd], pose, rot_grip, bounds,
        voxel_size=50, rot_resolution_deg=5, cfg=cfg,
    )
    # zero ranges -> identity perturbation -> indices match direct discretization
    expect_idx = np.asarray(G.point_to_voxel_index(pose[:, :3], 50, bounds))
    np.testing.assert_array_equal(np.asarray(out.trans_indices), expect_idx)
    expect_rot = np.asarray(
        G.quaternion_to_discrete_euler(G.canonicalize_quaternion(pose[:, 3:]), 5)
    )
    np.testing.assert_array_equal(np.asarray(out.rot_grip_indices[:, :3]), expect_rot)
    np.testing.assert_array_equal(
        np.asarray(out.rot_grip_indices[:, 3]), np.asarray(rot_grip[:, 3])
    )
    np.testing.assert_allclose(np.asarray(out.pcds[0]), np.asarray(pcd), atol=1e-5)


def test_augmented_action_always_in_bounds(rng):
    bounds, pose, rot_grip, pcd = _setup(rng, b=8)
    out = apply_se3_augmentation(
        jax.random.key(1), [pcd], pose, rot_grip, bounds,
        voxel_size=50, rot_resolution_deg=5,
    )
    idx = np.asarray(out.trans_indices)
    assert (idx >= 0).all() and (idx < 50).all()
    rot = np.asarray(out.rot_grip_indices)
    assert (rot[:, :3] >= 0).all() and (rot[:, :3] < 72).all()


def test_pcd_and_action_move_together(rng):
    """A point placed AT the gripper must land at the perturbed action position."""
    bounds, pose, rot_grip, _ = _setup(rng, b=2)
    pcd = jnp.broadcast_to(pose[:, None, None, :3], (2, 1, 1, 3))
    out = apply_se3_augmentation(
        jax.random.key(2), [pcd], pose, rot_grip, bounds,
        voxel_size=200, rot_resolution_deg=5,
    )
    moved = np.asarray(out.pcds[0]).reshape(2, 3)
    # the gripper point is the rotation origin -> translated only; its voxel index must
    # equal the augmented action index at fine resolution
    got_idx = np.asarray(G.point_to_voxel_index(jnp.asarray(moved), 200, bounds))
    np.testing.assert_array_equal(got_idx, np.asarray(out.trans_indices))


def test_rotation_only_preserves_distance_to_gripper(rng):
    bounds, pose, rot_grip, pcd = _setup(rng, b=3)
    cfg = Se3AugConfig(trans_range=(0, 0, 0), rot_range_deg=(0, 0, 180), num_candidates=8)
    out = apply_se3_augmentation(
        jax.random.key(3), [pcd], pose, rot_grip, bounds,
        voxel_size=50, rot_resolution_deg=5, cfg=cfg,
    )
    d_before = np.linalg.norm(np.asarray(pcd) - np.asarray(pose[:, None, None, :3]), axis=-1)
    d_after = np.linalg.norm(
        np.asarray(out.pcds[0]) - np.asarray(pose[:, None, None, :3]), axis=-1
    )
    np.testing.assert_allclose(d_before, d_after, atol=1e-4)


def test_two_robot_shared_perturbation(rng):
    bounds, pose_r, rot_grip, pcd = _setup(rng, b=4)
    _, pose_l, rot_grip_l, _ = _setup(rng, b=4)
    out = apply_se3_augmentation(
        jax.random.key(4), [pcd], pose_r, rot_grip, bounds,
        voxel_size=50, rot_resolution_deg=5,
        action_gripper_pose_left=pose_l, action_rot_grip_left=rot_grip_l,
    )
    assert out.trans_indices_left is not None
    for idx in (out.trans_indices, out.trans_indices_left):
        a = np.asarray(idx)
        assert (a >= 0).all() and (a < 50).all()
    # grip bits pass through per arm
    np.testing.assert_array_equal(
        np.asarray(out.rot_grip_indices_left[:, 3]), np.asarray(rot_grip_l[:, 3])
    )


def test_augmentation_actually_perturbs(rng):
    """Regression: the identity fallback slot must NOT win when random candidates
    are valid — pcds and action labels must differ from the unaugmented inputs
    for most elements of a batch given nonzero ranges."""
    bounds, pose, rot_grip, pcd = _setup(rng, b=16)
    out = apply_se3_augmentation(
        jax.random.key(7), [pcd], pose, rot_grip, bounds,
        voxel_size=200, rot_resolution_deg=5,
    )
    unaug_idx = np.asarray(G.point_to_voxel_index(pose[:, :3], 200, bounds))
    moved_action = (np.asarray(out.trans_indices) != unaug_idx).any(axis=-1)
    moved_pcd = ~np.isclose(
        np.asarray(out.pcds[0]), np.asarray(pcd), atol=1e-5
    ).all(axis=(1, 2, 3))
    # with +/-12.5%-of-scene translation at 200^3 resolution, essentially every
    # element should move; require a clear majority to keep the test robust
    assert moved_action.sum() >= 12, moved_action
    assert moved_pcd.sum() >= 12, moved_pcd


def test_identity_fallback_when_no_random_candidate_valid():
    """Keyframes at the min corner with a single huge random draw: draws with any
    negative axis (7/8 of them) must fall back to the identity (index stays
    exactly [0,0,0]); valid all-positive draws must perturb. Both branches must
    appear in a batch, and nothing may go out of bounds."""
    b = 64
    bounds = jnp.asarray(
        np.tile(np.array([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]], np.float32), (b, 1)))
    pose = np.zeros((b, 7), np.float32)
    pose[:, :3] = [-0.8, -1.0, 0.1]
    pose[:, 6] = 1.0
    rot_grip = np.zeros((b, 4), np.int32)
    pcd = jnp.asarray(np.full((b, 2, 2, 3), 0.5, np.float32))
    cfg = Se3AugConfig(trans_range=(0.4, 0.4, 0.4),
                       rot_range_deg=(0, 0, 0), num_candidates=2)
    out = apply_se3_augmentation(
        jax.random.key(11), [pcd], jnp.asarray(pose), jnp.asarray(rot_grip),
        bounds, voxel_size=50, rot_resolution_deg=5, cfg=cfg,
    )
    idx = np.asarray(out.trans_indices)
    assert (idx >= 0).all() and (idx < 50).all()
    n_identity = int((idx == 0).all(axis=-1).sum())
    # E[identity] >= 7/8 * 64 = 56; E[perturbed] ~ 8. Loose bounds for robustness.
    assert n_identity >= 32, n_identity
    assert n_identity <= 62, n_identity


def test_jit_compiles_once():
    import functools
    f = jax.jit(functools.partial(
        apply_se3_augmentation, voxel_size=50, rot_resolution_deg=5))
    rng = np.random.default_rng(5)
    bounds, pose, rot_grip, pcd = _setup(rng)
    r1 = f(jax.random.key(0), [pcd], pose, rot_grip, bounds)
    r2 = f(jax.random.key(9), [pcd], pose, rot_grip, bounds)
    assert r1.trans_indices.shape == r2.trans_indices.shape
