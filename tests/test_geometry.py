"""Geometry parity vs scipy (the reference's host-side oracle, helpers/utils.py:92-117)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from voxactb_tpu.ops import geometry as G


def random_quats(rng, n=64):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_matches_scipy(rng):
    q = random_quats(rng)
    ours = np.asarray(G.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    ref = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rotmat_to_quat_roundtrip(rng):
    q = random_quats(rng)
    m = Rotation.from_quat(q).as_matrix()
    back = np.asarray(G.rotmat_to_quat(jnp.asarray(m, jnp.float32)))
    # quaternions are sign-ambiguous; compare rotations
    dot = np.abs(np.sum(back * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_euler_xyz_matches_scipy(rng):
    q = random_quats(rng)
    ours = np.asarray(G.quat_to_euler_xyz_deg(jnp.asarray(q, jnp.float32)))
    ref = Rotation.from_quat(q).as_euler("xyz", degrees=True)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_discrete_euler_roundtrip_matches_reference_oracle(rng):
    """quaternion_to_discrete_euler == the numpy pipeline at helpers/utils.py:92-97."""
    res = 5.0
    q = random_quats(rng, 256)
    q = np.where(q[:, 3:4] < 0, -q, q)  # canonical w >= 0 as the reference enforces
    ours = np.asarray(G.quaternion_to_discrete_euler(jnp.asarray(q, jnp.float32), res))

    euler = Rotation.from_quat(q).as_euler("xyz", degrees=True) + 180.0
    disc = np.around(euler / res).astype(int)
    disc[disc == int(360 / res)] = 0

    # Binning can differ by one bin exactly at bin boundaries (float rounding); allow a
    # tiny fraction of boundary flips, require exact match elsewhere.
    mismatch = ours != disc
    assert mismatch.mean() < 0.005, f"{mismatch.sum()} mismatched bins"


def test_discrete_euler_to_quaternion_matches_scipy():
    res = 5.0
    disc = np.stack(np.meshgrid(*[np.arange(0, 72, 7)] * 3, indexing="ij"), -1).reshape(-1, 3)
    ours = np.asarray(G.discrete_euler_to_quaternion(jnp.asarray(disc), res))
    ref = Rotation.from_euler("xyz", disc * res - 180.0, degrees=True).as_quat()
    dot = np.abs(np.sum(ours * ref, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_point_to_voxel_index_matches_reference_oracle(rng):
    """Matches helpers/utils.py:104-116 exactly (same eps placement)."""
    bounds = np.array([-0.8, -1.0, 0.1, 1.2, 1.0, 2.1], np.float32)
    pts = rng.uniform(-1.5, 2.5, size=(512, 3)).astype(np.float32)
    for n in (50, 100):
        ours = np.asarray(G.point_to_voxel_index(jnp.asarray(pts), n, jnp.asarray(bounds)))
        bb_mins, bb_maxs = bounds[:3], bounds[3:]
        res = (bb_maxs - bb_mins) / (np.array([n] * 3) + 1e-12)
        ref = np.minimum(
            np.floor((pts - bb_mins) / (res + 1e-12)).astype(np.int32), n - 1
        )
        ref = np.maximum(ref, 0)  # our version clips below too; reference points are
        ours_in = ours[(ref >= 0).all(-1)]
        ref_in = ref[(ref >= 0).all(-1)]
        np.testing.assert_array_equal(ours_in, ref_in)


def test_attention_coordinate_decode():
    bounds = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
    idx = jnp.asarray([[0, 24, 49]])
    out = np.asarray(G.attention_coordinate(idx, 50, bounds))
    np.testing.assert_allclose(out[0], [0.01, 0.49, 0.99], atol=1e-6)


def test_scene_bounds_from_crop():
    out = np.asarray(G.scene_bounds_from_crop(np.array([0.123, -0.456, 0.789]), 0.3))
    np.testing.assert_allclose(out, [0.12 - 0.3, -0.46 - 0.3, 0.79 - 0.3,
                                     0.12 + 0.3, -0.46 + 0.3, 0.79 + 0.3], atol=1e-6)
