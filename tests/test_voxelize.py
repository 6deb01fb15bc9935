"""Voxelizer parity vs a brute-force NumPy oracle of voxel_grid.py:148-198 semantics."""

import numpy as np
import jax.numpy as jnp

from voxactb_tpu.ops.voxelize import voxelize, flatten_camera_observations


def oracle_voxelize(coords, feats, bounds, n):
    """Independent loop-based implementation of the reference grid semantics."""
    b, p, _ = coords.shape
    f = feats.shape[-1]
    dims = n + 2
    out = np.zeros((b, dims, dims, dims, 3 + f + 1), np.float64)
    cnt = np.zeros((b, dims, dims, dims), np.int64)
    for bi in range(b):
        mins, maxs = bounds[bi, :3], bounds[bi, 3:]
        res = (maxs - mins) / (n + 1e-12)
        denom = res + 1e-12
        mins_shifted = mins - res
        for pi in range(p):
            idx = np.floor((coords[bi, pi] - mins_shifted) / denom).astype(int)
            idx = np.clip(idx, 0, dims - 1)
            v = np.concatenate([coords[bi, pi], feats[bi, pi], [1.0]])
            out[bi, idx[0], idx[1], idx[2]] += v
            cnt[bi, idx[0], idx[1], idx[2]] += 1
    out = out / np.maximum(cnt, 1)[..., None]
    grid = out[:, 1:-1, 1:-1, 1:-1]
    occ = (grid[..., -1:] > 0).astype(np.float64)
    r = np.arange(n, dtype=np.float64)
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    index_feat = np.stack([gx, gy, gz], -1)[None].repeat(b, 0) / n
    return np.concatenate([grid[..., :-1], index_feat, occ], -1)


def test_voxelize_matches_oracle(rng):
    b, p, n = 2, 400, 8
    bounds = np.array(
        [[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1], [-0.2, -0.2, 0.3, 0.4, 0.4, 0.9]], np.float32
    )
    # points both inside and outside bounds (border crop path)
    coords = rng.uniform(-1.5, 2.5, size=(b, p, 3)).astype(np.float32)
    feats = rng.uniform(-1, 1, size=(b, p, 3)).astype(np.float32)

    ours = np.asarray(voxelize(jnp.asarray(coords), jnp.asarray(feats),
                               jnp.asarray(bounds), voxel_size=n))
    ref = oracle_voxelize(coords, feats, bounds, n)
    assert ours.shape == (b, n, n, n, 10)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_voxelize_broadcast_bounds(rng):
    b, p, n = 3, 100, 5
    bounds = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]], np.float32)
    coords = rng.uniform(0, 1, size=(b, p, 3)).astype(np.float32)
    feats = rng.uniform(-1, 1, size=(b, p, 3)).astype(np.float32)
    out = np.asarray(voxelize(jnp.asarray(coords), jnp.asarray(feats),
                              jnp.asarray(bounds), voxel_size=n))
    ref = oracle_voxelize(coords, feats, bounds.repeat(b, 0), n)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_voxelize_occupancy_and_empty_cells(rng):
    n = 4
    bounds = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]], np.float32)
    # one point dead-center of voxel (1,1,1) at res=0.25
    coords = np.array([[[0.375, 0.375, 0.375]]], np.float32)
    feats = np.array([[[0.5, -0.5, 1.0]]], np.float32)
    out = np.asarray(voxelize(jnp.asarray(coords), jnp.asarray(feats),
                              jnp.asarray(bounds), voxel_size=n))
    assert out[0, 1, 1, 1, -1] == 1.0  # occupied
    np.testing.assert_allclose(out[0, 1, 1, 1, :3], [0.375] * 3, atol=1e-6)
    np.testing.assert_allclose(out[0, 1, 1, 1, 3:6], [0.5, -0.5, 1.0], atol=1e-6)
    assert out[..., -1].sum() == 1.0  # everything else empty
    # empty voxel has zero means but still carries its index feature
    np.testing.assert_allclose(out[0, 2, 3, 1, 6:9], np.array([2, 3, 1]) / n, atol=1e-6)


def test_flatten_camera_observations(rng):
    b = 2
    rgb1 = jnp.asarray(rng.normal(size=(b, 8, 8, 3)).astype(np.float32))
    rgb2 = jnp.asarray(rng.normal(size=(b, 4, 4, 3)).astype(np.float32))
    pcd1 = jnp.asarray(rng.normal(size=(b, 8, 8, 3)).astype(np.float32))
    pcd2 = jnp.asarray(rng.normal(size=(b, 4, 4, 3)).astype(np.float32))
    coords, feats = flatten_camera_observations([rgb1, rgb2], [pcd1, pcd2])
    assert coords.shape == (b, 64 + 16, 3)
    assert feats.shape == (b, 64 + 16, 3)
    np.testing.assert_allclose(np.asarray(coords[:, :64]), np.asarray(pcd1).reshape(b, -1, 3))
