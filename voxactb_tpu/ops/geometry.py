"""Rotation / discretization geometry, fully traceable under ``jax.jit``.

The reference keeps this math on host NumPy/SciPy (peract/helpers/utils.py:92-117 —
``quaternion_to_discrete_euler``, ``discrete_euler_to_quaternion``,
``point_to_voxel_index``) and converts per-sample inside Python loops
(peract/voxel/augmentation.py:159-177). Here every function is a pure jnp program so the
whole act/update path stays on device with no host round-trips.

Conventions (matching the reference):
- Quaternions are ``xyzw`` unless suffixed ``_wxyz``.
- Euler angles are extrinsic x-y-z (scipy ``Rotation.as_euler('xyz')``), i.e. the rotation
  matrix factors as ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``.
- Discrete rotations are ``round((euler_deg + 180) / resolution) % num_bins``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_DENOMINATOR = 1e-12


def normalize_quaternion(quat: jax.Array) -> jax.Array:
    """Unit-normalize quaternion(s) along the last axis (helpers/utils.py:64-65)."""
    return quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)


def canonicalize_quaternion(quat: jax.Array) -> jax.Array:
    """Normalize and flip sign so the scalar part w (last component) is >= 0.

    The reference applies ``if quat[-1] < 0: quat = -quat`` before discretization
    (launch_utils.py:199-201, augmentation.py:168-170).
    """
    quat = normalize_quaternion(quat)
    return jnp.where(quat[..., 3:4] < 0, -quat, quat)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of xyzw quaternions: rotation q1 then composed as R(q1)@R(q2)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """xyzw quaternion(s) -> 3x3 rotation matrix (broadcasts over leading axes)."""
    q = normalize_quaternion(quat)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> xyzw quaternion, branch-free (Shepperd's method).

    Computes all four candidate solutions and selects the numerically strongest with
    ``argmax`` so the function stays traceable and vectorized (no data-dependent
    branches, unlike pytorch3d's ``matrix_to_quaternion`` used at augmentation.py:152).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four squared magnitudes (times 4): w², x², y², z².
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    sw = _safe_sqrt(qw2) * 2.0  # 4w
    sx = _safe_sqrt(qx2) * 2.0  # 4x
    sy = _safe_sqrt(qy2) * 2.0  # 4y
    sz = _safe_sqrt(qz2) * 2.0  # 4z

    # Candidate quaternions (xyzw) depending on which component is largest.
    cand_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4.0], -1)
    cand_x = jnp.stack([sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], -1)
    cand_y = jnp.stack([(m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy, (m02 - m20) / sy], -1)
    cand_z = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0, (m10 - m01) / sz], -1)

    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4 choices, 4]
    quat = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    return normalize_quaternion(quat[..., 0, :])


def euler_xyz_to_rotmat(euler_rad: jax.Array) -> jax.Array:
    """Extrinsic xyz euler (radians, last axis [roll, pitch, yaw]) -> rotation matrix.

    ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` — matches scipy ``from_euler('xyz', ...)``.
    """
    a, b, c = euler_rad[..., 0], euler_rad[..., 1], euler_rad[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    m = jnp.stack(
        [
            cb * cc, sa * sb * cc - ca * sc, ca * sb * cc + sa * sc,
            cb * sc, sa * sb * sc + ca * cc, ca * sb * sc - sa * cc,
            -sb, sa * cb, ca * cb,
        ],
        axis=-1,
    )
    return m.reshape(euler_rad.shape[:-1] + (3, 3))


def rotmat_to_euler_xyz(m: jax.Array) -> jax.Array:
    """Rotation matrix -> extrinsic xyz euler angles in radians ([roll, pitch, yaw]).

    Inverse of :func:`euler_xyz_to_rotmat`; pitch is clamped into [-pi/2, pi/2] via the
    asin branch, matching scipy away from gimbal lock (|pitch| = pi/2 only ever appears
    transiently under the 5-degree action discretization used by the reference).
    """
    pitch = jnp.arcsin(jnp.clip(-m[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    yaw = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_euler_xyz_deg(quat: jax.Array) -> jax.Array:
    """xyzw quaternion -> extrinsic xyz euler in degrees (scipy ``as_euler('xyz', True)``)."""
    return jnp.rad2deg(rotmat_to_euler_xyz(quat_to_rotmat(quat)))


def euler_xyz_deg_to_quat(euler_deg: jax.Array) -> jax.Array:
    """Extrinsic xyz euler in degrees -> xyzw quaternion."""
    return rotmat_to_quat(euler_xyz_to_rotmat(jnp.deg2rad(euler_deg)))


def quaternion_to_discrete_euler(quat: jax.Array, resolution_deg: float) -> jax.Array:
    """Discretize rotation into per-axis bins (helpers/utils.py:92-97).

    euler+180 lands in [0, 360]; bins are ``round(euler / resolution)`` with the full-turn
    bin wrapped back to 0. Returns int32 with values in [0, 360/resolution).
    """
    num_bins = round(360.0 / resolution_deg)
    euler = quat_to_euler_xyz_deg(quat) + 180.0
    disc = jnp.round(euler / resolution_deg).astype(jnp.int32)
    return jnp.where(disc == num_bins, 0, disc)


def discrete_euler_to_quaternion(disc: jax.Array, resolution_deg: float) -> jax.Array:
    """Inverse of :func:`quaternion_to_discrete_euler` (helpers/utils.py:100-102)."""
    euler_deg = disc.astype(jnp.float32) * resolution_deg - 180.0
    return euler_xyz_deg_to_quat(euler_deg)


def point_to_voxel_index(
    point: jax.Array, voxel_size: int, coord_bounds: jax.Array
) -> jax.Array:
    """Metric point -> integer voxel index, clipped into the grid.

    Mirrors helpers/utils.py:104-116: ``res = range / (N + eps)``;
    ``idx = clip(floor((p - mins) / (res + eps)), 0, N - 1)``. ``point`` broadcasts over
    leading axes; ``coord_bounds`` is a 6-vector (or broadcastable) [mins, maxs].

    DELIBERATE deviation: the reference clamps only from above, so a keyframe
    below the (crop) bounds yields a negative index that fails loudly in its
    torch one-hot; jnp would silently WRAP a negative label instead, which is
    worse — we clamp to 0 (the augmentation path that needs the reference's
    unclamped floor uses ``_unclamped_voxel_floor`` in ops/augmentation.py).
    """
    bb_mins = coord_bounds[..., 0:3]
    bb_maxs = coord_bounds[..., 3:6]
    res = (bb_maxs - bb_mins) / (float(voxel_size) + MIN_DENOMINATOR)
    idx = jnp.floor((point - bb_mins) / (res + MIN_DENOMINATOR)).astype(jnp.int32)
    return jnp.clip(idx, 0, voxel_size - 1)


def voxel_index_to_point(
    voxel_index: jax.Array, voxel_size: int, coord_bounds: jax.Array
) -> jax.Array:
    """Voxel index -> metric point at the voxel's min corner (helpers/utils.py:119-125)."""
    res = (coord_bounds[..., 3:6] - coord_bounds[..., 0:3]) / float(voxel_size)
    return voxel_index.astype(jnp.float32) * res + coord_bounds[..., 0:3]


def attention_coordinate(
    voxel_index: jax.Array, voxel_size: int, coord_bounds: jax.Array
) -> jax.Array:
    """Voxel index -> metric point at the voxel *center*.

    ``bounds_min + res * idx + res / 2`` — the act()-time world-coordinate decode
    (qattention_peract_bc_agent.py:724).
    """
    res = (coord_bounds[..., 3:6] - coord_bounds[..., 0:3]) / float(voxel_size)
    return coord_bounds[..., 0:3] + res * voxel_index.astype(jnp.float32) + res / 2.0


def scene_bounds_from_crop(crop_point, radius: float):
    """Crop point ± radius -> new scene bounds [x0,y0,z0,x1,y1,z1].

    Mirrors ``get_new_scene_bounds_based_on_crop`` (helpers/utils.py:32-40), including the
    round-to-2-decimals of the crop point. Works on jnp or np arrays.
    """
    p = jnp.round(jnp.asarray(crop_point, jnp.float32), 2)
    return jnp.concatenate([p - radius, p + radius], axis=-1)
