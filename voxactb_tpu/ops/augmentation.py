"""SE(3) data augmentation for point clouds + keyframe actions, fully on device.

Behavioral counterpart of ``apply_se3_augmentation`` (peract/voxel/augmentation.py:68-185)
and its two-robot variant (:187-348). The reference's rejection loop round-trips
device->host every attempt (``.cpu().numpy()`` + per-sample Python loop,
augmentation.py:151-177 — the "device ping-pong" called out in SURVEY §3). Here the
whole thing is one traced program:

- draw ``num_candidates`` i.i.d. perturbations per batch element up front;
- discretize all of them vectorized (geometry.py ops);
- pick each element's FIRST in-bounds RANDOM candidate (same per-element marginal
  distribution as the reference's redraw-until-valid loop, since draws are i.i.d. —
  conditional on at least one of the ``num_candidates - 1`` random draws being valid);
- candidate slot 0 is a reserved identity fallback: an element whose random draws are
  ALL out of bounds degrades to "no augmentation" instead of raising after 100
  attempts like the reference. Widen ``num_candidates`` if that tail matters.

Out-of-bounds detection matches the reference exactly: ``point_to_voxel_index`` clamps
only from above (helpers/utils.py:104-116), so a negative floor index is the only
rejection signal — points past the max bound silently clamp to N-1 there too.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from voxactb_tpu.ops import geometry as G

MIN_DENOMINATOR = 1e-12


class Se3AugConfig(NamedTuple):
    """Knobs from PERACT_BC.yaml:48-52 (aug_xyz / aug_rpy / resolution)."""

    trans_range: tuple = (0.125, 0.125, 0.125)  # fraction of scene bounds per axis
    rot_range_deg: tuple = (0.0, 0.0, 45.0)     # +/- degrees per axis
    rot_resolution_deg: int = 5                  # discrete augmentation rotation steps
    num_candidates: int = 16                     # vectorized rejection-sampling width


def _unclamped_voxel_floor(point, voxel_size, bounds):
    """floor bin index WITHOUT lower clamp — negative => out of bounds (reject)."""
    bb_mins = bounds[..., 0:3]
    res = (bounds[..., 3:6] - bb_mins) / (float(voxel_size) + MIN_DENOMINATOR)
    idx = jnp.floor((point - bb_mins) / (res + MIN_DENOMINATOR)).astype(jnp.int32)
    return jnp.minimum(idx, voxel_size - 1)


def _sample_candidates(rng, cfg: Se3AugConfig, bounds, b):
    """[K, B, 3] translation shifts + [K, B, 3, 3] rotation matrices; slot 0 = identity."""
    k = cfg.num_candidates
    rng_t, rng_r = jax.random.split(rng)

    trans_range = (bounds[:, 3:6] - bounds[:, 0:3]) * jnp.asarray(
        cfg.trans_range, jnp.float32
    )
    trans = trans_range[None] * jax.random.uniform(
        rng_t, (k, b, 3), minval=-1.0, maxval=1.0
    )

    # discrete rotation steps at the augmentation resolution (augmentation.py:128-141)
    steps = jnp.asarray(
        [int(r // cfg.rot_resolution_deg) for r in cfg.rot_range_deg], jnp.int32
    )
    draw = jax.random.randint(rng_r, (k, b, 3), -steps, steps + 1)
    euler_rad = jnp.deg2rad(draw.astype(jnp.float32) * cfg.rot_resolution_deg)
    # the reference composes Rx(roll)@Ry(pitch)@Rz(yaw) — pytorch3d
    # euler_angles_to_matrix(.., "XYZ"), augmentation.py:142 — which equals
    # transpose(Rz(-yaw)@Ry(-pitch)@Rx(-roll)); identical to the scipy-xyz
    # composition for single-axis draws (the default yaw-only aug) but not
    # for multi-axis rot_range settings
    rot = jnp.swapaxes(G.euler_xyz_to_rotmat(-euler_rad), -1, -2)

    ident_t = jnp.zeros((1, b, 3), jnp.float32)
    ident_r = jnp.broadcast_to(jnp.eye(3), (1, b, 3, 3))
    return (
        jnp.concatenate([ident_t, trans[1:]], 0),
        jnp.concatenate([ident_r, rot[1:]], 0),
    )


def _perturb_pose(gripper_pose, trans_shift, rot_mat):
    """Keyframe pose [B,7] (xyz + xyzw quat) -> perturbed (trans [K,B,3], quat [K,B,4]).

    Matches the reference composition: rotate the gripper frame about itself, then
    translate (R_new = R_g @ R_shift; t_new = t_g + t_shift — augmentation.py:146-148).
    """
    t_g = gripper_pose[:, :3]
    r_g = G.quat_to_rotmat(gripper_pose[:, 3:7])
    r_new = jnp.einsum("bij,kbjl->kbil", r_g, rot_mat)
    t_new = t_g[None] + trans_shift
    quat = G.canonicalize_quaternion(G.rotmat_to_quat(r_new))
    return t_new, quat


class Se3AugResult(NamedTuple):
    trans_indices: jax.Array      # [B, 3] int32
    rot_grip_indices: jax.Array   # [B, 4] int32 (3 rot bins + grip bit)
    pcds: tuple                   # perturbed point clouds, same shapes as input
    # two-robot extras (None in single-arm mode)
    trans_indices_left: Optional[jax.Array] = None
    rot_grip_indices_left: Optional[jax.Array] = None


def apply_se3_augmentation(
    rng: jax.Array,
    pcds: Sequence[jax.Array],
    action_gripper_pose: jax.Array,
    action_rot_grip: jax.Array,
    bounds: jax.Array,
    *,
    voxel_size: int,
    rot_resolution_deg: int,
    cfg: Se3AugConfig = Se3AugConfig(),
    action_gripper_pose_left: Optional[jax.Array] = None,
    action_rot_grip_left: Optional[jax.Array] = None,
) -> Se3AugResult:
    """Jointly perturb point clouds and keyframe action(s).

    Args:
      rng: PRNG key.
      pcds: per-camera ``[B, H, W, 3]`` (or ``[B, P, 3]``) world-frame clouds.
      action_gripper_pose: ``[B, 7]`` keyframe gripper pose (xyz + xyzw quaternion).
      action_rot_grip: ``[B, 4]`` previous discrete rot bins + grip bit (only the grip
        bit is reused; rot bins are re-derived from the perturbed pose).
      bounds: ``[B, 6]`` metric scene bounds.
      action_gripper_pose_left / action_rot_grip_left: supply both to get the two-robot
        behavior (augmentation.py:187-348): ONE shared perturbation drawn per element,
        valid only if BOTH arms' perturbed actions stay in bounds, clouds rotated about
        the RIGHT gripper (the reference's documented choice, augmentation.py:344-346).
    """
    b = action_gripper_pose.shape[0]
    bounds = jnp.broadcast_to(bounds, (b, 6)).astype(jnp.float32)
    two_robot = action_gripper_pose_left is not None

    trans_shift, rot_mat = _sample_candidates(rng, cfg, bounds, b)

    t_right, q_right = _perturb_pose(action_gripper_pose, trans_shift, rot_mat)
    floor_right = _unclamped_voxel_floor(t_right, voxel_size, bounds[None])
    valid = jnp.all(floor_right >= 0, axis=-1)  # [K, B]

    if two_robot:
        t_left, q_left = _perturb_pose(
            action_gripper_pose_left, trans_shift, rot_mat
        )
        floor_left = _unclamped_voxel_floor(t_left, voxel_size, bounds[None])
        valid &= jnp.all(floor_left >= 0, axis=-1)

    # first valid RANDOM candidate per element; identity slot 0 only as a fallback
    # when every random draw lands out of bounds (else argmax(valid) would always
    # return the always-valid identity and silently disable augmentation)
    any_random_valid = jnp.any(valid[1:], axis=0)  # [B]
    chosen = jnp.where(any_random_valid, 1 + jnp.argmax(valid[1:], axis=0), 0)

    def pick(x):  # [K, B, ...] -> [B, ...]
        return jnp.take_along_axis(
            x, chosen.reshape((1, b) + (1,) * (x.ndim - 2)), axis=0
        )[0]

    sel_shift = pick(trans_shift)
    sel_rot = pick(rot_mat)

    def make_result(floor, quat, grip_src):
        idx = jnp.clip(pick(floor), 0, voxel_size - 1)
        rot_bins = G.quaternion_to_discrete_euler(pick(quat), rot_resolution_deg)
        grip = grip_src[:, 3:4].astype(jnp.int32)
        return idx, jnp.concatenate([rot_bins, grip], axis=-1)

    trans_idx, rot_grip = make_result(floor_right, q_right, action_rot_grip)
    trans_idx_l = rot_grip_l = None
    if two_robot:
        trans_idx_l, rot_grip_l = make_result(
            floor_left, q_left, action_rot_grip_left
        )

    # Perturb clouds about the (right) gripper origin with the clamped translation
    # (perturb_se3, augmentation.py:7-65). The reference clamps the shifted gripper
    # position into the global min/max of the batch bounds.
    anchor = action_gripper_pose[:, :3]
    lo = jnp.min(bounds[:, 0:3], axis=0)
    hi = jnp.max(bounds[:, 3:6], axis=0)
    shifted_anchor = jnp.clip(anchor + sel_shift, lo, hi)

    out_pcds = []
    for p in pcds:
        flat = p.reshape(b, -1, 3)
        # the reference right-multiplies row vectors by the homogeneous shift matrix,
        # i.e. applies R^T to points centered on the gripper
        centered = flat - anchor[:, None]
        rotated = jnp.einsum("bpi,bij->bpj", centered, sel_rot)
        out_pcds.append((rotated + shifted_anchor[:, None]).reshape(p.shape))

    return Se3AugResult(
        trans_indices=trans_idx,
        rot_grip_indices=rot_grip,
        pcds=tuple(out_pcds),
        trans_indices_left=trans_idx_l,
        rot_grip_indices_left=rot_grip_l,
    )
