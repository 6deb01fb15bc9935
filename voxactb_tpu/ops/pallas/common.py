"""Shared pieces of the fused TPU kernels.

Every fused kernel in this package folds its rows into the same online-softmax
soft-argmax recurrence (``softargmax_stats_3d`` parity, including the
reference's meshgrid-'xy' quirk — network_utils.py:782-786) and several keep
edge-padded row rings for the k3 convolutions. One copy lives here so a
numerics fix (e.g. the corr/-inf handling) cannot silently diverge between
kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

LRELU_SLOPE = 0.02   # leaky-relu slope of every conv body (models/blocks.py)
TEMPERATURE = 0.01   # SpatialSoftmax3D temperature (network_utils.py:770)


def lrelu_rounded(x, slope=LRELU_SLOPE):
    """Leaky-relu on an already-rounded (compute-dtype, usually bf16) value.

    The comparison runs in f32 because the relay's Mosaic compiler rejects
    bf16 ``cmpf`` ("Target does not support this comparison"). Bit-identical
    to comparing in bf16: the f32<->bf16 casts preserve sign exactly, and the
    only boundary case (-0.0) lands on -0.0 through either branch.
    """
    return jnp.where(x.astype(jnp.float32) >= 0, x, x * slope)


def edge_pad_row(ref, slot, interior, n):
    """Store an [n, n, c] interior into ring slot ``slot`` with 1-voxel edge
    replication on both in-plane axes (conv padding mode='edge')."""
    ref[slot, 1:n + 1, 1:n + 1, :] = interior
    ref[slot, 1:n + 1, 0:1, :] = interior[:, 0:1, :]
    ref[slot, 1:n + 1, n + 1:n + 2, :] = interior[:, n - 1:n, :]
    ref[slot, 0:1, :, :] = ref[slot, 1:2, :, :]
    ref[slot, n + 1:n + 2, :, :] = ref[slot, n:n + 1, :, :]


def stats_init(stats):
    """Zero the (max, denom, wx, wd, wz) scratch; running max starts at -inf."""
    stats[...] = jnp.zeros_like(stats)
    stats[0, :] = jnp.full_like(stats[0, :], -jnp.inf)


def stats_fold(stats, uf, ph, pw, lin_d, c):
    """Fold one f32 plane ``uf`` [A, B, c] into the online-softmax recurrence.

    ``ph``/``pw`` are the broadcastable per-plane position grids, ``lin_d`` the
    scalar coordinate of this plane on the scanned axis. Rows 0..4 of ``stats``
    hold (running max, rescaled denominator, x-, d-, z-numerators).
    """
    row_max = jnp.max(uf, axis=(0, 1))
    m_old = stats[0, :c]
    m_new = jnp.maximum(m_old, row_max)
    corr = jnp.exp((m_old - m_new) / TEMPERATURE)
    corr = jnp.where(jnp.isfinite(corr), corr, 0.0)
    e = jnp.exp((uf - m_new[None, None, :]) / TEMPERATURE)
    se = jnp.sum(e, axis=(0, 1))
    wx = jnp.sum(e * ph, axis=(0, 1))
    wz = jnp.sum(e * pw, axis=(0, 1))
    stats[0, :c] = m_new
    stats[1, :c] = stats[1, :c] * corr + se
    stats[2, :c] = stats[2, :c] * corr + wx
    stats[3, :c] = stats[3, :c] * corr + lin_d * se
    stats[4, :c] = stats[4, :c] * corr + wz


def stats_emit(stats, kp_ref, gmax_ref, c):
    """Final divide: numerators / denominator -> kp rows, running max -> gmax."""
    denom = stats[1, :c]
    kp_ref[0, 0, :c] = stats[2, :c] / denom
    kp_ref[0, 1, :c] = stats[3, :c] / denom
    kp_ref[0, 2, :c] = stats[4, :c] / denom
    gmax_ref[0, 0, :c] = stats[0, :c]
