"""Fused act-program front: voxel scatter-mean + 1x1 preprocess + stats + patchify.

The XLA front half of the act program at N=100 costs ~12 ms on the relay chip
(tools/profile_stages.py: scatter 3.9 + fused conv1x1/stats ~3 + patchify 4.9): the
dense voxel grid (40 MB) is materialized and re-read, and d0 (128 MB) is written then
re-read by patchify. This kernel does the whole front in ONE pass whose only large
HBM traffic is writing d0 once (128 MB -> 1.94 ms floor at the relay's 66 GB/s):

  host pre-pass (``sort_points_by_row``, plain XLA on [P]-sized tensors): bin points
  to grid-dim0 rows exactly like ops/voxelize.py (shifted-min binning; border voxels
  dropped = the reference's +2-crop semantics, voxel_grid.py:159-184), sort by row
  id, GATHER a per-row padded payload [B, N, R, 8] (xyz | rgb | in-row indices) —
  a gather, not a scatter, so it lowers fast on TPU.

  kernel, grid (B, N), one grid-dim0 row per step:
    1. serial per-point scatter of the row's points into a [N, N', 8] f32 VMEM
       accumulator (sums + count; ~P/N points per row; collision-safe since serial);
    2. grid-row assembly: mean channels, index/N channels, occupancy — procedural;
    3. d0 row = lrelu(grid16 @ W1 + b1), written out once in bf16;
    4. online-softmax soft-argmax stats (same recurrence as encoder_stats.py);
    5. k5/s5 patchify accumulation. Conv3D pads k//2=2 with 'edge' replication and
       stride 5 never reads the back padding (models/blocks.py:126-167), so row z
       contributes to patch slab (z+2)//5 with z-tap (z+2)%5; row 0 additionally
       carries taps 0,1, folded into a 6th pre-summed weight slot; rows 98,99 (at
       N=100) contribute nothing. In-row: the y taps are 5 outer-dim strided slices
       of an edge-padded row buffer feeding 5 accumulated wide dots
       ([s*pad, C] @ [C, 5(kx)*C]); the x taps fold into output lane groups combined
       by 4 rotates; patch columns are s static sublane slices. The emitted patch
       grid is PRE-activation ([B, s, s, s, C] f32) — the caller adds the patchify
       bias and lrelu on that tiny tensor, mirroring Conv3D's f32-accumulate order.

Row capacity: each row block holds up to R points (default 2048 ≈ 6x the average
occupancy of a 2-camera 128^2 cloud at N=100); points beyond R in a single row are
dropped (the XLA path keeps them — use it if clouds are pathologically clustered).

Inference-only (no VJP); training keeps the differentiable XLA ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxactb_tpu.ops.pallas.common import (
    lrelu_rounded, stats_emit, stats_fold, stats_init)
from voxactb_tpu.ops.voxelize import MIN_DENOMINATOR


def sort_points_by_row(coords, feats, coord_bounds, *, voxel_size: int,
                       row_cap: int = 2048):
    """Bin points to interior grid-dim0 rows; sort; gather per-row padded payload.

    Returns (payload [B, N, R, 8] f32: x,y,z | rgb | dim1-idx, dim2-idx;
             row_count [B, N] int32;
             overflow [B] int32 — points DROPPED because their row exceeded the
             R capacity; the XLA scatter keeps every point (voxel_grid.py:
             106-127), so a nonzero overflow means the kernel's grid diverges
             from the reference semantics and the caller must surface it).
    Out-of-bounds points (the border voxels the reference crops away) sort
    behind a sentinel row and never enter the payload.
    """
    b, p, _ = coords.shape
    n = voxel_size
    r = row_cap

    coord_bounds = jnp.broadcast_to(coord_bounds, (b, 6)).astype(jnp.float32)
    bb_mins = coord_bounds[:, None, 0:3]
    bb_ranges = coord_bounds[:, None, 3:6] - bb_mins
    res = bb_ranges / (float(n) + MIN_DENOMINATOR)
    idx = jnp.floor((coords - (bb_mins - res)) / (res + MIN_DENOMINATOR))
    idx = jnp.clip(idx, 0, n + 1).astype(jnp.int32)
    interior = jnp.all((idx >= 1) & (idx <= n), axis=-1)
    ii = idx - 1
    key = jnp.where(interior, ii[..., 0], n)  # row id; oob -> sentinel N

    # pack (row, point-index) into one int32 so the sort moves a single array
    # (stable by construction: the low bits keep original order within a row)
    shift = 1
    while (1 << shift) < p:
        shift += 1
    packed = jnp.sort((key << shift) | jnp.arange(p, dtype=jnp.int32)[None],
                      axis=1)
    skey = packed >> shift
    order = packed & ((1 << shift) - 1)
    payload = jnp.concatenate(
        [coords, feats.astype(jnp.float32),
         ii[..., 1].astype(jnp.float32)[..., None],
         ii[..., 2].astype(jnp.float32)[..., None]], axis=-1)
    payload = jnp.take_along_axis(payload, order[..., None], axis=1)

    row_start = jax.vmap(
        lambda k: jnp.searchsorted(k, jnp.arange(n + 1), side="left"))(skey)
    row_fill = jnp.diff(row_start)
    row_count = jnp.minimum(row_fill, r).astype(jnp.int32)
    overflow = jnp.maximum(row_fill - r, 0).sum(axis=1).astype(jnp.int32)

    # slot (row, j) <- sorted point row_start[row] + j (gather; masked past count)
    slot_row = jnp.arange(n)[:, None]
    slot_j = jnp.arange(r)[None, :]
    src = row_start[:, :-1, None] + slot_j[None]                 # [B, N, R]
    valid = slot_j[None] < row_count[:, :, None]
    src = jnp.clip(src, 0, p - 1).reshape(b, n * r)
    rows = jnp.take_along_axis(payload, src[..., None], axis=1)
    rows = jnp.where(valid.reshape(b, n * r, 1), rows, 0.0)
    return rows.reshape(b, n, r, 8), row_count, overflow


def _kernel(cnt_ref, payload_ref, w1_ref, b1_ref, wp_ref, pos_h_ref, pos_w_ref,
            pos_smem_ref,
            d0_ref, patch_ref, kp_ref, gmax_ref,
            accum, xyp, pacc, stats, *, n: int, c: int, np8: int,
            interpret: bool, scatter_unroll: int = 1,
            scatter_matmul: bool = False):
    bb = pl.program_id(0)
    t = pl.program_id(1)
    s = n // 5

    @pl.when(t == 0)
    def _init():
        stats_init(stats)

    # lane masks: vals = row with lanes 6..7 replaced by [count, 0]. Built
    # by select instead of jnp.concatenate — Mosaic cannot concat operands
    # whose lane offsets differ ("result/input offset mismatch on non-concat
    # dimension" for [1,6]+[1,1]+[1,1]), a mask-multiply keeps one layout.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    keep6 = (lane < 6).astype(jnp.float32)
    unit6 = (lane == 6).astype(jnp.float32)

    if scatter_matmul:
        # 1m) one-hot MATMUL scatter: the serial RMW loop above is ~P/N
        # dynamic 8-lane VMEM read-modify-writes per row (<1% VPU lane use);
        # here the whole row scatter becomes ONE f32 MXU contraction.
        #   acc[y, x*8+ch] = sum_r onehot_y[r, y] * (onehot_x[r, x] * vals[r, ch])
        # Zero-masked payload slots (past this row's count) one-hot onto voxel
        # (0, 0) but contribute exact zeros: every vals channel is 0 there,
        # including the occupancy count, which is gated by the same mask the
        # serial path applies (idx < cnt). Each product term is exact (0/1
        # times an f32); only the f32 accumulation ORDER differs from the
        # serial schedule — the same rounding class as the XLA scatter path.
        blk = payload_ref[0, 0]                       # [R, 8] f32
        rcap = blk.shape[0]
        cnt = cnt_ref[bb, t]
        validf = (jax.lax.broadcasted_iota(jnp.int32, (rcap, 1), 0)
                  < cnt).astype(jnp.float32)
        vals = blk * keep6 + unit6 * validf           # [R, 8]
        iy = blk[:, 6:7].astype(jnp.int32)
        ix = blk[:, 7:8].astype(jnp.int32)
        oy = (jax.lax.broadcasted_iota(jnp.int32, (rcap, n), 1)
              == iy).astype(jnp.float32)              # [R, n]
        ox = (jax.lax.broadcasted_iota(jnp.int32, (rcap, np8), 1)
              == ix).astype(jnp.float32)              # [R, np8]
        w = (ox[:, :, None] * vals[:, None, :]).reshape(rcap, np8 * 8)
        acc = jax.lax.dot_general(
            oy, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(n, np8, 8)
        _scatter_rest(acc, t, n, np8, c, s, interpret,
                      w1_ref, b1_ref, wp_ref, pos_h_ref, pos_w_ref,
                      pos_smem_ref, d0_ref, patch_ref, kp_ref, gmax_ref,
                      xyp, pacc, stats)
        return

    # 1) scatter of this row's points. With scatter_unroll > 1 the accumulator
    # carries that many independent planes and each fori_loop iteration posts
    # one read-modify-write PER PLANE: the u-wide group breaks the serial
    # RMW dependency chain through a single accumulator (plane p only ever
    # sees point indices i*u+p), letting the VMEM accesses pipeline. Two
    # points of a group can share (iy, ix) — they land in different planes,
    # so the f32 sum is exact; only summation ORDER differs from the serial
    # schedule (within-f32-rounding of the XLA scatter path either way).
    accum[...] = jnp.zeros_like(accum)
    u = scatter_unroll

    def scatter_body(i, _):
        if u == 1:
            row = payload_ref[0, 0, pl.ds(i, 1), :]        # [1, 8]
            iy = row[0, 6].astype(jnp.int32)
            ix = row[0, 7].astype(jnp.int32)
            vals = row * keep6 + unit6
            cur = accum[0, pl.ds(iy, 1), pl.ds(ix, 1), :]
            accum[0, pl.ds(iy, 1), pl.ds(ix, 1), :] = cur + vals[:, None, :]
            return 0
        block = payload_ref[0, 0, pl.ds(i * u, u), :]      # [u, 8]
        cnt = cnt_ref[bb, t]
        for p in range(u):
            idx = i * u + p
            row = block[p:p + 1, :]
            iy = row[0, 6].astype(jnp.int32)
            ix = row[0, 7].astype(jnp.int32)
            # rows past cnt are zero-masked by sort_points_by_row EXCEPT the
            # occupancy count this kernel appends — gate it explicitly
            count = jnp.where(idx < cnt, 1.0, 0.0)
            vals = row * keep6 + unit6 * count
            cur = accum[p, pl.ds(iy, 1), pl.ds(ix, 1), :]
            accum[p, pl.ds(iy, 1), pl.ds(ix, 1), :] = cur + vals[:, None, :]
        return 0

    if u == 1:
        jax.lax.fori_loop(0, cnt_ref[bb, t], scatter_body, 0, unroll=False)
    else:
        jax.lax.fori_loop(0, (cnt_ref[bb, t] + u - 1) // u, scatter_body, 0,
                          unroll=False)

    # 2) grid row: mean(6) | dim0/N | dim1/N | dim2/N | occupancy | pad
    acc = accum[0, ...]
    for p in range(1, u):
        acc = acc + accum[p, ...]
    _scatter_rest(acc, t, n, np8, c, s, interpret,
                  w1_ref, b1_ref, wp_ref, pos_h_ref, pos_w_ref,
                  pos_smem_ref, d0_ref, patch_ref, kp_ref, gmax_ref,
                  xyp, pacc, stats)


def _scatter_rest(acc, t, n, np8, c, s, interpret,
                  w1_ref, b1_ref, wp_ref, pos_h_ref, pos_w_ref,
                  pos_smem_ref, d0_ref, patch_ref, kp_ref, gmax_ref,
                  xyp, pacc, stats):
    """Steps 2-5 (grid-row assembly, d0, stats, patchify) shared by the serial
    and matmul scatter schedules; ``acc`` is this row's [n, np8, 8] f32 sums."""
    count = acc[:, :, 6:7]
    mean6 = acc[:, :, 0:6] / jnp.maximum(count, 1.0)
    occ = (count > 0).astype(jnp.float32)
    d0f = jnp.broadcast_to(
        (t.astype(jnp.float32) / float(n)).reshape(1, 1, 1), (n, np8, 1))
    d1f = jax.lax.broadcasted_iota(  # Mosaic iota is integer-only
        jnp.int32, (n, np8, 1), 0).astype(jnp.float32) / float(n)
    d2f = jax.lax.broadcasted_iota(
        jnp.int32, (n, np8, 1), 1).astype(jnp.float32) / float(n)
    grid16 = jnp.concatenate(
        [mean6, d0f, d1f, d2f, occ, jnp.zeros((n, np8, 6), jnp.float32)], axis=-1)

    # 3) d0 row = lrelu(grid16 @ W1 + b1), bf16 out. The dot runs bf16 x bf16 with
    # f32 accumulate — the exact precision of the XLA path (perceiver.py casts the
    # voxel grid and conv kernel to the compute dtype before the 1x1 conv).
    pre = jax.lax.dot_general(
        grid16.astype(d0_ref.dtype), w1_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0, :c]
    # cast BEFORE the activation — Conv3D computes act_fn((y+b).astype(bf16))
    # (models/blocks.py:167), so the lrelu must see the rounded value or
    # negative pre-activations drift by ~1 ulp vs the XLA/training path
    pre = pre.astype(d0_ref.dtype)
    d = lrelu_rounded(pre)
    d0_ref[0, 0] = d[:, 0:n, :]

    # 4) online-softmax soft-argmax stats (shared ops/pallas/common recurrence)
    stats_fold(stats, d[:, 0:n, :].astype(jnp.float32),
               pos_h_ref[0:n, :, :c], pos_w_ref[:, 0:n, :c],
               pos_smem_ref[0, t], c)

    # 5) patchify accumulation (front-padded k5/s5 windows)
    zslab = (t + 2) // 5
    kz = jnp.where(t == 0, 5, (t + 2) % 5)  # slot 5 = W[0]+W[1]+W[2]

    @pl.when(zslab < s)
    def _patchify():
        @pl.when(jnp.logical_or(t == 0, (t + 2) % 5 == 0))
        def _reset():
            pacc[...] = jnp.zeros_like(pacc)

        # edge-padded row: xyp[y+2, x+2] = d[y, x]; front rows/cols replicate
        npad = xyp.shape[1]
        xyp[2:n + 2, 2:n + 2, :] = d[:, 0:n, :]
        xyp[2:n + 2, n + 2:npad, :] = jnp.zeros(
            (n, npad - n - 2, c), xyp.dtype)
        xyp[2:n + 2, 0:1, :] = d[:, 0:1, :]
        xyp[2:n + 2, 1:2, :] = d[:, 0:1, :]
        xyp[0:1, :, :] = xyp[2:3, :, :]
        xyp[1:2, :, :] = xyp[2:3, :, :]

        vsum = jnp.zeros((s, npad, 5 * c), jnp.float32)
        for ky in range(5):
            dky = xyp[pl.ds(ky, 5 * s)].reshape(s, 5, npad, c)[:, 0]
            vsum = vsum + jax.lax.dot_general(
                dky, wp_ref[kz, ky],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        roll = jnp.roll if interpret else pltpu.roll
        a = vsum[:, :, 0:c]
        for kx in range(1, 5):
            a = a + roll(vsum[:, :, kx * c:(kx + 1) * c], npad - kx, axis=1)
        for xi in range(s):
            pacc[:, xi:xi + 1, :] = (pacc[:, xi:xi + 1, :]
                                     + a[:, 5 * xi:5 * xi + 1, :])

        @pl.when((t + 2) % 5 == 4)
        def _emit():
            patch_ref[0, 0] = pacc[:, 0:s, :]

    @pl.when(t == n - 1)
    def _emit_stats():
        stats_emit(stats, kp_ref, gmax_ref, c)


@functools.partial(jax.jit, static_argnames=("voxel_size", "row_cap",
                                             "interpret", "scatter_unroll",
                                             "scatter_matmul"))
def front_fused(coords, feats, coord_bounds, w1, b1, wp, *,
                voxel_size: int, row_cap: int = 2048, interpret: bool = False,
                scatter_unroll: int = 1, scatter_matmul: bool = False):
    """Fused voxelize + preprocess-conv + stats + patchify.

    Args:
      coords: [B, P, 3] world points; feats: [B, P, 3] rgb in [-1, 1].
      coord_bounds: [B|1, 6] runtime bounds (VLM crops flow through here).
      w1: [10, C] 1x1x1 preprocess kernel; b1: [C].
      wp: [5, 5, 5, C, C] patchify kernel (dim0, dim1, dim2 taps).

    Returns (d0 [B,N,N,N,C] bf16, patch_pre [B,s,s,s,C] f32 — PRE-activation;
    the caller adds the patchify bias + lrelu — kp [B, C*3] f32, gmax [B, C] f32,
    overflow [B] int32 — points dropped past row_cap; 0 everywhere on ordinary
    clouds, nonzero when a pathologically clustered cloud exceeds a row's
    capacity, in which case the grid diverges from the XLA/reference scatter).
    """
    assert row_cap % scatter_unroll == 0, "row_cap must divide by the unroll"
    b, p, _ = coords.shape
    n = voxel_size
    s = n // 5
    c = w1.shape[-1]
    cdim = 128 if c <= 128 else c
    np8 = -(-n // 8) * 8
    npad = -(-(n + 4) // 8) * 8

    payload, row_count, overflow = sort_points_by_row(
        coords, feats, coord_bounds, voxel_size=n, row_cap=row_cap)

    w1p = jnp.zeros((16, c), jnp.bfloat16).at[0:10, :].set(
        w1.astype(jnp.bfloat16))
    b1row = jnp.zeros((1, cdim), jnp.float32).at[0, :c].set(
        b1.astype(jnp.float32))
    wp_f = wp.astype(jnp.float32)
    wp6 = jnp.concatenate(
        [wp_f, (wp_f[0] + wp_f[1] + wp_f[2])[None]], axis=0)   # [6,5,5,C,C]
    # [6(kz), 5(ky), C(ci), 5(kx)*C(co)]
    wp_packed = jnp.transpose(wp6, (0, 1, 3, 2, 4)).reshape(6, 5, c, 5 * c)

    lin = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    pos_h = jnp.broadcast_to(lin[:, None, None], (n, 1, cdim))
    pos_w = jnp.broadcast_to(lin[None, :, None], (1, n, cdim))
    pos_smem = lin.reshape(1, n)

    dt = jnp.bfloat16
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    d0, patch, kp3, gmax = pl.pallas_call(
        functools.partial(_kernel, n=n, c=c, np8=np8, interpret=interpret,
                          scatter_unroll=scatter_unroll,
                          scatter_matmul=scatter_matmul),
        grid=(b, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # row_count [B, N]
            pl.BlockSpec((1, 1, row_cap, 8),
                         lambda bb, tt: (bb, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(), full(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, n, n, c), lambda bb, tt: (bb, tt, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, s, c),
                         lambda bb, tt: (bb, jnp.minimum((tt + 2) // 5, s - 1),
                                         0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, cdim), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cdim), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, n, n, c), dt),
            jax.ShapeDtypeStruct((b, s, s, s, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, cdim), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cdim), jnp.float32),
        ),
        scratch_shapes=[
            # serial scatter accumulator; the matmul schedule produces its row
            # sums straight out of the MXU dot and only needs a placeholder
            pltpu.VMEM((1, 1, 1, 8) if scatter_matmul
                       else (scatter_unroll, n, np8, 8), jnp.float32),
            pltpu.VMEM((n + 4, npad, c), dt),                  # edge-padded row
            pltpu.VMEM((s, np8, c), jnp.float32),              # patch slab accum
            pltpu.VMEM((5, cdim), jnp.float32),                # stats
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(row_count, payload, w1p, b1row, wp_packed.astype(dt), pos_h, pos_w,
      pos_smem)

    kp = jnp.transpose(kp3[:, :, :c], (0, 2, 1)).reshape(b, c * 3)
    return d0, patch, kp, gmax[:, 0, :c], overflow
