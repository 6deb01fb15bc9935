"""Fused decoder tail v3: inline phase-upsample — u0 never touches HBM.

v2 (decoder_head_v2.py) streams d0 AND u0 from HBM (2x 128 MB at N=100) after a
separate XLA upsample pass wrote u0 (another 128 MB). v3 deletes the u0 tensor
entirely: the kernel consumes the tiny post-``conv_in`` slab h [B, s, s, s, C]
(s = N/5, ~1 MB bf16) and reconstructs each u0 row on the fly with the SAME
phase-decomposed trilinear-x5 + k5 composition the XLA path uses
(ops/upsample_conv.py): output row z (phase rz = z%5, cell q = z//5) is

    u0[z] = lrelu( sum_{dz,dy,dx} W8[dz,dy,dx, ci, rz,ry,rx, co]
                   . h_pad[q+dz, qy+dy, qx+dx, ci]  + b )

computed as ONE K=9C dot per (row, ry-block) — the 9 (dz, dy) taps concatenate
on the contraction axis (full MXU depth), the (dx, rx, co) taps fold into output
lane groups (dx combined by sublane rolls), and the stride-5 (qx, rx) -> X
sublane interleave runs through ``_repeat5`` (broadcast+reshape elementwise
repeat + phase masks). Synthesized rows interleave to Y = 5*qy + ry by an
outer-axis concat + outer-dim merge and land in the cat ring as ONE full-plane
store per grid step; the ring keeps the d0/u0 channel halves in separate
rank-4 scratches so no store is lane-masked, outer-strided, or per-row
unrolled — all three constructs killed the relay's Mosaic compiler at n=100
(probed 2026-08-17). Everything downstream — skip-concat k3 conv (two K=C dots
per tap, one per channel half), trans conv heads, online soft-argmax stats —
is decoder_head_v2's schedule.

Per-act HBM traffic this removes at N=100 vs the v2 path: u0 write (128 MB by
XLA upsample) + u0 read (128 MB into the kernel), at the price of +265 GFLOP of
in-kernel phase dots and a 27.6 MB resident phase-weight table. On a
bandwidth-starved part (the ~66 GB/s relay chip) that trades ~3.9 ms of HBM for
~1.5-3 ms of MXU; on physical HBM the XLA upsample path can win — keep both
behind config flags and pick per platform.

Reference: the decoder tail this fuses is perceiver_lang_io.py:454-477
(up-conv + skip concat + trans head + SpatialSoftmax3D/maxpool features).
Inference-only; parity vs the XLA oracle in tests/test_decoder_v3.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxactb_tpu.ops.pallas.common import (
    LRELU_SLOPE, edge_pad_row as _edge_pad_row, lrelu_rounded, stats_emit,
    stats_fold,
    stats_init)
from voxactb_tpu.ops.upsample_conv import _phase_tap_matrix


def _phase_weight_table(up_kernel: jax.Array, scale: int) -> jax.Array:
    """[5,5,5,C,C] learned upsample kernel -> [scale, 9C, 3*scale^2*C] table.

    Row-major K axis (dz, dy, ci); lane axis (dx, ry, rx, co) with ry major so
    the kernel can take per-ry column blocks. Same tap matrix as
    ops/upsample_conv.compose_upsample_kernel, kept 8-D instead of flattened.
    """
    k = up_kernel.shape[0]
    cin, cout = up_kernel.shape[3], up_kernel.shape[4]
    T = jnp.asarray(_phase_tap_matrix(scale, k), up_kernel.dtype)
    # w8[dz, dy, dx, ci, rz, ry, rx, co]
    w8 = jnp.einsum("aud,bve,cwf,uvwio->defiabco", T, T, T, up_kernel)
    # -> [rz, ry, dz, dy, ci, dx, rx, co]  (ry pulled out as the block axis)
    w = jnp.transpose(w8, (4, 5, 0, 1, 3, 2, 6, 7))
    return w.reshape(scale, scale, 9 * cin, 3 * scale * cout)


def _repeat5(x, interpret: bool):
    """Elementwise stride-5 sublane repeat: [s, X, c] -> [s, 5X, c]."""
    if interpret:
        return jnp.repeat(x, 5, axis=1)
    s, xq, c = x.shape
    v = jnp.broadcast_to(x[:, :, None, :], (s, xq, 5, c))
    return v.reshape(s, xq * 5, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decoder_head_v3(d0: jax.Array, h: jax.Array, up_kernel: jax.Array,
                    up_bias: jax.Array, wf: jax.Array, bf: jax.Array,
                    wt: jax.Array, bt: jax.Array, *, interpret: bool = False):
    """Decoder tail with inline phase-upsample.

    Args:
      d0: [B, N, N, N, C] preprocess-conv output (the skip stream), bf16.
      h: [B, s, s, s, C] post-conv_in slab (s = N/5), the upsample input.
      up_kernel: [5, 5, 5, C, C] learned out_kernel of Conv3DUpsample.
      up_bias: [C] out_bias.
      wf, bf: final k3 conv (cat 2C -> C); wt, bt: trans head(s) [T,3,3,3,C,1].

    Returns (trans [B,N,N,N,T] f32, kp [B, 3C] f32, gmax [B, C] f32) — same
    contract as decoder_head / decoder_head_v2.
    """
    b, n, _, _, c = d0.shape
    s = n // 5
    t_heads = wt.shape[0]
    dt = d0.dtype
    cdim = 128 if c <= 128 else c

    # [3,3,2,c,3c]: channel halves split on an OUTER axis — the cat ring keeps
    # the d0 and u0 halves as separate [np8, c] planes so every kernel store is
    # full-lane-width (lane-masked half-tile stores are another Mosaic hazard)
    wf2 = jnp.transpose(wf.reshape(3, 3, 3, 2, c, c),
                        (0, 1, 3, 4, 2, 5)).reshape(3, 3, 2, c, 3 * c)
    wt2 = jnp.transpose(wt[..., 0], (1, 4, 2, 3, 0)).reshape(3, c, 9 * t_heads)
    wp = _phase_weight_table(up_kernel, 5)          # [5, 5, 9C, 15C]

    # edge-pad h on all three spatial axes (upsample_conv pads mode='edge');
    # lane-pad x to a sublane multiple with zeros (never read by valid taps)
    xh = -(-(s + 2) // 8) * 8
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")
    hp = jnp.pad(hp, ((0, 0), (0, 0), (0, 0), (0, xh - (s + 2)), (0, 0)))

    np8 = -(-(n + 2) // 8) * 8
    lin = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    pos_h = jnp.broadcast_to(lin[:, None, None], (n, 1, cdim))
    pos_w = jnp.broadcast_to(lin[None, :, None], (1, n, cdim))
    pos_smem = lin.reshape(1, n)
    bt_row = jnp.zeros((1, cdim), jnp.float32).at[0, :t_heads].set(
        bt.astype(jnp.float32))
    bf_arr = jnp.zeros((1, cdim), jnp.float32).at[0, :c].set(
        bf.astype(jnp.float32))
    upb_row = jnp.zeros((1, cdim), jnp.float32).at[0, :c].set(
        up_bias.astype(jnp.float32))

    grid = (b, n + 2)
    row_spec = lambda ref_n: pl.BlockSpec(
        (1, 1, n, n, ref_n),
        lambda bb, tt: (bb, jnp.minimum(tt, n - 1), 0, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hp_spec = pl.BlockSpec(
        (1,) + hp.shape[1:], lambda bb, tt: (bb, 0, 0, 0, 0),
        memory_space=pltpu.VMEM)
    # only the rz = z_in%5 slice of the phase table is read per grid step —
    # block it so VMEM holds one [5, 9C, 15C] slice (~5.6 MB), not the whole
    # 28 MB table (the full-resident window tipped n=100 over the VMEM limit)
    wp_spec = pl.BlockSpec(
        (1,) + wp.shape[1:],
        lambda bb, tt: (jax.lax.rem(jnp.minimum(tt, n - 1), 5), 0, 0, 0),
        memory_space=pltpu.VMEM)

    trans, kp3, gmax = pl.pallas_call(
        functools.partial(_kernel, n=n, s=s, c=c, t_heads=t_heads,
                          interpret=interpret),
        grid=grid,
        in_specs=[
            row_spec(c), hp_spec, wp_spec,
            full(), full(), full(), full(), full(), full(), full(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, n, n, t_heads),
                         lambda bb, tt: (bb, jnp.maximum(tt - 2, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, cdim), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cdim), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, n, n, t_heads), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, cdim), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cdim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, n + 2, np8, c), dt),         # cat ring, d0 half
            pltpu.VMEM((3, n + 2, np8, c), dt),         # cat ring, u0 half
            pltpu.VMEM((3, n + 2, np8, c), dt),         # u ring
            pltpu.VMEM((s, xh, 3 * 5 * c), jnp.float32),  # phase-dot out (per ry)
            pltpu.VMEM((5, cdim), jnp.float32),         # stats
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(d0.astype(dt), hp.astype(dt), wp.astype(dt), upb_row,
      wf2.astype(dt), bf_arr, wt2.astype(dt), bt_row, pos_h, pos_w, pos_smem)

    kp = jnp.transpose(kp3[:, :, :c], (0, 2, 1)).reshape(b, c * 3)
    return trans, kp, gmax[:, 0, :c]


def _kernel(d0_ref, hp_ref, wp_ref, upb_ref, wf_ref, bf_ref, wt_ref, bt_ref,
            pos_h_ref, pos_w_ref, pos_smem_ref, trans_ref, kp_ref, gmax_ref,
            cat_d0, cat_u0, u_ring, vscr, stats, *, n, s, c, t_heads,
            interpret):
    t = pl.program_id(1)
    roll = jnp.roll if interpret else pltpu.roll
    np8 = cat_d0.shape[2]
    xh = vscr.shape[1]

    @pl.when(t == 0)
    def _init_stats():
        stats_init(stats)

    # ---- synthesize row z_in = min(t, n-1): d0 row from HBM, u0 row from h ----
    slot_in = jax.lax.rem(t, 3)
    z_in = jnp.minimum(t, n - 1)
    q = z_in // 5
    # (the rz = z_in%5 phase slice arrives via wp_spec's index map)

    # d0 half-ring plane, x-edge-padded
    d0i = d0_ref[0, 0]
    cat_d0[slot_in, 1:n + 1, 1:n + 1, :] = d0i
    cat_d0[slot_in, 1:n + 1, 0:1, :] = d0i[:, 0:1, :]
    cat_d0[slot_in, 1:n + 1, n + 1:n + 2, :] = d0i[:, n - 1:n, :]

    # the 9 (dz, dy) taps concatenated on the K axis: [s, xh, 9C]
    ht = jnp.concatenate(
        [hp_ref[0, q + dz, pl.ds(dy, s), :, :]
         for dz in range(3) for dy in range(3)], axis=-1)

    colph = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (1, 5 * xh, 1), 1), 5)
    rows = []
    for ry in range(5):
        # one K=9C dot: [s, xh, 9C] @ [9C, (dx, rx, co) = 15C] -> f32
        vscr[...] = jax.lax.dot_general(
            ht, wp_ref[0, ry], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = vscr[:, :, 0:5 * c]
        for dx in (1, 2):
            a = a + roll(vscr[:, :, dx * 5 * c:(dx + 1) * 5 * c],
                         xh - dx, axis=1)
        # stride-5 (qx, rx) -> X interleave, then bias + lrelu
        acc = jnp.zeros((s, 5 * xh, c), jnp.float32)
        for rx in range(5):
            rep = _repeat5(a[:, :, rx * c:(rx + 1) * c], interpret)
            acc = acc + jnp.where(colph == rx, rep, 0.0)
        # cast BEFORE lrelu: upsample_conv returns (y+b).astype(bf16) and the
        # caller's leaky_relu runs in bf16 (ops/upsample_conv.py:93), so the
        # activation must see the rounded value
        u0p = (acc + upb_ref[0, :c]).astype(cat_d0.dtype).astype(jnp.float32)
        u0i = jnp.where(u0p >= 0, u0p, u0p * LRELU_SLOPE)
        # x-edge-pad into a [s, np8, c] plane: col 0 <- x=0, cols 1..n <- x,
        # col n+1 <- x=n-1, zero beyond
        rows.append(jnp.concatenate(
            [u0i[:, 0:1, :], u0i[:, 0:n, :], u0i[:, n - 1:n, :],
             jnp.zeros((s, np8 - (n + 2), c), jnp.float32)], axis=1
        ).astype(cat_d0.dtype)[:, None])
    # rows qy land at Y = 5*qy + ry: interleave as an OUTER-axis concat +
    # outer-dim merge ([s, 5, np8, c] -> [n, np8, c]) and store the whole
    # plane once — both a strided outer store `[ry::5]` and 100 unrolled
    # static row stores blow up the relay's Mosaic compiler at n=100
    # (SIGKILL-OOM / exit 1, probed 2026-08-17); this block store has the
    # same shape as the d0-half store above, which compiles fine
    cat_u0[slot_in, 1:n + 1, :, :] = jnp.concatenate(
        rows, axis=1).reshape(n, np8, cat_u0.shape[3])

    # y-edge rows duplicate the first/last interior row (both halves)
    for ring in (cat_d0, cat_u0):
        ring[slot_in, 0:1, :, :] = ring[slot_in, 1:2, :, :]
        ring[slot_in, n + 1:n + 2, :, :] = ring[slot_in, n:n + 1, :, :]

    # ---- downstream = decoder_head_v2's schedule verbatim ----
    @pl.when(jnp.logical_and(t >= 1, t <= n))
    def _compute_u():
        i = t - 1
        part = jnp.zeros((n, np8, 3 * c), jnp.float32)
        for dz in range(3):
            slot = jax.lax.rem(jnp.maximum(i - 1 + dz, 0), 3)
            for dy in range(3):
                for half, ring in enumerate((cat_d0, cat_u0)):
                    part = part + jax.lax.dot_general(
                        ring[slot, pl.ds(dy, n)], wf_ref[dz, dy, half],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        acc = part[:, :, 0:c]
        for dx in (1, 2):
            acc = acc + roll(part[:, :, dx * c:(dx + 1) * c], np8 - dx, axis=1)
        # cast BEFORE lrelu: Conv3D applies act_fn(y.astype(bf16))
        # (models/blocks.py:143), so the activation must see the rounded value
        acc = (acc + bf_ref[0, :c]).astype(cat_d0.dtype)
        u = lrelu_rounded(acc)
        _edge_pad_row(u_ring, jax.lax.rem(i, 3), u[:, 0:n, :], n)

        stats_fold(stats, u[:, 0:n, :].astype(jnp.float32),
                   pos_h_ref[0:n, :, :c], pos_w_ref[:, 0:n, :c],
                   pos_smem_ref[0, jnp.minimum(i, n - 1)], c)

    @pl.when(t >= 2)
    def _compute_trans():
        z = t - 2
        v = jnp.zeros((n + 2, np8, 9 * t_heads), jnp.float32)
        for dz in range(3):
            slot = jax.lax.rem(jnp.clip(z - 1 + dz, 0, n - 1), 3)
            v = v + jax.lax.dot_general(
                u_ring[slot], wt_ref[dz],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = jnp.zeros((n, np8, t_heads), jnp.float32)
        for dx in range(3):
            sh = v if dx == 0 else roll(v, np8 - dx, axis=1)
            for dy in range(3):
                g = (dy * 3 + dx) * t_heads
                acc = acc + sh[dy:dy + n, :, g:g + t_heads]
        trans_ref[0, 0] = acc[:, 0:n, :] + bt_ref[0, :t_heads]

    @pl.when(t == n + 1)
    def _emit_stats():
        stats_emit(stats, kp_ref, gmax_ref, c)
