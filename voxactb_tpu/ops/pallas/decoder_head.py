"""Fused Perceiver decoder head: skip-concat conv3x3 + lrelu + trans conv(s) + stats.

The XLA decoder tail at N=100 is four bandwidth-bound passes over ~128 MB tensors
(tools/profile_quick.py on the v5e relay chip):

    final k3 conv (cat[d0,u0] 128ch -> u 64ch)   10.6 ms
    trans  k3 conv (u -> 1ch Q-field, x2 arms)    9.2 ms each
    soft-argmax + global-max stats over u         6.8 ms

i.e. ~27-36 ms of the 46 ms act step, almost all HBM traffic: u (128 MB) and the
concat (256 MB) are materialized and re-read several times. This kernel streams d0
and u0 through VMEM ONCE (256 MB total reads) and computes everything else on-chip:

  for each z row (sequential grid, rolling ring buffers in VMEM scratch):
    cat row   = [d0 | u0] spatially edge-padded                 (ring of 3)
    u row     = lrelu( sum_{27 taps} cat @ Wf[tap] + bf )       (ring of 3)
    trans row = sum_{27 taps} u @ Wt[tap] + bt                  (written out, T heads)
    stats     = online-softmax (flash) recurrence over u rows:
                running per-channel max m, rescaled denominator and three
                position-weighted numerators (blocks.softargmax_stats_3d semantics,
                including the reference's meshgrid-'xy' quirk).

Replicate ('edge') padding matches ``Conv3D``'s ``jnp.pad(mode="edge")`` in x/y/z.
Per-batch-element HBM traffic: read 2x[N^3,C] + write [N^3,T] f32 — ~264 MB at
N=100/C=64/T=2 vs ~1.3 GB for the unfused chain.

Inference-only (no VJP): the training path keeps the differentiable XLA ops; the
reference has no analogue (torch runs the unfused chain, qattention_peract_bc_agent
.py:86-135 / perceiver_lang_io.py:440-485).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxactb_tpu.ops.pallas.common import (
    edge_pad_row as _edge_pad_row, lrelu_rounded, stats_emit, stats_fold,
    stats_init)


def _conv27(ring_ref, slots, zbuf, w_ref, n, c, cout, interpret):
    """acc[y,x,co] = sum_{dz,dy,dx} ring[slots[dz]][y+dy, x+dx, :] @ w[tap].

    Mosaic-friendly schedule: the three z rows are channel-stacked once into
    ``zbuf`` [N+2, N+2, 3C] (aligned lane-offset copies), the x taps fold into
    the OUTPUT columns ([3C, 3*cout], groups ordered (dx, co)), and the y taps
    are free outer-dim offsets — 3 full-width [N,N,3C]x[3C,3*cout] contractions
    total (vs 9 half-width before; vs 27 relayout-heavy shifted-window matmuls
    which compile ~10x slower on Mosaic). The dx combine rotates only the
    narrow f32 group slices: out[x] = part[x+dx]; wrapped sublanes land at
    >= n+2-dx > n-1, outside the final [0:n] window.

    ``w_ref``: [3(dy), 3C, 3(dx)*cout] with the z taps folded into the K dim.
    """
    for dz in range(3):
        zbuf[:, :, dz * c:(dz + 1) * c] = ring_ref[slots[dz]]
    roll = jnp.roll if interpret else pltpu.roll
    np8 = zbuf.shape[1]  # sublane width padded to 8 (rotates require alignment)

    def dy_body(dy, part):
        return part + jax.lax.dot_general(
            zbuf[pl.ds(dy, n), :, :], w_ref[dy],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    part = jax.lax.fori_loop(
        0, 3, dy_body, jnp.zeros((n, np8, 3 * cout), jnp.float32))
    acc = part[:, :, 0:cout]
    for dx in (1, 2):  # static-shift rotates of the cout-aligned group slices
        acc = acc + roll(part[:, :, dx * cout:(dx + 1) * cout],
                         np8 - dx, axis=1)
    return acc[:, 0:n, :]


def _kernel(d0_ref, u0_ref, wf_ref, bf_ref, wt_ref, bt_ref, pos_h_ref, pos_w_ref,
            pos_smem_ref,
            trans_ref, kp_ref, gmax_ref,
            cat_ring, u_ring, zcat, zu, stats, *, n: int, c: int, t_heads: int,
            interpret: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init_stats():
        stats_init(stats)

    # 1) build padded cat row for logical z-row `t` (content clamped at N-1 by the
    #    input index_map, matching replicate padding in z)
    slot_in = jax.lax.rem(t, 3)
    interior = jnp.concatenate([d0_ref[0, 0], u0_ref[0, 0]], axis=-1)
    _edge_pad_row(cat_ring, slot_in, interior, n)

    # 2) u row i = t-1 from cat rows (i-1, i, i+1), z-clamped at 0
    @pl.when(jnp.logical_and(t >= 1, t <= n))
    def _compute_u():
        i = t - 1
        slots = [jax.lax.rem(jnp.maximum(i - 1 + dz, 0), 3) for dz in range(3)]
        acc = (_conv27(cat_ring, slots, zcat, wf_ref, n, 2 * c, c,
                       interpret) + bf_ref[0, :c]).astype(cat_ring.dtype)
        # cast BEFORE lrelu: Conv3D applies act_fn(y.astype(bf16))
        # (models/blocks.py:143), so the activation must see the rounded value
        u = lrelu_rounded(acc)
        _edge_pad_row(u_ring, jax.lax.rem(i, 3), u, n)

        # online-softmax stats over u rows (f32, matching softargmax_stats_3d
        # on the bf16-rounded u the XLA path sees); reference quirk: E[x] <-
        # lin[h(row-axis0)], E[y] <- lin[d(z)], E[z] <- lin[w]
        stats_fold(stats, u.astype(jnp.float32),
                   pos_h_ref[0:n, :, :c], pos_w_ref[:, 0:n, :c],
                   pos_smem_ref[0, jnp.minimum(i, n - 1)], c)

    # 3) trans row z = t-2 from u rows (z-1, z, z+1), clamped to [0, N-1].
    #    cout = t_heads (1-2) is tiny, so 9 shifted-window dots waste the MXU on
    #    2-lane outputs; instead ONE wide dot projects each u row onto all 9
    #    (dy, dx) taps at once (columns ordered (dy, dx, head)) and the combine
    #    is 9 shifted lane-group adds — measured ~2x less in-kernel time than the
    #    9-dot form (probe: 0.074 vs 0.153 ms/row after dispatch subtraction).
    @pl.when(t >= 2)
    def _compute_trans():
        z = t - 2
        slots = [
            jax.lax.rem(jnp.clip(z - 1 + dz, 0, n - 1), 3) for dz in range(3)
        ]
        for dz in range(3):
            zu[:, :, dz * c:(dz + 1) * c] = u_ring[slots[dz]]
        roll = jnp.roll if interpret else pltpu.roll
        np8 = zu.shape[1]
        v = jax.lax.dot_general(
            zu[...], wt_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [N+2, np8, 9T]
        acc = jnp.zeros((n, np8, t_heads), jnp.float32)
        for dx in range(3):
            # wrapped sublanes land at x >= np8-dx > n-1, outside [0:n)
            sh = v if dx == 0 else roll(v, np8 - dx, axis=1)
            for dy in range(3):
                g = (dy * 3 + dx) * t_heads
                acc = acc + sh[dy:dy + n, :, g:g + t_heads]
        trans_ref[0, 0] = acc[:, 0:n, :] + bt_ref[0, :t_heads]

    # 4) final program: emit stats
    @pl.when(t == n + 1)
    def _emit_stats():
        stats_emit(stats, kp_ref, gmax_ref, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decoder_head(d0: jax.Array, u0: jax.Array, wf: jax.Array, bf: jax.Array,
                 wt: jax.Array, bt: jax.Array, *, interpret: bool = False):
    """Fused u = lrelu(conv3([d0|u0])) -> (trans heads, soft-argmax kp, global max).

    Args:
      d0: [B, N, N, N, C] skip features (bf16/f32).
      u0: [B, N, N, N, C] upsampled decoder features.
      wf: [3, 3, 3, 2C, C] final-conv kernel (d0 channels first — concat order).
      bf: [C] final-conv bias.
      wt: [T, 3, 3, 3, C, 1] trans-decoder kernels (T heads: right[, left]).
      bt: [T] trans biases.

    Returns:
      trans: [B, N, N, N, T] f32 Q fields.
      kp:    [B, C*3] f32 per-channel (x, y, z) soft-argmax triplets over u.
      gmax:  [B, C] f32 per-channel global max over u.
    """
    b, n, _, _, c = d0.shape
    t_heads = wt.shape[0]
    dt = d0.dtype
    cdim = 128 if c <= 128 else c  # lane-pad the stats/pos rows

    # repack for _conv27's (dy, z-stacked-K, dx-grouped-out) schedule:
    #   wfK[dy, dz*2C + ci, dx*C + co] = wf[dz, dy, dx, ci, co]
    wf_packed = jnp.transpose(wf, (1, 0, 3, 2, 4)).reshape(3, 3 * 2 * c, 3 * c)
    #   wtK[dz*C + ci, (dy*3 + dx)*T + t] = wt[t, dz, dy, dx, ci, 0]
    #   (one wide projection; the (dy, dx) taps become output lane groups)
    wt_packed = jnp.transpose(wt[..., 0], (1, 4, 2, 3, 0)).reshape(
        3 * c, 9 * t_heads)
    np8 = -(-(n + 2) // 8) * 8  # rotate-aligned sublane width
    lin = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    pos_h = jnp.broadcast_to(lin[:, None, None], (n, 1, cdim))  # [h,1,lanes]=lin[h]
    pos_w = jnp.broadcast_to(lin[None, :, None], (1, n, cdim))  # [1,w,lanes]=lin[w]
    pos_smem = lin.reshape(1, n)
    bf_row = jnp.zeros((1, cdim), jnp.float32).at[0, :c].set(bf.astype(jnp.float32))
    bt_row = jnp.zeros((1, cdim), jnp.float32).at[0, :t_heads].set(
        bt.astype(jnp.float32))

    grid = (b, n + 2)
    row_spec = lambda ref_n: pl.BlockSpec(
        (1, 1, n, n, ref_n),
        lambda bb, tt: (bb, jnp.minimum(tt, n - 1), 0, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    trans, kp3, gmax = pl.pallas_call(
        functools.partial(_kernel, n=n, c=c, t_heads=t_heads,
                          interpret=interpret),
        grid=grid,
        in_specs=[
            row_spec(c), row_spec(c),
            full(), full(), full(), full(), full(), full(),
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
            pltpu.VMEM((3, n + 2, np8, 2 * c), dt),     # cat ring
            pltpu.VMEM((3, n + 2, np8, c), dt),         # u ring
            pltpu.VMEM((n + 2, np8, 3 * 2 * c), dt),    # z-stacked cat rows
            pltpu.VMEM((n + 2, np8, 3 * c), dt),        # z-stacked u rows
            pltpu.VMEM((5, cdim), jnp.float32),          # m, den, wx, wy, wz
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d0.astype(dt), u0.astype(dt), wf_packed.astype(dt), bf_row,
      wt_packed.astype(dt), bt_row, pos_h, pos_w, pos_smem)

    # interleave (x, y, z) per channel to the reference's flat [C*3] layout
    kp = jnp.transpose(kp3[:, :, :c], (0, 2, 1)).reshape(b, c * 3)
    return trans, kp, gmax[:, 0, :c]
