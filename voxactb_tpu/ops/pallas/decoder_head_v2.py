"""Fused decoder tail, schedule v2: no-staging dots + reduction-based stats.

Same math and signature as ops/pallas/decoder_head.py (skip-concat k3 conv + lrelu
+ trans conv heads + soft-argmax/global-max stats), different in-kernel schedule.
v1 spends most of its 14.5 ms on VMEM traffic rather than MXU work (~80 MB of
copies/materialized intermediates per row at N=100): z-stacking the ring into a
[*, 3C] buffer (8 MB/row), a [*, 3cout] f32 ``part`` tensor for the dx-fold, a
z-stacked ``zu`` buffer for the trans conv, and four broadcast-multiply passes
over the materialized exp tensor for the stats. v2 removes all four:

- the k3 conv runs as NINE dots (dz x dy) taken DIRECTLY from the ring slots
  (outer-dim dy offsets are free; the dz index picks the slot) with the dx taps
  still folded into output columns — no z-stack buffer, no wide ``part``;
- the trans conv similarly reads the u ring directly (three K=C dots);
- the stats materialize exp(...) once and take three broadcast-multiply
  reductions straight to [C] (the same schedule ops/pallas/front_fused.py uses
  on-chip) instead of four passes over a staged [N, N', C] f32 tensor. A
  two-stage S = sum_w / T = sum_h factorization looked cheaper but its [N, C]
  intermediates hit a Mosaic relayout limitation (replicated sublane layout ->
  natural) on real TPU; the 3D reductions lower cleanly.

Inference-only; bit-compatibility with v1 is asserted in tests/test_decoder_v2.py.
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


@functools.partial(jax.jit, static_argnames=("interpret", "ablate"))
def decoder_head_v2(d0: jax.Array, u0: jax.Array, wf: jax.Array, bf: jax.Array,
                    wt: jax.Array, bt: jax.Array, *, interpret: bool = False,
                    ablate: str = ""):
    """Drop-in for decoder_head (same args/returns, v2 schedule).

    ``ablate`` (timing diagnostics ONLY — wrong outputs): "nostats" skips the
    soft-argmax fold, "notrans" skips the trans-conv pass, "tap1" runs one of
    the nine k3 taps, "dma" skips all compute (row-stream floor). Used by
    tools/probe_decoder_parts.py to attribute the kernel's time on-chip.
    """
    b, n, _, _, c = d0.shape
    t_heads = wt.shape[0]
    dt = d0.dtype
    cdim = 128 if c <= 128 else c

    # per-(dz, dy) K=2C weights with dx folded into output columns:
    #   wf2[dz, dy, ci, dx*C + co] = wf[dz, dy, dx, ci, co]
    wf2 = jnp.transpose(wf.reshape(3, 3, 3, 2 * c, c),
                        (0, 1, 3, 2, 4)).reshape(3, 3, 2 * c, 3 * c)
    #   wt2[dz, ci, (dy*3+dx)*T + th] = wt[th, dz, dy, dx, ci, 0]
    wt2 = jnp.transpose(wt[..., 0], (1, 4, 2, 3, 0)).reshape(3, c, 9 * t_heads)

    np8 = -(-(n + 2) // 8) * 8
    lin = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    pos_h = jnp.broadcast_to(lin[:, None, None], (n, 1, cdim))
    pos_w = jnp.broadcast_to(lin[None, :, None], (1, n, cdim))
    pos_smem = lin.reshape(1, n)
    bt_row = jnp.zeros((1, cdim), jnp.float32).at[0, :t_heads].set(
        bt.astype(jnp.float32))
    bf_arr = jnp.zeros((1, cdim), jnp.float32).at[0, :c].set(
        bf.astype(jnp.float32))

    grid = (b, n + 2)
    row_spec = lambda ref_n: pl.BlockSpec(
        (1, 1, n, n, ref_n),
        lambda bb, tt: (bb, jnp.minimum(tt, n - 1), 0, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    trans, kp3, gmax = pl.pallas_call(
        functools.partial(_kernel_with_bias, n=n, c=c, t_heads=t_heads,
                          interpret=interpret, ablate=ablate),
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
            pltpu.VMEM((5, cdim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d0.astype(dt), u0.astype(dt), wf2.astype(dt), bf_arr,
      wt2.astype(dt), bt_row, pos_h, pos_w, pos_smem)

    kp = jnp.transpose(kp3[:, :, :c], (0, 2, 1)).reshape(b, c * 3)
    return trans, kp, gmax[:, 0, :c]


def _kernel_with_bias(d0_ref, u0_ref, wf_ref, bf_ref, wt_ref, bt_ref,
                      pos_h_ref, pos_w_ref, pos_smem_ref,
                      trans_ref, kp_ref, gmax_ref,
                      cat_ring, u_ring, stats, *, n, c, t_heads, interpret,
                      ablate=""):
    """_kernel but the u-conv bias is applied before the lrelu (matching v1)."""
    t = pl.program_id(1)
    roll = jnp.roll if interpret else pltpu.roll
    np8 = cat_ring.shape[2]
    taps = 1 if ablate == "tap1" else 3

    @pl.when(t == 0)
    def _init_stats():
        stats_init(stats)

    slot_in = jax.lax.rem(t, 3)
    interior = jnp.concatenate([d0_ref[0, 0], u0_ref[0, 0]], axis=-1)
    _edge_pad_row(cat_ring, slot_in, interior, n)

    if ablate != "dma":
        @pl.when(jnp.logical_and(t >= 1, t <= n))
        def _compute_u():
            i = t - 1
            part = jnp.zeros((n, np8, 3 * c), jnp.float32)
            for dz in range(taps):
                slot = jax.lax.rem(jnp.maximum(i - 1 + dz, 0), 3)
                for dy in range(taps):
                    part = part + jax.lax.dot_general(
                        cat_ring[slot, pl.ds(dy, n)], wf_ref[dz, dy],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc = part[:, :, 0:c]
            for dx in (1, 2):
                acc = acc + roll(part[:, :, dx * c:(dx + 1) * c],
                                 np8 - dx, axis=1)
            # cast BEFORE lrelu: Conv3D applies act_fn(y.astype(bf16))
            # (models/blocks.py:143) — the activation must see the rounded value
            acc = (acc + bf_ref[0, :c]).astype(cat_ring.dtype)
            u = lrelu_rounded(acc)
            _edge_pad_row(u_ring, jax.lax.rem(i, 3), u[:, 0:n, :], n)

            if ablate != "nostats":
                stats_fold(stats, u[:, 0:n, :].astype(jnp.float32),
                           pos_h_ref[0:n, :, :c], pos_w_ref[:, 0:n, :c],
                           pos_smem_ref[0, jnp.minimum(i, n - 1)], c)

    if ablate == "dma":
        # row-stream floor: read both rows, write a zero trans row, no compute
        @pl.when(t >= 2)
        def _trans_zero():
            trans_ref[0, 0] = jnp.zeros((n, n, t_heads), jnp.float32)
        @pl.when(t == n + 1)
        def _emit_dma():
            stats_emit(stats, kp_ref, gmax_ref, c)
        return

    if ablate != "notrans":
        @pl.when(t >= 2)
        def _compute_trans():
            z = t - 2
            v = jnp.zeros((n + 2, np8, 9 * t_heads), jnp.float32)
            for dz in range(taps):
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
    else:
        @pl.when(t >= 2)
        def _trans_zero():
            trans_ref[0, 0] = jnp.zeros((n, n, t_heads), jnp.float32)

    @pl.when(t == n + 1)
    def _emit_stats():
        stats_emit(stats, kp_ref, gmax_ref, c)
