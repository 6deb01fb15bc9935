"""Fused decoder tail, schedule v2c: MXU-side z-accumulation via K-concat.

Same math and signature as decoder_head_v2 (skip-concat k3 conv + lrelu + trans
conv head + soft-argmax/global-max stats). v2's u-conv runs NINE accumulating
dots per output row (dz x dy), so the f32 ``part`` accumulator
([n, np8, 3*cout] = 8 MB at N=100) is written and re-read nine times —
~144 MB/row of VMEM traffic, the dominant term of the measured 3x gap to the
kernel's HBM+MXU floor (round-4 profile: 98.5 ms per 8 acts vs a 31.5 ms DMA
floor + 20.8 ms MXU floor). v2c folds the dz axis into the contraction:

- the cat ring is ONE channel-blocked buffer [n+2, np8, 3*2C]; the incoming
  row is stored into lane block (t mod 3) by three statically-offset
  predicated writes (Mosaic requires static lane offsets);
- the u-conv is THREE dots (one per dy window, free sublane offsets) with
  K = 3*2C = 384: the z-accumulation happens inside the MXU accumulator, so
  ``part`` is written 3x instead of 9x;
- the ring-slot -> dz role mapping rotates with the row index, so the kernel
  selects among weight layouts by phase (i mod 3). Edge clamping (plane -1 :=
  plane 0, plane n := plane n-1) is LINEAR in the weights, so the two boundary
  rows use two extra pre-summed layouts instead of clamped slot indices
  (5 layouts total, picked by a traced leading index);
- the trans conv gets the same treatment: u ring [n+2, np8, 3C], one K=192
  dot per row with 5 phase layouts.

Inference-only; bit-compatibility with v2 is asserted in tests/test_decoder_v2.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxactb_tpu.ops.pallas.common import (
    lrelu_rounded, stats_emit, stats_fold, stats_init)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decoder_head_v2c(d0: jax.Array, u0: jax.Array, wf: jax.Array,
                     bf: jax.Array, wt: jax.Array, bt: jax.Array, *,
                     interpret: bool = False):
    """Drop-in for decoder_head_v2 (same args/returns, v2c schedule)."""
    b, n, _, _, c = d0.shape
    t_heads = wt.shape[0]
    dt = d0.dtype
    cdim = 128 if c <= 128 else c
    c2 = 2 * c

    # per-dz K=2C weights with (dy handled by windows, dx folded into output
    # columns): wf2[dz, dy, ci, dx*C + co] = wf[dz, dy, dx, ci, co]
    wf2 = jnp.transpose(wf.reshape(3, 3, 3, c2, c),
                        (0, 1, 3, 2, 4)).reshape(3, 3, c2, 3 * c)
    # wt2[dz, ci, (dy*3+dx)*T + th] = wt[th, dz, dy, dx, ci, 0]
    wt2 = jnp.transpose(wt[..., 0], (1, 4, 2, 3, 0)).reshape(3, c, 9 * t_heads)

    def kconcat_layouts(w_dz, k_inner):
        """[3(dz), K_inner, N] -> [5, 3*K_inner, N] phase/edge layouts."""
        nout = w_dz.shape[-1]
        z = jnp.zeros((3, k_inner, nout), w_dz.dtype)

        def place(blocks):  # blocks: tuple of 3 [k_inner, N] (block0..2)
            return jnp.concatenate(blocks, axis=0)

        layouts = []
        for phase in range(3):
            blocks = [z[0], z[0], z[0]]
            for dz in range(3):
                blocks[(phase - 1 + dz) % 3] = w_dz[dz]
            layouts.append(place(tuple(blocks)))
        # Edge weights are NOT pre-summed (bf16(w0+w1) rounds differently from
        # v2's two bf16-weighted dots — measured 0.06 abs drift through the
        # lrelu); instead the kernel stores an explicit DUPLICATE of the
        # clamped plane in the otherwise-unused block, keeping operands
        # bit-identical to v2.
        # edge i=0: plane0 in block0 <- w[1]; plane1 in block1 <- w[2];
        # plane0 duplicate in block2 <- w[0] (the clamped plane -1 tap)
        layouts.append(place((w_dz[1], w_dz[2], w_dz[0])))
        # edge i=n-1: plane n-2 in block (n-2)%3 <- w[0]; plane n-1 in block
        # (n-1)%3 <- w[1]; plane n-1 duplicate in block n%3 <- w[2]
        blocks = [z[0], z[0], z[0]]
        blocks[(n - 2) % 3] = w_dz[0]
        blocks[(n - 1) % 3] = w_dz[1]
        blocks[n % 3] = w_dz[2]
        layouts.append(place(tuple(blocks)))
        return jnp.stack(layouts)  # [5, 3*k_inner, N]

    # u-conv layouts: per dy, [5, 3*2C, 3C]
    wfk = jnp.stack([kconcat_layouts(wf2[:, dy], c2) for dy in range(3)],
                    axis=1)                      # [5, 3(dy), 3*2C, 3C]
    # trans layouts: [5, 3C, 9T] — the trans conv reads u planes z-1..z+1 and
    # clamps at 0 and n-1 exactly like v2 (jnp.clip(z - 1 + dz, 0, n - 1))
    wtk = kconcat_layouts(wt2, c)                # [5, 3C, 9T]

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
            pltpu.VMEM((n + 2, np8, 3 * 2 * c), dt),    # channel-blocked cat ring
            pltpu.VMEM((n + 2, np8, 3 * c), dt),        # channel-blocked u ring
            pltpu.VMEM((5, cdim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d0.astype(dt), u0.astype(dt), wfk.astype(dt), bf_arr,
      wtk.astype(dt), bt_row, pos_h, pos_w, pos_smem)

    kp = jnp.transpose(kp3[:, :, :c], (0, 2, 1)).reshape(b, c * 3)
    return trans, kp, gmax[:, 0, :c]


def _store_block(ring, block, row, n, c_inner):
    """Edge-pad ``row`` [n, n, c_inner] into channel block ``block`` (static
    lane offset) of a [n+2, np8, 3*c_inner] channel-blocked ring."""
    lo = block * c_inner
    hi = lo + c_inner
    ring[1:n + 1, 1:n + 1, lo:hi] = row
    ring[1:n + 1, 0:1, lo:hi] = row[:, 0:1, :]
    ring[1:n + 1, n + 1:n + 2, lo:hi] = row[:, n - 1:n, :]
    ring[0:1, :, lo:hi] = ring[1:2, :, lo:hi]
    ring[n + 1:n + 2, :, lo:hi] = ring[n:n + 1, :, lo:hi]


def _kernel(d0_ref, u0_ref, wfk_ref, bf_ref, wtk_ref, bt_ref,
            pos_h_ref, pos_w_ref, pos_smem_ref,
            trans_ref, kp_ref, gmax_ref,
            cat_ring, u_ring, stats, *, n, c, t_heads, interpret):
    t = pl.program_id(1)
    roll = jnp.roll if interpret else pltpu.roll
    np8 = cat_ring.shape[1]

    @pl.when(t == 0)
    def _init_stats():
        stats_init(stats)
        # scratch VMEM is uninitialized: the K-concat dots read ALL channel
        # blocks (zero-weighted for the not-yet-written ones), and bf16
        # garbage can parse as NaN — NaN * 0 = NaN in the MXU accumulator
        cat_ring[...] = jnp.zeros_like(cat_ring)
        u_ring[...] = jnp.zeros_like(u_ring)

    slot_in = jax.lax.rem(t, 3)
    interior = jnp.concatenate([d0_ref[0, 0], u0_ref[0, 0]], axis=-1)
    for blk in range(3):
        @pl.when(slot_in == blk)
        def _store(blk=blk):
            _store_block(cat_ring, blk, interior, n, 2 * c)

    @pl.when(t == 0)
    def _store_clamp_dup():
        # plane -1 clamps to plane 0 (edge padding): layout 3 reads the
        # duplicate from block 2 with the dz=0 weights
        _store_block(cat_ring, 2, interior, n, 2 * c)

    @pl.when(jnp.logical_and(t >= 1, t <= n))
    def _compute_u():
        i = t - 1
        sel = jnp.where(i == 0, 3,
                        jnp.where(i == n - 1, 4, jax.lax.rem(i, 3)))
        part = jnp.zeros((n, np8, 3 * c), jnp.float32)
        for dy in range(3):
            part = part + jax.lax.dot_general(
                cat_ring[pl.ds(dy, n)], wfk_ref[sel, dy],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = part[:, :, 0:c]
        for dx in (1, 2):
            acc = acc + roll(part[:, :, dx * c:(dx + 1) * c], np8 - dx, axis=1)
        # cast BEFORE lrelu: Conv3D applies act_fn(y.astype(bf16))
        # (models/blocks.py:143), so the activation must see the rounded value
        acc = (acc + bf_ref[0, :c]).astype(cat_ring.dtype)
        u = lrelu_rounded(acc)
        islot = jax.lax.rem(i, 3)
        for blk in range(3):
            @pl.when(islot == blk)
            def _store_u(blk=blk):
                _store_block(u_ring, blk, u[:, 0:n, :], n, c)

        # clamp duplicate for the trans conv's z=0 edge layout: u plane 0 also
        # into block 2 (the z=-1 tap) — exact v2 operands, no pre-summed
        # edge weights
        @pl.when(i == 0)
        def _store_u_dup0():
            _store_block(u_ring, 2, u[:, 0:n, :], n, c)

        stats_fold(stats, u[:, 0:n, :].astype(jnp.float32),
                   pos_h_ref[0:n, :, :c], pos_w_ref[:, 0:n, :c],
                   pos_smem_ref[0, jnp.minimum(i, n - 1)], c)

    @pl.when(t == n + 1)
    def _store_u_dupn():
        # trans z=n-1's clamped z=n tap: duplicate u plane n-1 (block
        # (n-1)%3) into block n%3. Must happen at t=n+1, NOT when the plane
        # is computed at t=n — trans z=n-2 (same step t=n) still reads the
        # plane n-3 that block n%3 holds then.
        src, dst = ((n - 1) % 3) * c, (n % 3) * c
        u_ring[:, :, dst:dst + c] = u_ring[:, :, src:src + c]

    @pl.when(t >= 2)
    def _compute_trans():
        z = t - 2
        # v2 clamps the u-plane index (jnp.clip(z-1+dz, 0, n-1)): at z=0 the
        # dz=0 tap reads plane 0 twice; at z=n-1 the dz=2 tap reads plane n-1
        # twice — the same linear edge fold the wtk layouts 3/4 encode
        selt = jnp.where(z == 0, 3,
                         jnp.where(z == n - 1, 4, jax.lax.rem(z, 3)))
        v = jax.lax.dot_general(
            u_ring[...], wtk_ref[selt],
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
