"""Fused encoder head: 1x1x1 preprocess conv + lrelu + soft-argmax stats, one pass.

The XLA encoder front half at N=100 is three passes over the [N^3, 64] d0 tensor:
the 1x1 conv writes it, then the fused stats (max pass + exp-weighted contraction)
re-reads it twice (~380 MB of HBM traffic on top of the 40 MB input read). This
kernel streams the input voxel grid once: per z row it computes
``d0 = lrelu(x @ W1 + b1)``, writes the bf16 row out (patchify and the decoder skip
connection still consume d0 from HBM), and folds the row into the online-softmax
recurrence (running max + rescaled denominator / position-weighted numerators) so
the stats cost nothing extra. Semantics match ``softargmax_stats_3d`` including the
reference's meshgrid-'xy' quirk (network_utils.py:782-786).

Inference-only; training keeps the differentiable XLA ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxactb_tpu.ops.pallas.common import (
    lrelu_rounded, stats_emit, stats_fold, stats_init)


def _kernel(x_ref, w_ref, b_ref, pos_h_ref, pos_w_ref, pos_smem_ref,
            d0_ref, kp_ref, gmax_ref, stats, *, n: int, c: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init_stats():
        stats_init(stats)

    acc = jax.lax.dot_general(
        x_ref[0, 0], w_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[0, :c]
    # cast BEFORE lrelu: Conv3D applies act_fn((y+b).astype(bf16))
    # (models/blocks.py:167), so the activation must see the rounded value
    acc = acc.astype(d0_ref.dtype)
    d = lrelu_rounded(acc)
    d0_ref[0, 0] = d

    # online-softmax stats on the bf16-rounded row (softargmax_stats_3d parity)
    stats_fold(stats, d.astype(jnp.float32),
               pos_h_ref[0:n, :, :c], pos_w_ref[:, 0:n, :c],
               pos_smem_ref[0, t], c)

    @pl.when(t == n - 1)
    def _emit_stats():
        stats_emit(stats, kp_ref, gmax_ref, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def encoder_stats(x: jax.Array, w1: jax.Array, b1: jax.Array, *,
                  interpret: bool = False):
    """(d0 = lrelu(x @ w1 + b1) in bf16, soft-argmax kp over d0, global max).

    Args:
      x:  [B, N, N, N, Cin] voxel grid (any float dtype).
      w1: [Cin, C] 1x1x1 conv kernel (reference input_preprocess, a k=1 Conv3D).
      b1: [C] bias.

    Returns: (d0 [B,N,N,N,C] bf16, kp [B, C*3] f32, gmax [B, C] f32).
    """
    b, n, _, _, cin = x.shape
    c = w1.shape[-1]
    cdim = 128 if c <= 128 else c

    lin = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    pos_h = jnp.broadcast_to(lin[:, None, None], (n, 1, cdim))
    pos_w = jnp.broadcast_to(lin[None, :, None], (1, n, cdim))
    pos_smem = lin.reshape(1, n)
    b_row = jnp.zeros((1, cdim), jnp.float32).at[0, :c].set(b1.astype(jnp.float32))

    grid = (b, n)
    row = lambda ch: pl.BlockSpec((1, 1, n, n, ch),
                                  lambda bb, tt: (bb, tt, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    d0, kp3, gmax = pl.pallas_call(
        functools.partial(_kernel, n=n, c=c),
        grid=grid,
        in_specs=[row(cin), full(), full(), full(), full(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            row(c),
            pl.BlockSpec((1, 3, cdim), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cdim), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, n, n, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, 3, cdim), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cdim), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((5, cdim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, w1.astype(x.dtype), b_row, pos_h, pos_w, pos_smem)

    kp = jnp.transpose(kp3[:, :, :c], (0, 2, 1)).reshape(b, c * 3)
    return d0, kp, gmax[:, 0, :c]
