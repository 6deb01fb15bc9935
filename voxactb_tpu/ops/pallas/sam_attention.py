"""Fused global attention for the SAM image encoder (TPU Pallas).

The XLA path of ``models/sam_encoder.WindowAttention`` materializes the
rel-pos-augmented attention logits for the four GLOBAL blocks of ViT-H as an
f32 ``[B, 16, 4096, 4096]`` tensor (~1 GB) plus its 6-D broadcast-add view —
several GB of HBM traffic per block, which is where the measured 445 ms/frame
(vs a 31 ms roofline, tools/cost_model.sam_encoder_cost) goes. This kernel
keeps the logits in VMEM.

Trick: SAM's decomposed relative position bias
``bias[i, j] = rel_h[i, kh(j)] + rel_w[i, kw(j)]`` is a rank-2(ish) structure
that folds INTO the Q@K^T matmul by augmenting the contraction axis:

    q' = [q * scale | rel_h_hi | rel_h_lo | rel_w_hi | rel_w_lo]   [T, 384]
    k' = [k         | 1_kh(j)  | 1_kh(j)  | 1_kw(j)  | 1_kw(j) ]   [T, 384]
    logits = q' @ k'^T   (f32 accumulate)

where ``rel_hi = bf16(rel)`` and ``rel_lo = bf16(rel - rel_hi)`` split each
f32 bias value into two bf16 columns whose one-hot-selected sum reconstructs
it to ~f32 accuracy inside the MXU's f32 accumulator. The kernel body is then
two dots and an f32 softmax — no in-kernel reshapes or broadcasts over a
split lane axis (which Mosaic relayouts poorly).

Per grid step (head, q-block of 512): q' 384 KB + k' 3 MB + v 1 MB (bf16) +
logits 8.4 MB (f32) ~= 13 MB VMEM. HBM traffic per ViT-H global block drops
from ~3.5 GB to ~0.3 GB (k'/v re-read per q-block).

Numerics vs the XLA path: identical softmax (f32 max/exp/sum over the full
row), identical bf16 attn @ v with f32 accumulation; the only deviation is
the hi/lo bf16 split of the bias (|err| <= ~2^-17 per value) and MXU
summation order. Asserted within tolerance in tests/test_sam_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_last(x: jax.Array, to: int) -> jax.Array:
    pad = to - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))


def _kernel(q_ref, k_ref, v_ref, o_ref, *, t):
    # q' [qb, K], k' [t, K] -> logits [qb, t] in f32, entirely in VMEM
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    attn = (p / s).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        attn, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "q_block",
                                             "interpret"))
def global_rel_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         rel_h_term: jax.Array, rel_w_term: jax.Array,
                         *, kh: int, kw: int, q_block: int = 512,
                         interpret: bool = False) -> jax.Array:
    """Attention with decomposed rel-pos bias, logits never in HBM.

    Args:
      q, k, v: ``[BH, T, hd]`` (q pre-scaled by ``head_dim**-0.5``), any float
        dtype (computed in bf16 on the fast path).
      rel_h_term: ``[BH, T, kh]`` f32 — ``einsum(q, Rh)`` per query token.
      rel_w_term: ``[BH, T, kw]`` f32.
      kh, kw: key grid dims; ``T == kh * kw``.

    Returns ``[BH, T, hd]`` in ``v.dtype``.
    """
    bh, t, hd = q.shape
    assert t == kh * kw, (t, kh, kw)
    if t % q_block:
        q_block = t  # tiny grids (tests): one block
    hd_pad = max(128, -(-hd // 128) * 128)
    bf = jnp.bfloat16

    # one-hot selectors of each key's grid row/column
    j = jnp.arange(t)
    sel_h = jax.nn.one_hot(j // kw, kh, dtype=bf)           # [T, kh]
    sel_w = jax.nn.one_hot(j % kw, kw, dtype=bf)            # [T, kw]
    sel = jnp.concatenate([sel_h, sel_h, sel_w, sel_w], -1)  # [T, 2kh+2kw]
    k_aug = jnp.concatenate(
        [_pad_last(k.astype(bf), hd_pad),
         jnp.broadcast_to(sel[None], (bh, t, sel.shape[-1]))], -1)

    def hi_lo(r):
        hi = r.astype(bf)
        lo = (r - hi.astype(jnp.float32)).astype(bf)
        return hi, lo

    rh_hi, rh_lo = hi_lo(rel_h_term)
    rw_hi, rw_lo = hi_lo(rel_w_term)
    q_aug = jnp.concatenate(
        [_pad_last(q.astype(bf), hd_pad), rh_hi, rh_lo, rw_hi, rw_lo], -1)

    kdim = q_aug.shape[-1]
    v_p = _pad_last(v.astype(bf), hd_pad)

    out = pl.pallas_call(
        functools.partial(_kernel, t=t),
        grid=(bh, t // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, kdim), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, kdim), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, hd_pad), lambda h, i: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, hd_pad), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q_aug, k_aug, v_p)
    return out[..., :hd]
