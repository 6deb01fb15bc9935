"""Plain flash attention (TPU Pallas): softmax(q @ k^T + mask) @ v, logits in VMEM.

The perceiver trunk's XLA attention (models/perceiver.py Attention) materializes
f32 ``[B, heads, Tq, Tk]`` logits in HBM: per act at the 100^3 operating point
that is 6 self-attn layers of [B,8,2048,2048] plus cross [B,1,2048,8077] and
decoder [B,1,8077,2048] — the dominant non-modeled HBM term at batch 8
(~1 GB/layer), invisible in tools/cost_model.act_cost's original "activations
stream once" accounting. This kernel computes one q-block's full logit rows in
VMEM (k/v for the head fit comfortably: <=2 MB each at Tk=8192), so logits
never hit HBM. Per-row f32 max/exp/sum matches the XLA softmax numerics; the
only deviation is MXU summation order.

Padding is handled internally: head_dim -> multiple of 128 (zeros, exact),
Tq -> multiple of the q block (outputs sliced), Tk -> multiple of 128 with a
-1e30 additive mask so padded keys get zero attention.

Inference-only (no VJP); callers gate on ``deterministic``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits + m_ref[0]          # [1, Tk] broadcast row
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    attn = (p / s).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        attn, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    *, q_block: int = 512, interpret: bool = False
                    ) -> jax.Array:
    """``[BH, Tq, hd] x [BH, Tk, hd] -> [BH, Tq, hd]`` in ``v.dtype``.

    ``q`` must be PRE-SCALED (by ``dim_head ** -0.5``) to match the caller's
    convention; softmax runs in f32 over the full key axis.
    """
    bh, tq, hd = q.shape
    tk = k.shape[1]
    hd_pad = -(-hd // 128) * 128
    tk_pad = -(-tk // 128) * 128
    if tq < q_block:
        q_block = -(-tq // 8) * 8   # tiny grids (tests): one block
    tq_pad = -(-tq // q_block) * q_block
    bf = jnp.bfloat16

    def pad(x, t_to, d_to):
        return jnp.pad(x.astype(bf), ((0, 0), (0, t_to - x.shape[1]),
                                      (0, d_to - x.shape[2])))

    q_p = pad(q, tq_pad, hd_pad)
    k_p = pad(k, tk_pad, hd_pad)
    v_p = pad(v, tk_pad, hd_pad)
    mask = jnp.full((1, tk_pad), 0.0, jnp.float32).at[0, tk:].set(-1e30)
    mask = jnp.broadcast_to(mask[None], (bh, 1, tk_pad))

    out = pl.pallas_call(
        _kernel,
        grid=(bh, tq_pad // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, hd_pad), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, hd_pad), lambda h, i: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, hd_pad), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q_p, k_p, v_p, mask)
    return out[:, :tq, :hd]
