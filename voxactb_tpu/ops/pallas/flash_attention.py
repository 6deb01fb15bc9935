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

``flash_attention`` is the inference entry (no VJP); callers gate on
``deterministic``. ``flash_attention_train`` is the training entry: a
custom-VJP pair of kernels in the same whole-row-in-VMEM style, so the
[B*H, Tq, Tk] softmax matrix never reaches HBM in the forward OR the backward.
At the 50^3/batch-8 train point the XLA path's six self-attn layers each
stream a [8,8,2048,2048] probability tensor to HBM and back for the VJP —
the dominant term of the measured 3:1 backward/forward ratio (round-4
``tools/profile_train.py``); here the backward recomputes each q-block's
rows from (q, k, lse) on the MXU instead.

Post-softmax dropout (the reference's ``attn_dropout=0.1``,
perceiver_lang_io.py:129) runs inside the kernel with a stateless
counter-based mask: murmur3-finalizer hash of the element's global index
mixed with a per-call seed. The same formula regenerates the identical mask
in the backward, needs no cross-kernel RNG state, and works identically in
interpret mode (pltpu.prng_* has no CPU lowering).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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


# ---------------------------------------------------------------------------
# Trainable flash attention (custom VJP, in-kernel dropout)
# ---------------------------------------------------------------------------

def _hash_keep(seed, block_base, qb, tk, thr):
    """Deterministic per-element keep mask, identical in fwd and bwd.

    ``block_base`` is the global linear index of this block's (0, 0) element;
    the hash is the murmur3 finalizer over ``seed ^ (base + row * tk + col)``.
    Plain uint32 vector ops only — no pltpu PRNG state, so the mask is
    reproducible from indices alone and lowers in interpret mode. Returns a
    float32 [qb, tk] of {0, 1}; P(1) = 1 - thr / 2**32.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, (qb, tk), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (qb, tk), 1)
    x = (block_base.astype(jnp.uint32)
         + rows * jnp.uint32(tk) + cols) ^ seed.astype(jnp.uint32)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return (x >= jnp.uint32(thr)).astype(jnp.float32)


def _thr(dropout: float) -> int:
    return min(int(round(dropout * 4294967296.0)), 4294967295)


def _train_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref, lse_ref,
                      *, dropout):
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits + m_ref[0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    # lane-broadcast row stats: Mosaic requires output blocks tiled (8, 128),
    # so lse is a [qb, 128] broadcast instead of a [qb] vector
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(s), (p.shape[0], 128))
    attn = p / s
    if dropout > 0.0:
        qb, tk = attn.shape
        blk = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        base = blk.astype(jnp.uint32) * jnp.uint32(qb * tk)
        keep = _hash_keep(seed_ref[0], base, qb, tk, _thr(dropout))
        attn = attn * keep * (1.0 / (1.0 - dropout))
    o_ref[0] = jax.lax.dot_general(
        attn.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _train_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, lse_ref, do_ref, m_ref,
                      dq_ref, dk_ref, dv_ref, *, dropout):
    i = pl.program_id(1)
    bf = v_ref.dtype
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = jnp.exp(logits + m_ref[0] - lse_ref[0][:, 0:1])      # [qb, tk]
    do = do_ref[0]
    # dA = dO @ V^T ; dP = keep/kp * dA ; A = keep/kp * P
    da = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout > 0.0:
        qb, tk = p.shape
        blk = pl.program_id(0) * pl.num_programs(1) + i
        base = blk.astype(jnp.uint32) * jnp.uint32(qb * tk)
        keepf = _hash_keep(seed_ref[0], base, qb, tk, _thr(dropout)) \
            * (1.0 / (1.0 - dropout))
        a = p * keepf
        dp = da * keepf
    else:
        a = p
        dp = da
    # softmax VJP with the row term computed in VMEM (both P and dP are
    # resident — no need for the rowsum(dO*O) residual trick)
    r = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - r)).astype(bf)
    dq_ref[0] = jax.lax.dot_general(
        ds, k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _zero():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jax.lax.dot_general(
        ds, q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv_ref[0] += jax.lax.dot_general(
        a.astype(bf), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pad_shapes(q, k, q_block):
    bh, tq, hd = q.shape
    tk = k.shape[1]
    hd_pad = -(-hd // 128) * 128
    tk_pad = -(-tk // 128) * 128
    if tq < q_block:
        q_block = -(-tq // 8) * 8
    tq_pad = -(-tq // q_block) * q_block
    return bh, tq, tk, hd, hd_pad, tk_pad, tq_pad, q_block


def _pad3(x, t_to, d_to):
    return jnp.pad(x.astype(jnp.bfloat16),
                   ((0, 0), (0, t_to - x.shape[1]), (0, d_to - x.shape[2])))


def _key_mask(bh, tk, tk_pad):
    mask = jnp.full((1, tk_pad), 0.0, jnp.float32).at[0, tk:].set(-1e30)
    return jnp.broadcast_to(mask[None], (bh, 1, tk_pad))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_train(q, k, v, seed, dropout, q_block, interpret):
    out, _ = _flash_train_fwd(q, k, v, seed, dropout, q_block, interpret)
    return out


def _flash_train_fwd(q, k, v, seed, dropout, q_block, interpret):
    bh, tq, tk, hd, hd_pad, tk_pad, tq_pad, q_block = _pad_shapes(q, k, q_block)
    q_p, k_p, v_p = (_pad3(q, tq_pad, hd_pad), _pad3(k, tk_pad, hd_pad),
                     _pad3(v, tk_pad, hd_pad))
    mask = _key_mask(bh, tk, tk_pad)
    out, lse = pl.pallas_call(
        functools.partial(_train_fwd_kernel, dropout=dropout),
        grid=(bh, tq_pad // q_block),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, hd_pad), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_block, hd_pad), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, 128), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq_pad, hd_pad), v.dtype),
            jax.ShapeDtypeStruct((bh, tq_pad, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.uint32).reshape(1), q_p, k_p, v_p, mask)
    return out[:, :tq, :hd], (q, k, v, seed, lse)


def _flash_train_bwd(dropout, q_block, interpret, res, g):
    q, k, v, seed, lse = res
    bh, tq, tk, hd, hd_pad, tk_pad, tq_pad, q_block = _pad_shapes(q, k, q_block)
    q_p, k_p, v_p = (_pad3(q, tq_pad, hd_pad), _pad3(k, tk_pad, hd_pad),
                     _pad3(v, tk_pad, hd_pad))
    do_p = _pad3(g, tq_pad, hd_pad)   # padded q rows: dO = 0 -> dS rows = 0
    mask = _key_mask(bh, tk, tk_pad)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_train_bwd_kernel, dropout=dropout),
        grid=(bh, tq_pad // q_block),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, hd_pad), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, 128), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, hd_pad), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_block, hd_pad), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            # dk/dv revisit the same block across the (sequential) q-block
            # axis — accumulated in VMEM, flushed once per head
            pl.BlockSpec((1, tk_pad, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, hd_pad), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq_pad, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk_pad, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk_pad, hd_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.uint32).reshape(1), q_p, k_p, v_p, lse, do_p, mask)
    return (dq[:, :tq, :hd].astype(q.dtype), dk[:, :tk, :hd].astype(k.dtype),
            dv[:, :tk, :hd].astype(v.dtype),
            np.zeros(seed.shape, jax.dtypes.float0))


_flash_train.defvjp(_flash_train_fwd, _flash_train_bwd)


@functools.partial(jax.jit,
                   static_argnames=("dropout", "q_block", "interpret"))
def flash_attention_train(q: jax.Array, k: jax.Array, v: jax.Array,
                          seed: jax.Array, *, dropout: float = 0.0,
                          q_block: int = 512, interpret: bool = False
                          ) -> jax.Array:
    """Differentiable ``[BH,Tq,hd] x [BH,Tk,hd] -> [BH,Tq,hd]``; see module doc.

    ``q`` pre-scaled like :func:`flash_attention`. ``seed`` is a uint32 scalar
    deriving the dropout mask (ignored when ``dropout == 0``); gradients flow
    to q/k/v only.
    """
    return _flash_train(q, k, v, jnp.asarray(seed, jnp.uint32),
                        float(dropout), q_block, interpret)
