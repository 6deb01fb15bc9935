"""Fused spatial-softmax-3D + global-max head as a single-pass Pallas kernel.

The Perceiver decoder computes, per feature map, BOTH a temperature-0.01 soft-argmax
over the cubic grid (``SpatialSoftmax3D``, network_utils.py:773-808) and a global max
pool — at N=100 that is several full passes over a [10^6, C] tensor, and the profiled
hotspot after the convolutions (tools/profile_stages.py: ss0 5.1ms + globalmax 2.2ms
per call, x2-3 call sites).

This kernel makes ONE pass using the online-softmax (flash) recurrence: a running
per-channel max ``m``, rescaled accumulators for the denominator and the three
position-weighted numerators, and the global max — all in VMEM scratch across a 1-D
grid over spatial chunks. Output is [5, C] f32: (E[x], E[y], E[z], logsumexp-denominator
slot is folded in, global max); the wrapper turns that into the reference's
[C*3] keypoint layout + [C] max pool.

Position convention matches blocks.spatial_softmax_3d (the reference's meshgrid 'xy'
quirk): E[x] integrates lin[h_idx], E[y] lin[d_idx], E[z] lin[w_idx].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TEMPERATURE = 0.01


def _kernel(x_ref, ex_ref, ey_ref, ez_ref, gmax_ref,
            m_ref, den_ref, ax_ref, ay_ref, az_ref, gm_ref, *, n: int,
            chunk: int):
    i = pl.program_id(0)
    num_chunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        den_ref[...] = jnp.zeros_like(den_ref)
        ax_ref[...] = jnp.zeros_like(ax_ref)
        ay_ref[...] = jnp.zeros_like(ay_ref)
        az_ref[...] = jnp.zeros_like(az_ref)
        gm_ref[...] = jnp.full_like(gm_ref, -jnp.inf)

    x = x_ref[...].astype(jnp.float32)          # [chunk, C]
    logits = x / TEMPERATURE

    # positions of this chunk's rows in the (d, h, w) cube
    flat = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    d_idx = flat // (n * n)
    h_idx = (flat // n) % n
    w_idx = flat % n
    denom = jnp.float32(max(n - 1, 1))
    lin = lambda idx: (idx.astype(jnp.float32) / denom) * 2.0 - 1.0  # noqa: E731
    px, py, pz = lin(h_idx), lin(d_idx), lin(w_idx)   # [chunk, 1] each

    m_old = m_ref[...]                             # [1, C]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=0, keepdims=True))
    corr = jnp.exp(m_old - m_new)
    p = jnp.exp(logits - m_new)                    # [chunk, C]

    den_ref[...] = den_ref[...] * corr + jnp.sum(p, axis=0, keepdims=True)
    ax_ref[...] = ax_ref[...] * corr + jnp.sum(px * p, axis=0, keepdims=True)
    ay_ref[...] = ay_ref[...] * corr + jnp.sum(py * p, axis=0, keepdims=True)
    az_ref[...] = az_ref[...] * corr + jnp.sum(pz * p, axis=0, keepdims=True)
    gm_ref[...] = jnp.maximum(gm_ref[...], jnp.max(x, axis=0, keepdims=True))
    m_ref[...] = m_new

    @pl.when(i == num_chunks - 1)
    def _finish():
        inv = 1.0 / den_ref[...]
        ex_ref[...] = ax_ref[...] * inv
        ey_ref[...] = ay_ref[...] * inv
        ez_ref[...] = az_ref[...] * inv
        gmax_ref[...] = gm_ref[...]


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _stats_head_single(x_flat: jax.Array, *, n: int, interpret: bool = False):
    """x_flat [S=n^3, C] -> (ex, ey, ez, gmax) each [1, C] f32."""
    s, c = x_flat.shape
    # fewest grid steps with VMEM-sized blocks: largest divisor of S <= 16384 whose
    # sublane count is a multiple of 8 (TPU block constraint). At N=100, S=10^6 ->
    # chunk 10000 / 100 steps; small grids fall back to a single full-array block.
    # Block sizing: mosaic's scoped-VMEM budget (16MB) bounds the ~8 f32 [chunk, C]
    # temporaries, which caps chunks at ~2048 rows for C=64 (4000 rows OOMs at
    # 21.3MB). Measured on the v5e relay: correct to 5e-6 vs the XLA path, but the
    # resulting 500-step sequential grid loses to XLA's fused reductions there
    # (15.1ms vs 11.2ms at N=100) — hence pallas_stats defaults to False; flip it on
    # for hardware where grid-step overhead is lower.
    chunk = s
    for cand in range(min(s, 2048) // 8 * 8, 0, -8):
        if s % cand == 0:
            chunk = cand
            break
    grid = s // chunk

    out_shape = [jax.ShapeDtypeStruct((1, c), jnp.float32)] * 4
    out_specs = [pl.BlockSpec((1, c), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)] * 4
    return pl.pallas_call(
        functools.partial(_kernel, n=n, chunk=chunk),
        grid=(grid,),
        in_specs=[pl.BlockSpec((chunk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32) for _ in range(6)],
        interpret=interpret,
    )(x_flat)


def stats_head(feature: jax.Array, interpret: bool = False):
    """[B, N, N, N, C] -> (keypoints [B, C*3], global_max [B, C]).

    Drop-in for ``(spatial_softmax_3d(x), global_max_pool_3d(x))`` with one HBM pass.
    """
    b, d, h, w, c = feature.shape
    assert d == h == w, "stats_head expects a cubic grid"
    flat = feature.reshape(b, d * h * w, c)

    def per_sample(x):
        ex, ey, ez, gmax = _stats_head_single(x, n=d, interpret=interpret)
        kp = jnp.stack([ex[0], ey[0], ez[0]], axis=-1).reshape(c * 3)
        return kp, gmax[0]

    kps, gmaxs = jax.vmap(per_sample)(flat)
    return kps, gmaxs
