"""Phase-decomposed trilinear-upsample + conv — the hot op of the Q-net decoder.

The reference decoder does ``conv(k5,s1) -> trilinear x5 -> conv(k5,s1)`` at full grid
resolution (Conv3DUpsampleBlock, network_utils.py:237-254); at N=100 the second conv
alone is ~1 TFLOP of poorly-tiled 3D convolution (the profile hotspot of the whole
fused act program). Because the x5 trilinear upsample (half-pixel centers) is a FIXED
linear map with <=2 taps per axis, it can be composed with the learned 5^3 kernel into
125 phase-specific 3^3 kernels applied at the LOW resolution:

    y[5q + r] = sum_{delta in {-1,0,1}^3} W'_r[delta] . x[q + delta]

i.e. one k3 conv at 20^3 with 64 -> 125*64 output channels followed by a
depth-to-space reshape — a dense MXU-shaped contraction at ~1/4.6 of the FLOPs.

Exactness: identical to resize+conv in the interior. At the outermost two output
voxels per face the reference clamps at 100^3 granularity while the composition clamps
at 20^3 granularity (edge padding), giving slightly different border taps — use
``exact=True`` (resize+conv) when bit-parity with ported reference checkpoints at the
border voxels matters; training and argmax behavior are unaffected in practice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from voxactb_tpu.models.blocks import _conv_f32acc
import numpy as np


@functools.lru_cache()
def _phase_tap_matrix(scale: int, ksize: int) -> np.ndarray:
    """T[r, k, d]: weight of input cell (q + d - 1) in output phase r via conv tap k.

    1D composition of: trilinear upsample x``scale`` (half-pixel centers, clamped) and
    a VALID conv of size ``ksize`` over the edge-padded upsampled signal. ``d`` indexes
    the 3 input taps {-1, 0, +1}.
    """
    pad = ksize // 2
    T = np.zeros((scale, ksize, 3), np.float64)
    for r in range(scale):
        for k in range(ksize):
            o = k - pad
            m = r + o  # upsampled position offset within/beyond the block
            qq, rr = divmod(m, scale)
            # source coordinate of upsampled sample (q + qq, phase rr):
            # c = (rr + 0.5)/scale - 0.5 relative to cell q + qq
            c = (rr + 0.5) / scale - 0.5
            lo = int(np.floor(c))
            w_hi = c - lo
            for tap_off, w in ((lo, 1.0 - w_hi), (lo + 1, w_hi)):
                if w == 0.0:
                    continue
                d = qq + tap_off
                d = max(-1, min(1, d))  # edge-clamp composition (see module doc)
                T[r, k, d + 1] += w
    return T


def compose_upsample_kernel(kernel: jax.Array, scale: int) -> jax.Array:
    """[k,k,k,Cin,Cout] learned kernel -> [3,3,3,Cin, scale^3 * Cout] composite."""
    k = kernel.shape[0]
    T = jnp.asarray(_phase_tap_matrix(scale, k), kernel.dtype)
    # W'[dx,dy,dz, ci, rx,ry,rz, co] = sum_{kx,ky,kz} T[rx,kx,dx] T[ry,ky,dy]
    #                                   T[rz,kz,dz] K[kx,ky,kz,ci,co]
    w = jnp.einsum("aud,bve,cwf,uvwio->defiabco", T, T, T, kernel)
    s3 = scale ** 3
    cin, cout = kernel.shape[3], kernel.shape[4]
    return w.reshape(3, 3, 3, cin, s3 * cout)


def upsample_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                  scale: int) -> jax.Array:
    """trilinear x``scale`` then conv(kernel, replicate pad) — fused fast path.

    x: [B, D, D, D, Cin]; kernel: [k,k,k,Cin,Cout]; returns [B, sD, sD, sD, Cout].
    """
    b, d, _, _, cin = x.shape
    k = kernel.shape[0]
    if scale < k // 2 + 1:
        # the phase decomposition folds each conv tap into one of 3 coarse
        # cells; at scale < k//2+1 an interior tap reaches BEYOND the +-1
        # neighbor cell and the tap matrix clamps it (wrong output everywhere,
        # numerically reproduced at scale=2/k=5: interior err 0.46) — take the
        # exact resize+conv path instead
        return reference_upsample_conv(x, kernel, bias, scale)
    cout = kernel.shape[-1]
    comp = compose_upsample_kernel(kernel, scale)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")
    # _conv_f32acc: f32-accumulate forward with a bf16-safe custom backward
    y = _conv_f32acc(xp, comp.astype(x.dtype), (1, 1, 1),
                     ("NDHWC", "DHWIO", "NDHWC"))  # [B, D, D, D, scale^3 * Cout]

    # depth-to-space: [B,D,D,D,(s,s,s,Cout)] -> [B, sD, sD, sD, Cout]
    y = y.reshape(b, d, d, d, scale, scale, scale, cout)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    y = y.reshape(b, d * scale, d * scale, d * scale, cout)
    return (y + bias).astype(x.dtype)


def reference_upsample_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                            scale: int) -> jax.Array:
    """The exact (slow) semantics: jax.image trilinear resize + edge-pad conv."""
    b, d, _, _, cin = x.shape
    up = jax.image.resize(
        x, (b, d * scale, d * scale, d * scale, cin), method="trilinear")
    pad = kernel.shape[0] // 2
    up = jnp.pad(up, ((0, 0),) + ((pad, pad),) * 3 + ((0, 0),), mode="edge")
    y = _conv_f32acc(up, kernel.astype(x.dtype), (1, 1, 1),
                     ("NDHWC", "DHWIO", "NDHWC"))
    return (y + bias).astype(x.dtype)
