"""Network building blocks (flax.linen), channels-LAST throughout.

Behavioral counterparts of peract/helpers/network_utils.py (Conv3DBlock :128,
Conv3DUpsampleBlock :237, DenseBlock :257, SpatialSoftmax3D :773). Differences by
design, not accident:

- Layouts are NDHWC (TPU-native); the reference is NCDHW for cuDNN.
- Replicate padding is explicit ``jnp.pad(mode="edge")`` + VALID conv — XLA fuses the
  pad into the convolution; torch's ``padding_mode='replicate'`` does the same thing.
- Initializers mirror the reference's activation-conditioned choices (xavier-uniform
  for linear heads, kaiming/he-uniform for relu/lrelu bodies) so variance profiles of
  fresh checkpoints match.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.02


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_f32acc(x, kernel, strides, dimension_numbers):
    """Convolution with exact f32 accumulation AND a working bf16 backward.

    ``preferred_element_type=f32`` on bf16 inputs breaks ``jax.grad`` (the
    transposed conv receives an f32 cotangent against bf16 operands); this
    wrapper keeps the f32-accumulate forward (inference parity depends on it)
    and runs the backward as standard mixed precision: the cotangent is cast to
    the operand dtype before the transposed convs — the torch-AMP convention.
    """
    return jax.lax.conv_general_dilated(
        x, kernel, strides, "VALID", dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32)


def _conv_f32acc_fwd(x, kernel, strides, dimension_numbers):
    return _conv_f32acc(x, kernel, strides, dimension_numbers), (x, kernel)


def _conv_f32acc_bwd(strides, dimension_numbers, res, g):
    x, kernel = res

    def plain(x_, k_):
        return jax.lax.conv_general_dilated(
            x_, k_, strides, "VALID", dimension_numbers=dimension_numbers)

    _, vjp = jax.vjp(plain, x, kernel)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk


_conv_f32acc.defvjp(_conv_f32acc_fwd, _conv_f32acc_bwd)


def act_fn(name: Optional[str]):
    """Activation registry (network_utils.py:15-27)."""
    if name is None:
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, LRELU_SLOPE)
    if name == "elu":
        return jax.nn.elu
    if name == "tanh":
        return jnp.tanh
    raise ValueError(f"activation {name!r} not recognized")


def _kernel_init(activation: Optional[str]):
    """Activation-matched init (network_utils.py:140-156)."""
    if activation in ("relu", "lrelu"):
        # he/kaiming uniform; the lrelu slope correction is negligible at 0.02
        return nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
    # xavier uniform (linear / tanh gain ~ 1)
    return nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


class Conv3D(nn.Module):
    """3D conv with replicate ('edge') padding + optional activation.

    Counterpart of ``Conv3DBlock`` (network_utils.py:128-170): padding = k // 2 in
    replicate mode, stride s, no norm (the reference raises on norm for 3D convs).
    Input/output are ``[B, D, H, W, C]``.

    ``zshift_2d=True`` computes a stride-1 conv as ``k`` depth-shifted 2D convs
    accumulated in f32 — mathematically identical, but XLA's conv2d tiling beats its
    conv3d lowering on large grids (tools/profile_stages.py: 7.3ms vs 10.8ms for the
    k3 128->64 conv at 100^3).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    activation: Optional[str] = None
    zshift_2d: bool = False
    s2d_matmul: bool = False  # stride==kernel convs as space-to-depth + one
    # matmul. Exact (parity-tested); measured SLOWER on the bandwidth-limited
    # relay chip (8.2ms vs 5.1ms at 100^3 — the transpose dominates), so it
    # stays off there; on physical TPU the MXU-shaped contraction should win.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        pad = self.kernel_size // 2
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", _kernel_init(self.activation),
            (self.kernel_size,) * 3 + (cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if return_params:
            # fused-kernel path: create the identical param tree (names, shapes,
            # init) but hand the weights to an external fused op instead of
            # convolving here; x supplies only the input channel count
            return kernel, bias

        if (self.s2d_matmul and self.strides == self.kernel_size
                and self.strides > 1 and x.shape[1] % self.strides == 0):
            # With stride == kernel size and replicate pad k//2, windows tile the
            # range [-pad, N-pad) without overlap: front-pad only, drop the unused
            # back padding, space-to-depth, and contract in one MXU matmul.
            k = self.kernel_size
            b, n = x.shape[0], x.shape[1]
            s = n // k
            xp = jnp.pad(x, ((0, 0),) + ((pad, 0),) * 3 + ((0, 0),),
                         mode="edge")[:, :n, :n, :n].astype(self.dtype)
            xp = xp.reshape(b, s, k, s, k, s, k, cin)
            xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                b, s * s * s, k * k * k * cin)
            w = kernel.astype(self.dtype).reshape(k * k * k * cin, self.features)
            y = jnp.einsum("bpk,kf->bpf", xp, w,
                           preferred_element_type=jnp.float32) + bias
            y = y.reshape(b, s, s, s, self.features)
            return act_fn(self.activation)(y.astype(self.dtype))

        if pad:
            x = jnp.pad(
                x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)), mode="edge"
            )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)

        if self.zshift_2d and self.strides == 1 and self.kernel_size > 1:
            b, dp, hp, wp, _ = x.shape
            d_out = dp - 2 * pad
            acc = None
            for dz in range(self.kernel_size):
                sl = x[:, dz:dz + d_out].reshape(b * d_out, hp, wp, cin)
                y = _conv_f32acc(sl, kernel[dz], (1, 1),
                                 ("NHWC", "HWIO", "NHWC"))
                acc = y if acc is None else acc + y
            h_out, w_out = hp - 2 * pad, wp - 2 * pad
            out = (acc + bias).reshape(b, d_out, h_out, w_out, self.features)
            return act_fn(self.activation)(out.astype(self.dtype))

        y = _conv_f32acc(x, kernel, (self.strides,) * 3,
                         ("NDHWC", "DHWIO", "NDHWC"))
        return act_fn(self.activation)((y + bias).astype(self.dtype))


class Conv3DUpsample(nn.Module):
    """conv -> trilinear x``strides`` upsample -> conv (network_utils.py:237-254).

    Trilinear resize with half-pixel centers == torch ``align_corners=False``.

    ``fast=True`` computes the (upsample -> conv) pair with the phase-decomposed
    composition (ops/upsample_conv.py): identical math in the interior, ~4.6x fewer
    FLOPs in an MXU-shaped contraction, approximate at the outermost border voxels.
    """

    features: int
    strides: int
    kernel_size: int = 3
    activation: Optional[str] = None
    fast: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre_only: bool = False):
        """``pre_only=True`` stops after ``conv_in`` and returns
        ``(h, out_kernel, out_bias)`` — the inputs a fused decoder kernel needs
        to synthesize upsampled rows itself (ops/pallas/decoder_head_v3.py).
        The parameter tree is identical either way."""
        from voxactb_tpu.ops.upsample_conv import (
            reference_upsample_conv,
            upsample_conv,
        )

        x = Conv3D(self.features, self.kernel_size, 1, self.activation,
                   dtype=self.dtype, name="conv_in")(x)
        if self.strides <= 1:
            return Conv3D(self.features, self.kernel_size, 1, self.activation,
                          dtype=self.dtype, name="conv_out")(x)

        cin = x.shape[-1]
        kernel = self.param(
            "out_kernel", _kernel_init(self.activation),
            (self.kernel_size,) * 3 + (cin, self.features),
        )
        bias = self.param("out_bias", nn.initializers.zeros, (self.features,))
        if pre_only:
            return x, kernel, bias
        op = upsample_conv if self.fast else reference_upsample_conv
        y = op(x.astype(self.dtype), kernel.astype(self.dtype),
               bias.astype(self.dtype), self.strides)
        return act_fn(self.activation)(y).astype(self.dtype)


class DenseBlock(nn.Module):
    """Linear + optional activation (network_utils.py:257-289)."""

    features: int
    activation: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.features, kernel_init=_kernel_init(self.activation), dtype=self.dtype
        )(x)
        return act_fn(self.activation)(x)


def spatial_softmax_3d(feature: jax.Array, temperature: float = 0.01) -> jax.Array:
    """Per-channel soft-argmax over a cubic 3D feature map (network_utils.py:773-808).

    Input ``[B, D, H, W, C]`` (cube: D == H == W); output ``[B, C * 3]`` laid out as
    per-channel (x, y, z) triplets — the exact flat ordering ``dense0`` consumes in the
    reference, so ported weights stay valid.

    Axis quirk reproduced deliberately: the reference builds its position grids with
    ``np.meshgrid(..., indexing='xy')`` (network_utils.py:782-786), which swaps the
    first two axes, so "expected_x" integrates ``linspace[h_index]`` and "expected_y"
    ``linspace[d_index]``. Harmless for learning, fatal for weight parity if changed.
    """
    b, d, h, w, c = feature.shape
    assert d == h == w, "SpatialSoftmax3D expects a cubic grid"
    flat = feature.reshape(b, d * h * w, c)
    attn = jax.nn.softmax(flat.astype(jnp.float32) / temperature, axis=1)

    lin = jnp.linspace(-1.0, 1.0, d, dtype=jnp.float32)
    pos_x = jnp.broadcast_to(lin[None, :, None], (d, h, w)).reshape(-1)  # lin[h_idx]
    pos_y = jnp.broadcast_to(lin[:, None, None], (d, h, w)).reshape(-1)  # lin[d_idx]
    pos_z = jnp.broadcast_to(lin[None, None, :], (d, h, w)).reshape(-1)  # lin[w_idx]

    # [B, S, C] x [S] -> [B, C] per axis; stack to per-channel (x,y,z) triplets.
    ex = jnp.einsum("bsc,s->bc", attn, pos_x)
    ey = jnp.einsum("bsc,s->bc", attn, pos_y)
    ez = jnp.einsum("bsc,s->bc", attn, pos_z)
    return jnp.stack([ex, ey, ez], axis=-1).reshape(b, c * 3)


def global_max_pool_3d(x: jax.Array) -> jax.Array:
    """[B, D, H, W, C] -> [B, C] (AdaptiveMaxPool3d(1), network_utils/perceiver use)."""
    return jnp.max(x, axis=(1, 2, 3))


def softargmax_stats_3d(feature: jax.Array, temperature: float = 0.01):
    """Fused (spatial soft-argmax, global max): two passes over the input, no
    materialized softmax tensor.

    Numerically identical to ``(spatial_softmax_3d(x), global_max_pool_3d(x))`` but
    restructured for HBM bandwidth: ``spatial_softmax_3d`` materializes the f32
    softmax ``[B, S, C]`` (256 MB at N=100, C=64) and re-reads it three times; here
    the max pass doubles as the global-max pool, and a single ``[B,S,C] x [S,4]``
    contraction (ones | pos_x | pos_y | pos_z) yields the partition function and all
    three expected coordinates in one sweep — the ``exp`` fuses into the dot.

    Returns ``(keypoints [B, C*3] f32, global_max [B, C] f32)`` with the same
    per-channel (x, y, z) triplet layout and meshgrid quirk as spatial_softmax_3d.
    """
    b, d, h, w, c = feature.shape
    assert d == h == w, "softargmax_stats_3d expects a cubic grid"
    s = d * h * w
    flat = feature.reshape(b, s, c).astype(jnp.float32)

    m = jnp.max(flat, axis=1)                       # [B, C]: the global max pool
    e = jnp.exp((flat - m[:, None, :]) / temperature)

    lin = jnp.linspace(-1.0, 1.0, d, dtype=jnp.float32)
    pos_x = jnp.broadcast_to(lin[None, :, None], (d, h, w)).reshape(-1)  # lin[h_idx]
    pos_y = jnp.broadcast_to(lin[:, None, None], (d, h, w)).reshape(-1)  # lin[d_idx]
    pos_z = jnp.broadcast_to(lin[None, None, :], (d, h, w)).reshape(-1)  # lin[w_idx]
    P = jnp.stack([jnp.ones((s,), jnp.float32), pos_x, pos_y, pos_z], axis=-1)

    sums = jnp.einsum("bsc,sk->bck", e, P)          # [B, C, 4]
    kp = sums[..., 1:] / sums[..., 0:1]
    return kp.reshape(b, c * 3), m
