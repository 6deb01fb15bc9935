"""Torch-oracle parity: our blocks vs the exact torch ops the reference uses.

The reference computes with torch Conv3d (padding_mode='replicate'), trilinear
``nn.Upsample(align_corners=False)``, LayerNorm, and the CLIP text transformer.
torch (CPU) is available in this image, so these tests pin our kernels to the exact
torch semantics — the "weight-exact parity" risks SURVEY §7 calls out.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from voxactb_tpu.models.blocks import Conv3D  # noqa: E402
from voxactb_tpu.ops.upsample_conv import reference_upsample_conv  # noqa: E402


def test_conv3d_replicate_padding_matches_torch(rng):
    b, d, cin, cout, k = 1, 7, 3, 5, 3
    x = rng.normal(size=(b, d, d, d, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, k, cin, cout)).astype(np.float32) * 0.2
    bias = rng.normal(size=(cout,)).astype(np.float32)

    m = Conv3D(cout, k, 1, activation=None)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(bias)}}
    ours = np.asarray(m.apply(params, jnp.asarray(x)))

    tconv = torch.nn.Conv3d(cin, cout, k, padding=k // 2,
                            padding_mode="replicate")
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(4, 3, 0, 1, 2)))
        tconv.bias.copy_(torch.from_numpy(bias))
        ref = tconv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_strided_conv3d_matches_torch(rng):
    """The patchify conv: k=5, s=5, replicate pad 2 (perceiver_lang_io.py:223-226)."""
    b, d, cin, cout = 1, 10, 4, 6
    x = rng.normal(size=(b, d, d, d, cin)).astype(np.float32)
    w = rng.normal(size=(5, 5, 5, cin, cout)).astype(np.float32) * 0.1
    bias = np.zeros(cout, np.float32)

    m = Conv3D(cout, 5, 5, activation=None)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(bias)}}
    ours = np.asarray(m.apply(params, jnp.asarray(x)))

    tconv = torch.nn.Conv3d(cin, cout, 5, stride=5, padding=2,
                            padding_mode="replicate")
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(4, 3, 0, 1, 2)))
        tconv.bias.zero_()
        ref = tconv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)
    assert ours.shape == ref.shape == (1, 2, 2, 2, cout)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_trilinear_upsample_matches_torch(rng):
    """jax.image trilinear resize == nn.Upsample(align_corners=False)
    (network_utils.py:245-247)."""
    x = rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32)
    up = jax.image.resize(jnp.asarray(x), (1, 20, 20, 20, 3), "trilinear")
    tref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), scale_factor=5,
        mode="trilinear", align_corners=False)
    tref = tref.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(up), tref, atol=1e-5)


def test_upsample_conv_reference_path_matches_torch(rng):
    """resize + replicate-pad conv chain == torch Upsample + Conv3d chain."""
    b, d, cin, cout, s, k = 1, 4, 2, 3, 5, 5
    x = rng.normal(size=(b, d, d, d, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, k, cin, cout)).astype(np.float32) * 0.1
    bias = rng.normal(size=(cout,)).astype(np.float32)

    ours = np.asarray(reference_upsample_conv(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), s))

    tconv = torch.nn.Conv3d(cin, cout, k, padding=k // 2,
                            padding_mode="replicate")
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(4, 3, 0, 1, 2)))
        tconv.bias.copy_(torch.from_numpy(bias))
        tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        tx = torch.nn.functional.interpolate(
            tx, scale_factor=s, mode="trilinear", align_corners=False)
        ref = tconv(tx).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_spatial_softmax_matches_torch_reference_semantics(rng):
    """Our channels-last spatial softmax == the reference's channel-first math
    (network_utils.py:773-808 reimplemented in torch as the oracle)."""
    from voxactb_tpu.models.blocks import spatial_softmax_3d

    n, c = 6, 5
    x = rng.normal(size=(1, n, n, n, c)).astype(np.float32)
    ours = np.asarray(spatial_softmax_3d(jnp.asarray(x))).reshape(c, 3)

    # torch oracle following the reference exactly
    t = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # [1, C, D, H, W]
    feat = t.reshape(-1, n * n * n)
    attn = torch.nn.functional.softmax(feat / 0.01, dim=-1)
    px, py, pz = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                             np.linspace(-1, 1, n))
    ex = (torch.from_numpy(px.reshape(-1)).float() * attn).sum(1)
    ey = (torch.from_numpy(py.reshape(-1)).float() * attn).sum(1)
    ez = (torch.from_numpy(pz.reshape(-1)).float() * attn).sum(1)
    ref = torch.stack([ex, ey, ez], 1).reshape(-1, c * 3).numpy().reshape(c, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_zshift_decomposition_matches_plain_conv(rng):
    """zshift_2d path == plain conv3d path on the same kernel."""
    b, d, cin, cout = 1, 6, 4, 3
    x = rng.normal(size=(b, d, d, d, cin)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.2
    bias = rng.normal(size=(cout,)).astype(np.float32)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(bias)}}
    plain = np.asarray(Conv3D(cout, 3, 1).apply(params, jnp.asarray(x)))
    fast = np.asarray(Conv3D(cout, 3, 1, zshift_2d=True).apply(
        params, jnp.asarray(x)))
    np.testing.assert_allclose(fast, plain, atol=2e-5)


def test_s2d_matmul_patchify_matches_plain_conv(rng):
    """space-to-depth matmul path == plain strided conv (k == stride, replicate pad)."""
    b, n, cin, cout, k = 1, 20, 6, 8, 5
    x = rng.normal(size=(b, n, n, n, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, k, cin, cout)).astype(np.float32) * 0.1
    bias = rng.normal(size=(cout,)).astype(np.float32)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(bias)}}
    plain = np.asarray(Conv3D(cout, k, k).apply(params, jnp.asarray(x)))
    fast = np.asarray(Conv3D(cout, k, k, s2d_matmul=True).apply(
        params, jnp.asarray(x)))
    assert fast.shape == plain.shape == (b, 4, 4, 4, cout)
    np.testing.assert_allclose(fast, plain, atol=3e-5)
