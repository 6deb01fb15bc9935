"""Phase-decomposed upsample+conv vs the exact resize+conv reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from voxactb_tpu.ops.upsample_conv import (
    reference_upsample_conv,
    upsample_conv,
)


def test_interior_exactness(rng):
    b, d, cin, cout, k, s = 1, 6, 4, 3, 5, 5
    x = jnp.asarray(rng.normal(size=(b, d, d, d, cin)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(k, k, k, cin, cout)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    fast = np.asarray(upsample_conv(x, kernel, bias, s))
    exact = np.asarray(reference_upsample_conv(x, kernel, bias, s))
    assert fast.shape == exact.shape == (b, d * s, d * s, d * s, cout)

    # interior (>= 2+s voxels from each face covers all boundary effects)
    m = s + 2
    np.testing.assert_allclose(
        fast[:, m:-m, m:-m, m:-m], exact[:, m:-m, m:-m, m:-m], atol=2e-4)


def test_border_close(rng):
    """Borders differ only by the clamp-granularity approximation — small."""
    b, d, cin, cout, s = 1, 4, 2, 2, 5
    x = jnp.asarray(rng.normal(size=(b, d, d, d, cin)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(5, 5, 5, cin, cout)).astype(np.float32) * 0.1)
    bias = jnp.zeros((cout,), jnp.float32)
    fast = np.asarray(upsample_conv(x, kernel, bias, s))
    exact = np.asarray(reference_upsample_conv(x, kernel, bias, s))
    denom = np.abs(exact).mean() + 1e-6
    rel = np.abs(fast - exact).max() / denom
    assert rel < 0.5, rel  # same scale; borders approximate, not wild


def test_grad_flows(rng):
    b, d, cin, cout, s = 1, 4, 2, 2, 5
    x = jnp.asarray(rng.normal(size=(b, d, d, d, cin)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(5, 5, 5, cin, cout)).astype(np.float32) * 0.1)
    bias = jnp.zeros((cout,), jnp.float32)
    g = jax.grad(lambda k: jnp.sum(upsample_conv(x, k, bias, s) ** 2))(kernel)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_small_scale_falls_back_to_exact(rng):
    """Regression: scale=2 with k=5 reaches beyond the +-1 neighbor cell and
    the phase tap matrix clamps it (interior err 0.46) — the fast path must
    route such scales through the exact resize+conv instead."""
    b, d, cin, cout, s = 1, 5, 2, 2, 2
    x = jnp.asarray(rng.normal(size=(b, d, d, d, cin)).astype(np.float32))
    kernel = jnp.asarray(
        rng.normal(size=(5, 5, 5, cin, cout)).astype(np.float32) * 0.1)
    bias = jnp.zeros((cout,), jnp.float32)
    fast = np.asarray(upsample_conv(x, kernel, bias, s))
    exact = np.asarray(reference_upsample_conv(x, kernel, bias, s))
    np.testing.assert_allclose(fast, exact, atol=1e-5)
