"""decoder_head_v2 (no-staging schedule) must reproduce decoder_head exactly."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.parametrize("t_heads", [1, 2])
def test_v2_matches_v1(rng, t_heads):
    from voxactb_tpu.ops.pallas.decoder_head import decoder_head
    from voxactb_tpu.ops.pallas.decoder_head_v2 import decoder_head_v2

    n, c, b = 20, 16, 2
    d0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32),
                     jnp.bfloat16)
    u0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32),
                     jnp.bfloat16)
    wf = jnp.asarray((rng.normal(size=(3, 3, 3, 2 * c, c)) * 0.1)
                     .astype(np.float32))
    bf = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(t_heads, 3, 3, 3, c, 1)) * 0.1)
                     .astype(np.float32))
    bt = jnp.asarray((rng.normal(size=(t_heads,)) * 0.1).astype(np.float32))

    t1, kp1, g1 = decoder_head(d0, u0, wf, bf, wt, bt, interpret=True)
    t2, kp2, g2 = decoder_head_v2(d0, u0, wf, bf, wt, bt, interpret=True)

    # v2's 9-dot accumulation order actually lands CLOSER to the f32 conv
    # oracle than v1's wide-K dots (1.8e-4 vs 2.7e-3 max at this config);
    # the kernels differ from each other by v1's rounding
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kp2), np.asarray(kp1),
                               atol=1e-3, rtol=1e-3)
    # argmax exactness across the Q field (the action-level contract)
    assert (np.asarray(t2).reshape(b, -1).argmax(-1)
            == np.asarray(t1).reshape(b, -1).argmax(-1)).all()


@pytest.mark.parametrize("t_heads", [1, 2])
def test_v2c_matches_v2(rng, t_heads):
    """v2c (K-concat z-accumulation) vs v2 — same dot operands per output
    element modulo MXU summation order, so tight tolerances."""
    from voxactb_tpu.ops.pallas.decoder_head_v2 import decoder_head_v2
    from voxactb_tpu.ops.pallas.decoder_head_v2c import decoder_head_v2c

    n, c, b = 20, 16, 2
    d0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32),
                     jnp.bfloat16)
    u0 = jnp.asarray(rng.normal(size=(b, n, n, n, c)).astype(np.float32),
                     jnp.bfloat16)
    wf = jnp.asarray((rng.normal(size=(3, 3, 3, 2 * c, c)) * 0.1)
                     .astype(np.float32))
    bf = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(t_heads, 3, 3, 3, c, 1)) * 0.1)
                     .astype(np.float32))
    bt = jnp.asarray((rng.normal(size=(t_heads,)) * 0.1).astype(np.float32))

    t2, kp2, g2 = decoder_head_v2(d0, u0, wf, bf, wt, bt, interpret=True)
    t3, kp3, g3 = decoder_head_v2c(d0, u0, wf, bf, wt, bt, interpret=True)

    np.testing.assert_allclose(np.asarray(t3), np.asarray(t2),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kp3), np.asarray(kp2),
                               atol=1e-3, rtol=1e-3)
    assert (np.asarray(t3).reshape(b, -1).argmax(-1)
            == np.asarray(t2).reshape(b, -1).argmax(-1)).all()
