"""Correctness of the fused front kernel (ops/pallas/front_fused.py) against the
XLA reference ops it replaces: ops.voxelize (reference VoxelGrid semantics) ->
1x1x1 preprocess conv + lrelu -> softargmax stats -> k5/s5 patchify conv.

Runs in pallas interpret mode on CPU; the on-chip A/B lives in the bench flow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from voxactb_tpu.ops.voxelize import voxelize

    n, c, p, b = 20, 16, 4096, 2
    rng = np.random.default_rng(7)
    coords = rng.uniform(-0.6, 1.3, (b, p, 3)).astype(np.float32)
    feats = rng.uniform(-1, 1, (b, p, 3)).astype(np.float32)
    bounds = np.array([[-0.5, -0.5, 0.2, 1.2, 1.2, 1.4],
                       [-0.4, -0.6, 0.1, 1.0, 1.1, 1.5]], np.float32)
    w1 = (rng.normal(size=(10, c)) * 0.3).astype(np.float32)
    b1 = (rng.normal(size=(c,)) * 0.1).astype(np.float32)
    wp = (rng.normal(size=(5, 5, 5, c, c)) * 0.05).astype(np.float32)

    grid = voxelize(jnp.asarray(coords), jnp.asarray(feats),
                    jnp.asarray(bounds), voxel_size=n)
    return dict(n=n, c=c, coords=coords, feats=feats, bounds=bounds,
                w1=w1, b1=b1, wp=wp, grid=np.asarray(grid))


def _oracle(setup):
    """d0/stats/patchify via the XLA ops the kernel replaces (bf16 compute)."""
    from voxactb_tpu.models.blocks import softargmax_stats_3d

    n, c = setup["n"], setup["c"]
    x = jnp.asarray(setup["grid"], jnp.bfloat16)
    pre = jnp.einsum("bdhwc,cf->bdhwf", x.astype(jnp.bfloat16),
                     jnp.asarray(setup["w1"], jnp.bfloat16),
                     preferred_element_type=jnp.float32) + setup["b1"]
    d0 = jnp.where(pre >= 0, pre, pre * 0.02).astype(jnp.bfloat16)
    kp, gmax = softargmax_stats_3d(d0)

    # Conv3D stride==kernel s2d semantics: front-pad k//2, drop back padding
    k = 5
    b = d0.shape[0]
    s = n // k
    xp = jnp.pad(d0, ((0, 0),) + ((2, 0),) * 3 + ((0, 0),),
                 mode="edge")[:, :n, :n, :n]
    xp = xp.reshape(b, s, k, s, k, s, k, c)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, s ** 3, k ** 3 * c)
    w = jnp.asarray(setup["wp"], jnp.bfloat16).reshape(k ** 3 * c, c)
    patch_pre = jnp.einsum("bpk,kf->bpf", xp, w,
                           preferred_element_type=jnp.float32)
    return (np.asarray(d0, np.float32), np.asarray(patch_pre).reshape(
        b, s, s, s, c), np.asarray(kp), np.asarray(gmax))


def test_sort_points_by_row_partitions(setup):
    from voxactb_tpu.ops.pallas.front_fused import sort_points_by_row

    n = setup["n"]
    rows, count, overflow = sort_points_by_row(
        jnp.asarray(setup["coords"]), jnp.asarray(setup["feats"]),
        jnp.asarray(setup["bounds"]), voxel_size=n, row_cap=1024)
    rows, count = np.asarray(rows), np.asarray(count)
    assert (np.asarray(overflow) == 0).all()  # 1024 cap fits this cloud
    assert rows.shape[1] == n and count.shape == (2, n)
    # every slot beyond the count is zeroed; counted slots carry real points
    for bi in range(2):
        for t in range(n):
            assert (rows[bi, t, count[bi, t]:] == 0).all()
    # row ids recomputed from the payload agree with the slot row
    occupied = count.sum()
    assert 0 < occupied <= setup["coords"].shape[1] * 2


def test_front_fused_matches_oracle(setup):
    from voxactb_tpu.ops.pallas.front_fused import front_fused

    d0_ref, patch_ref, kp_ref, gmax_ref = _oracle(setup)
    d0, patch, kp, gmax, overflow = front_fused(
        jnp.asarray(setup["coords"]), jnp.asarray(setup["feats"]),
        jnp.asarray(setup["bounds"]), jnp.asarray(setup["w1"]),
        jnp.asarray(setup["b1"]), jnp.asarray(setup["wp"]),
        voxel_size=setup["n"], row_cap=1024, interpret=True)
    assert (np.asarray(overflow) == 0).all()

    np.testing.assert_allclose(np.asarray(d0, np.float32), d0_ref,
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(kp), kp_ref, atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gmax), gmax_ref, atol=2e-2,
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(patch), patch_ref, atol=0.1,
                               rtol=5e-2)


def test_infer_path_front_vs_xla(setup):
    """make_infer_fn with pallas_front (interpret) must reproduce the XLA path's
    actions on the same weights — the end-to-end integration check."""
    from voxactb_tpu.agents.qfunction import make_infer_fn
    from voxactb_tpu.config import MethodConfig

    base = dict(voxel_sizes=[20], which_arm="right", compute_dtype="bfloat16",
                num_latents=16, latent_dim=32, transformer_depth=1)
    cfg_x = MethodConfig(**base)
    cfg_f = MethodConfig(**base, pallas_front=True, pallas_interpret=True)

    model, infer_x = make_infer_fn(cfg_x)
    _, infer_f = make_infer_fn(cfg_f)

    rng = np.random.default_rng(3)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 20, 20, 20, 10)), jnp.zeros((1, 4)),
        jnp.zeros((1, 1024)), jnp.zeros((1, 77, 512)))

    rgbs = (jnp.asarray(rng.integers(0, 255, (1, 32, 32, 3)).astype(np.float32)),)
    pcds = (jnp.asarray(rng.uniform(-0.4, 1.2, (1, 32, 32, 3)).astype(np.float32)),)
    proprio = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    lg = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    lt = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))
    bounds = jnp.asarray([[-0.5, -0.5, 0.2, 1.2, 1.2, 1.4]], jnp.float32)

    out_x = infer_x(params, rgbs, pcds, proprio, lg, lt, bounds)
    out_f = infer_f(params, rgbs, pcds, proprio, lg, lt, bounds)

    assert (np.asarray(out_x.trans_idx) == np.asarray(out_f.trans_idx)).all()
    assert (np.asarray(out_x.rot_grip_idx) == np.asarray(out_f.rot_grip_idx)).all()
    assert (np.asarray(out_x.collision_idx)
            == np.asarray(out_f.collision_idx)).all()
    np.testing.assert_allclose(np.asarray(out_x.continuous_action),
                               np.asarray(out_f.continuous_action),
                               atol=1e-5, rtol=1e-5)


def test_front_fused_empty_and_crop_bounds(setup):
    """No NaNs with clouds entirely outside the bounds (all rows empty)."""
    from voxactb_tpu.ops.pallas.front_fused import front_fused

    coords = np.full((1, 256, 3), 99.0, np.float32)
    feats = np.zeros((1, 256, 3), np.float32)
    d0, patch, kp, gmax, _overflow = front_fused(
        jnp.asarray(coords), jnp.asarray(feats),
        jnp.asarray([[0., 0., 0., 1., 1., 1.]]), jnp.asarray(setup["w1"]),
        jnp.asarray(setup["b1"]), jnp.asarray(setup["wp"]),
        voxel_size=10, row_cap=256, interpret=True)
    for t in (d0, patch, kp, gmax):
        assert np.isfinite(np.asarray(t, np.float32)).all()


def test_front_fused_scatter_matmul_matches_serial(setup):
    """One-hot MXU-matmul scatter must reproduce the serial schedule (exact
    per-term products, f32 sums in a different order) — incl. the gated
    occupancy count and the all-zero masked payload slots."""
    from voxactb_tpu.ops.pallas.front_fused import front_fused

    args = (jnp.asarray(setup["coords"]), jnp.asarray(setup["feats"]),
            jnp.asarray(setup["bounds"]), jnp.asarray(setup["w1"]),
            jnp.asarray(setup["b1"]), jnp.asarray(setup["wp"]))
    out1 = front_fused(*args, voxel_size=setup["n"], row_cap=1024,
                       interpret=True)
    outm = front_fused(*args, voxel_size=setup["n"], row_cap=1024,
                       interpret=True, scatter_matmul=True)
    for a, b, name in zip(out1, outm, ("d0", "patch", "kp", "gmax")):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            atol=2e-2, rtol=2e-2, err_msg=name)


def test_front_fused_scatter_unroll_matches_serial(setup):
    """8-plane unrolled scatter must reproduce the serial schedule (same f32
    sums in a different order) — including the cnt-masked occupancy count."""
    from voxactb_tpu.ops.pallas.front_fused import front_fused

    args = (jnp.asarray(setup["coords"]), jnp.asarray(setup["feats"]),
            jnp.asarray(setup["bounds"]), jnp.asarray(setup["w1"]),
            jnp.asarray(setup["b1"]), jnp.asarray(setup["wp"]))
    out1 = front_fused(*args, voxel_size=setup["n"], row_cap=1024,
                       interpret=True)
    out8 = front_fused(*args, voxel_size=setup["n"], row_cap=1024,
                       interpret=True, scatter_unroll=8)
    for a, b, name in zip(out1, out8, ("d0", "patch", "kp", "gmax")):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            atol=2e-2, rtol=2e-2, err_msg=name)


def test_front_fused_row_cap_overflow_detected(setup):
    """A pathologically clustered cloud (every point in one grid-dim0 row —
    the VLM-crop regime where all depth pixels land on one close object) must
    be DETECTED via the overflow output, not silently dropped. The XLA scatter
    keeps all points (voxel_grid.py:106-127); the fused kernel's row payload
    is capped, so the guard is the parity signal."""
    from voxactb_tpu.ops.pallas.front_fused import front_fused, sort_points_by_row

    p = 512
    rng = np.random.default_rng(11)
    # all points inside ONE voxel row (x fixed mid-bounds), cap 64 -> 448 drop
    coords = np.concatenate([
        np.full((1, p, 1), 0.55, np.float32),
        rng.uniform(0.0, 1.0, (1, p, 2)).astype(np.float32)], -1)
    feats = rng.uniform(-1, 1, (1, p, 3)).astype(np.float32)
    bounds = jnp.asarray([[0., 0., 0., 1., 1., 1.]])

    _, counts, overflow = sort_points_by_row(
        jnp.asarray(coords), jnp.asarray(feats), bounds, voxel_size=10,
        row_cap=64)
    assert int(np.asarray(overflow)[0]) == p - 64
    assert int(np.asarray(counts).max()) == 64

    *_, overflow2 = front_fused(
        jnp.asarray(coords), jnp.asarray(feats), bounds,
        jnp.asarray(setup["w1"]), jnp.asarray(setup["b1"]),
        jnp.asarray(setup["wp"]), voxel_size=10, row_cap=64, interpret=True)
    assert int(np.asarray(overflow2)[0]) == p - 64

    # ... and a cap that FITS the cloud reports zero
    *_, overflow3 = front_fused(
        jnp.asarray(coords), jnp.asarray(feats), bounds,
        jnp.asarray(setup["w1"]), jnp.asarray(setup["b1"]),
        jnp.asarray(setup["wp"]), voxel_size=10, row_cap=512, interpret=True)
    assert int(np.asarray(overflow3)[0]) == 0
