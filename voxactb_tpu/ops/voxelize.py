"""Point-cloud -> dense voxel-feature-grid scatter-mean encoder, as one jitted XLA program.

Behavioral parity target: ``VoxelGrid.coords_to_bounding_voxel_grid``
(peract/voxel/voxel_grid.py:148-198). The reference materializes a flat
``B*(N+2)^3*C`` buffer and runs two ``scatter_add_`` passes (values + counts) plus a
divide on CUDA-via-torch. Here the whole thing is a single functional jnp program:

- one fused scatter-add of ``concat([xyz, features, 1])`` accumulates sums and counts
  together (the trailing ones-channel IS the count);
- the +2 edge-crop trick, per-sample dynamic ``coord_bounds`` (how VLM cropping enters the
  grid — voxel_grid.py:152-157), occupancy bit, and normalized voxel-index channels are
  reproduced exactly;
- output is channels-LAST ``[B, N, N, N, 3+F+3+1]`` (TPU-native layout; the reference
  permutes to channels-first for cuDNN, which we never need).

Grid semantics (voxel_grid.py:150-163): ``res = range/(N+eps)``; points are binned with
``floor((p - (mins - res)) / (res + eps))`` into an (N+2)^3 grid whose one-voxel border
collects out-of-bounds points, then the border is cropped off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MIN_DENOMINATOR = 1e-12


def _index_grid(voxel_size: int, dtype=jnp.float32) -> jax.Array:
    """[N, N, N, 3] grid of voxel coordinates 0..N-1 (voxel_grid.py:86-93,197)."""
    r = jnp.arange(voxel_size, dtype=dtype)
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1)


@functools.partial(jax.jit, static_argnames=("voxel_size",))
def voxelize(
    coords: jax.Array,
    coord_features: jax.Array,
    coord_bounds: jax.Array,
    *,
    voxel_size: int,
) -> jax.Array:
    """Scatter-mean point features into a dense bounded voxel grid.

    Args:
      coords: ``[B, P, 3]`` world-frame points (flattened multi-camera point clouds).
      coord_features: ``[B, P, F]`` per-point features (RGB in [-1, 1] for VoxAct-B).
      coord_bounds: ``[B, 6]`` or ``[1, 6]`` metric bounds ``[x0,y0,z0,x1,y1,z1]``. A
        runtime tensor — per-episode VLM crops and per-sample replay bounds flow through
        here without recompilation.
      voxel_size: N, static. The internal scatter grid is (N+2)^3 and the border is
        cropped, matching the reference's "+2 because we crop the edges"
        (voxel_grid.py:30-32).

    Returns:
      ``[B, N, N, N, 3 + F + 3 + 1]`` float32, channels last:
      mean xyz (3) | mean features (F) | voxel index / N (3) | occupancy (1).
    """
    b, p, _ = coords.shape
    f = coord_features.shape[-1]
    n = voxel_size
    dims = n + 2

    coord_bounds = jnp.broadcast_to(coord_bounds, (b, 6)).astype(jnp.float32)
    bb_mins = coord_bounds[:, None, 0:3]
    bb_ranges = coord_bounds[:, None, 3:6] - bb_mins
    res = bb_ranges / (float(n) + MIN_DENOMINATOR)
    denom = res + MIN_DENOMINATOR

    # Bin points; the shifted-min maps in-bounds points to 1..N and the borders catch
    # everything else (voxel_grid.py:159-163).
    bb_mins_shifted = bb_mins - res
    idx = jnp.floor((coords - bb_mins_shifted) / denom).astype(jnp.int32)
    idx = jnp.clip(idx, 0, dims - 1)
    flat_idx = (idx[..., 0] * dims + idx[..., 1]) * dims + idx[..., 2]  # [B, P]

    # One scatter accumulates value sums and point counts together: the ones channel is
    # the count (the reference runs a second scatter of ones — voxel_grid.py:116-118).
    vals = jnp.concatenate(
        [coords, coord_features.astype(jnp.float32), jnp.ones((b, p, 1), jnp.float32)],
        axis=-1,
    )  # [B, P, 3+F+1]

    def scatter_one(fi, v):
        return jnp.zeros((dims * dims * dims, 3 + f + 1), jnp.float32).at[fi].add(v)

    scattered = jax.vmap(scatter_one)(flat_idx, vals)  # [B, dims^3, 3+F+1]
    count = scattered[..., -1:]
    mean = scattered / jnp.maximum(count, 1.0)

    grid = mean.reshape(b, dims, dims, dims, 3 + f + 1)
    grid = grid[:, 1:-1, 1:-1, 1:-1]  # crop the border (voxel_grid.py:184)

    occupancy = (grid[..., -1:] > 0).astype(jnp.float32)
    index_feat = jnp.broadcast_to(
        _index_grid(n)[None] / float(n), (b, n, n, n, 3)
    )
    return jnp.concatenate([grid[..., :-1], index_feat, occupancy], axis=-1)


def flatten_camera_observations(rgbs, pcds):
    """Flatten per-camera ``[B, H, W, 3]`` rgb/point-cloud tensors to scatter inputs.

    The reference does this inside ``QFunction.forward`` with channel-first permutes
    (qattention_peract_bc_agent.py:86-93); channels-last in, channels-last out here.

    Returns ``(coords [B, P, 3], features [B, P, 3])`` with ``P = sum(H_i * W_i)``.
    """
    b = rgbs[0].shape[0]
    coords = jnp.concatenate([p.reshape(b, -1, 3) for p in pcds], axis=1)
    feats = jnp.concatenate([r.reshape(b, -1, r.shape[-1]) for r in rgbs], axis=1)
    return coords, feats
