"""Quick per-stage latency probe for the decoder hot path (subset of profile_stages).

Each stage is chained 8x in a scan and fetched once. Prints one JSON line per stage
as it completes so partial runs still yield data. Run: python tools/profile_quick.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_CHAIN = 8
N = 100


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from voxactb_tpu.models.blocks import spatial_softmax_3d
    from voxactb_tpu.ops.upsample_conv import upsample_conv
    from voxactb_tpu.ops.voxelize import voxelize

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    d0 = jnp.asarray(rng.normal(size=(N_CHAIN, 1, N, N, N, 64)).astype(
        np.float32), bf)
    cat128 = jnp.asarray(rng.normal(size=(N_CHAIN, 1, N, N, N, 128)).astype(
        np.float32), bf)
    small = jnp.asarray(rng.normal(size=(N_CHAIN, 1, 20, 20, 20, 128)).astype(
        np.float32), bf)
    k3 = jnp.asarray(rng.normal(size=(3, 3, 3, 128, 64)).astype(np.float32) * .1, bf)
    k3_1 = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 1)).astype(np.float32) * .1, bf)
    k5up = jnp.asarray(rng.normal(size=(5, 5, 5, 128, 64)).astype(np.float32) * .1, bf)
    bias64 = jnp.zeros((64,), bf)
    pts = jnp.asarray(rng.uniform(-0.5, 1.5, (N_CHAIN, 1, 32768, 3)).astype(
        np.float32))
    ptf = jnp.asarray(rng.uniform(-1, 1, (N_CHAIN, 1, 32768, 3)).astype(
        np.float32))
    vox_bounds = jnp.asarray([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]], jnp.float32)

    def conv3d_as_2d_zshift(x, k):
        b, d, h, w, cin = x.shape
        cout = k.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")
        acc = None
        for dz in range(3):
            sl = xp[:, dz:dz + d].reshape(b * d, h + 2, w + 2, cin)
            y = jax.lax.conv_general_dilated(
                sl, k[dz], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return acc.reshape(b, d, h, w, cout).astype(bf)

    # attention trunk at the real operating point: cross-attn(2048 latents over
    # 8077 tokens) + 6 self-attn+ff + decoder cross-attn back to the sequence
    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    trunk = PerceiverVoxelLangEncoder(
        depth=6, voxel_size=N, initial_dim=10, low_dim_size=4,
        num_latents=2048, latent_dim=512, im_channels=64, final_dim=64,
        input_dropout=0.0, attn_dropout=0.0, decoder_dropout=0.0,
        dtype=bf, zshift_conv3d=True,
    )
    grid10 = jnp.asarray(rng.normal(size=(1, N, N, N, 10)).astype(np.float32))
    pro = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    lg = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    lt = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))
    trunk_params = jax.jit(trunk.init)(jax.random.key(0), grid10, pro, lg, lt)
    grids = jnp.asarray(rng.normal(
        size=(N_CHAIN, 1, N, N, N, 10)).astype(np.float32))

    stages = {
        "full_qforward@100": (
            grids, lambda g: trunk.apply(trunk_params, g, pro, lg, lt)),
        "preprocess_1x1_10->64@100": (
            grids, lambda g: jnp.einsum(
                "bdhwc,cf->bdhwf", g.astype(bf), k3[0, 0, 0, :10, :]).astype(bf)),
        "voxelize_32k->100^3": (
            (pts, ptf),
            lambda xs: voxelize(xs[0], xs[1], vox_bounds, voxel_size=100)),
        "ss0_softmax64@100": (d0, spatial_softmax_3d),
        "final_k3_as_2d@100": (cat128, lambda x: conv3d_as_2d_zshift(x, k3)),
        "trans_k3_64->1@100": (d0, lambda x: conv3d_as_2d_zshift(x, k3_1)),
        "fused_upsample20->100": (small, lambda x: upsample_conv(
            x, k5up, bias64, 5)),
    }

    for name, (inp, fn) in stages.items():
        def chained(xs, f=fn):
            def step(c, x):
                y = f(x)
                tot = sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree_util.tree_leaves(y))
                return c, tot
            _, ys = jax.lax.scan(step, 0, xs)
            return ys

        cfn = jax.jit(chained)
        t0 = time.time()
        np.asarray(cfn(inp))
        compile_s = time.time() - t0
        t0 = time.time()
        np.asarray(cfn(inp))
        per_step_ms = (time.time() - t0) / N_CHAIN * 1000
        print(json.dumps({"stage": name, "per_step_ms": round(per_step_ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
