"""Stage-wise latency ablation of the fused act program on the real chip.

Times cumulative pipeline prefixes (each chained 16x on device in one scan, fetch
once) to locate the hotspot: voxelize | +preproc/patchify | +attention | +decoder
trunk | full. Run standalone: python tools/profile_stages.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_CHAIN = 16


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from voxactb_tpu.agents.qfunction import build_encoder
    from voxactb_tpu.config import MethodConfig
    from voxactb_tpu.models.blocks import Conv3D, spatial_softmax_3d, global_max_pool_3d
    from voxactb_tpu.ops.voxelize import voxelize

    cfg = MethodConfig(voxel_sizes=[100], which_arm="right",
                       compute_dtype="bfloat16")
    model = build_encoder(cfg)
    n = 100

    rng = np.random.default_rng(0)
    b, img = 1, 128
    rgbs = jnp.asarray(
        rng.integers(0, 255, (N_CHAIN, 2, b, img, img, 3)).astype(np.float32))
    pcds = jnp.asarray(
        rng.uniform(-0.5, 1.5, (N_CHAIN, 2, b, img, img, 3)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(b, 4)).astype(np.float32))
    lang_goal = jnp.asarray(rng.normal(size=(b, 1024)).astype(np.float32))
    lang_tok = jnp.asarray(rng.normal(size=(b, 77, 512)).astype(np.float32))
    bounds = jnp.asarray([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]], jnp.float32)

    params = model.init(
        jax.random.key(0), jnp.zeros((b, n, n, n, 10)), proprio, lang_goal,
        lang_tok)

    def vox(rgb, pcd):
        coords = pcd.reshape(b, -1, 3)
        feats = ((rgb / 255.0) * 2.0 - 1.0).reshape(b, -1, 3)
        return voxelize(coords, feats, bounds, voxel_size=n)

    def full(rgb, pcd):
        out = model.apply(params, vox(rgb, pcd), proprio, lang_goal, lang_tok)
        return out["trans"].reshape(-1).max() + out["rot_grip"].sum()

    # partial applications of the SAME weights via flax module surgery
    def stage_preproc(rgb, pcd):
        grid = vox(rgb, pcd).astype(jnp.bfloat16)
        d0 = model.bind(params).input_preprocess(grid)
        return d0.astype(jnp.float32).reshape(-1).max()

    def stage_patchify(rgb, pcd):
        grid = vox(rgb, pcd).astype(jnp.bfloat16)
        m = model.bind(params)
        d0 = m.input_preprocess(grid)
        ins = m.patchify(d0)
        return ins.astype(jnp.float32).reshape(-1).max()

    def stage_ss0(rgb, pcd):
        grid = vox(rgb, pcd).astype(jnp.bfloat16)
        m = model.bind(params)
        d0 = m.input_preprocess(grid)
        f = spatial_softmax_3d(d0)
        g = global_max_pool_3d(d0)
        return f.sum() + g.sum()

    stages = {
        "voxelize": lambda rgb, pcd: vox(rgb, pcd).reshape(-1).max(),
        "vox+preproc1x1": stage_preproc,
        "vox+preproc+ss0": stage_ss0,
        "vox+preproc+patchify": stage_patchify,
        "full": full,
    }

    results = {}
    for name, fn in stages.items():
        def chained(rgbs, pcds, fn=fn):
            def step(c, o):
                return c, fn(*o)
            _, ys = jax.lax.scan(step, 0, (rgbs, pcds))
            return ys

        cfn = jax.jit(chained)
        t0 = time.time()
        np.asarray(cfn(rgbs, pcds))  # compile+run
        compile_s = time.time() - t0
        t0 = time.time()
        np.asarray(cfn(rgbs, pcds))
        wall = time.time() - t0
        per_step_ms = wall / N_CHAIN * 1000
        results[name] = round(per_step_ms, 2)
        print(json.dumps({"stage": name, "per_step_ms": per_step_ms,
                          "compile_s": round(compile_s, 1)}), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
