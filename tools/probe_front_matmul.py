"""Paired act-chain A/B: serial-unroll8 front scatter vs one-hot MXU-matmul.

Both variants run the round-4 bench defaults otherwise (pallas front + decoder
v2 + flash attention). Alternates inside one process (the relay jitters ~40%
across processes), median of 3 fetches, and asserts the two schedules decode
the same 9-dof actions. Also isolates the front stage itself (front_fused
only, chained) so the win is attributable. Decision data for the
BENCH_FRONT_MATMUL default.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_CHAIN = {1: 16, 8: 4}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench
    from voxactb_tpu.config import MethodConfig

    def cfg(n, matmul):
        return MethodConfig(
            voxel_sizes=[n], which_arm="right", compute_dtype="bfloat16",
            zshift_conv3d=True, pallas_decoder=True, pallas_encoder=True,
            pallas_front=True, pallas_attention=True,
            front_scatter_unroll=1 if matmul else 8,
            front_scatter_matmul=matmul)

    results = {}

    # --- front-stage isolation: the kernel alone, chained on device ---
    from voxactb_tpu.ops.pallas.front_fused import front_fused

    def front_stage(n, batch, matmul, reps=3, chain=8):
        rng = np.random.default_rng(0)
        p = 2 * 128 * 128
        coords = jnp.asarray(rng.uniform(
            -0.5, 1.5, (chain, batch, p, 3)).astype(np.float32))
        feats = jnp.asarray(rng.uniform(
            -1, 1, (chain, batch, p, 3)).astype(np.float32))
        bounds = jnp.asarray([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]] * batch,
                             jnp.float32)
        c = 128
        w1 = jnp.asarray(rng.normal(size=(10, c)).astype(np.float32) * 0.3)
        b1 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        wp = jnp.asarray(rng.normal(size=(5, 5, 5, c, c)).astype(np.float32)
                         * 0.05)

        @jax.jit
        def chained(coords, feats):
            def one(carry, obs):
                co, fe = obs
                d0, patch, kp, gmax, _ovf = front_fused(
                    co, fe, bounds, w1, b1, wp, voxel_size=n,
                    scatter_unroll=1 if matmul else 8,
                    scatter_matmul=matmul)
                # fold d0 so its write can't be DCE'd; return small tensors
                return carry, (jnp.sum(d0[..., 0].astype(jnp.float32)),
                               patch.sum(), kp.sum(), gmax.sum())
            return jax.lax.scan(one, 0, (coords, feats))[1]

        out = jax.tree.map(np.asarray, chained(coords, feats))  # compile+warm
        assert all(np.isfinite(np.asarray(o)).all() for o in out)
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.tree.map(np.asarray, chained(coords, feats))
            walls.append(time.perf_counter() - t0)
        return sorted(walls)[len(walls) // 2] / chain / batch * 1e3

    for n, batch in ((100, 1), (100, 8), (50, 1)):
        row = {}
        for name, matmul in (("serial8", False), ("matmul", True)):
            try:
                row[name] = round(front_stage(n, batch, matmul), 2)
            except Exception as e:  # Mosaic may reject a layout — record it
                row[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            print(json.dumps({"front_stage": f"n{n}_b{batch}", **row}),
                  flush=True)
        results[f"front_n{n}_b{batch}"] = row

    # --- full act chain (bench program) ---
    for n, batch in ((100, 1), (100, 8), (50, 1)):
        nc = N_CHAIN[batch] if n == 100 else 16
        old = bench.N_CHAIN
        bench.N_CHAIN = nc
        try:
            chains = {}
            actions = {}
            for name, matmul in (("serial8", False), ("matmul", True)):
                try:
                    chained, rgbs, pcds = bench.build_chain(
                        cfg(n, matmul), batch)
                    acts = np.asarray(chained(rgbs, pcds))
                    assert np.isfinite(acts).all()
                    chains[name] = (chained, rgbs, pcds)
                    actions[name] = acts
                    print(json.dumps({"compiled": name, "n": n,
                                      "batch": batch}), flush=True)
                except Exception as e:
                    print(json.dumps({"compile_fail": name, "n": n,
                                      "batch": batch,
                                      "err": f"{type(e).__name__}: "
                                             f"{str(e)[:200]}"}), flush=True)
            if len(actions) == 2:
                a, b = actions["serial8"], actions["matmul"]
                if not np.allclose(a, b, atol=1e-5):
                    bad = int((~np.isclose(a, b, atol=1e-5)).sum())
                    print(json.dumps({"action_mismatch": f"n{n}_b{batch}",
                                      "elements": bad}), flush=True)
            walls = {name: [] for name in chains}
            for _ in range(3):
                for name, (chained, rgbs, pcds) in chains.items():
                    t0 = time.perf_counter()
                    np.asarray(chained(rgbs, pcds))
                    walls[name].append(time.perf_counter() - t0)
            key = f"act_n{n}_b{batch}"
            results[key] = {
                name: round(sorted(w)[1] / nc / batch * 1e3, 2)
                for name, w in walls.items()}
            print(json.dumps({key: results[key]}), flush=True)
        finally:
            bench.N_CHAIN = old

    print(json.dumps({"all": results}), flush=True)


if __name__ == "__main__":
    main()
