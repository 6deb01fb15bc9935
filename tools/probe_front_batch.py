"""Paired on-chip probe: front kernel vs XLA front at 50^3/100^3 and batch 1/8.

Answers three round-3 questions in ONE process (relay jitter):
  1. why crop50 regressed with pallas_front ON (kernel vs sort-pre-pass cost at 50^3);
  2. whether the front kernel scales with batch (suspect: serial per-point scatter
     multiplied by the sequential batch grid dim);
  3. the decoder tail's batch scaling (v2 @ batch 8).
Run AFTER any bench finishes — never overlap TPU processes.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHAIN = 16


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxactb_tpu.ops.pallas.front_fused import front_fused, sort_points_by_row
    from voxactb_tpu.ops.pallas.decoder_head_v2 import decoder_head_v2
    from voxactb_tpu.ops.voxelize import voxelize

    rng = np.random.default_rng(0)
    bounds = jnp.asarray([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]], jnp.float32)

    def make_pts(b):
        pts = jnp.asarray(rng.uniform(-0.5, 1.5, (CHAIN, b, 32768, 3))
                          .astype(np.float32))
        ptf = jnp.asarray(rng.uniform(-1, 1, (CHAIN, b, 32768, 3))
                          .astype(np.float32))
        return pts, ptf

    def timed(name, fn, *args):
        def chained(*xs):
            def step(c, x):
                y = fn(*x)
                tot = sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree_util.tree_leaves(y))
                return c, tot
            return jax.lax.scan(step, 0, xs)[1]
        cfn = jax.jit(chained)
        t0 = time.time()
        out = np.asarray(cfn(*args))
        compile_s = time.time() - t0
        assert np.isfinite(out).all(), name
        walls = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(cfn(*args))
            walls.append((time.time() - t0) / CHAIN * 1000)
        ms = sorted(walls)[1]
        print(json.dumps({"stage": name, "per_step_ms": round(ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return ms

    results = {}
    for n in (50, 100):
        c = 64
        w1 = jnp.asarray(rng.normal(size=(10, c)).astype(np.float32) * .1)
        b1 = jnp.zeros((c,), jnp.float32)
        wp = jnp.asarray(rng.normal(size=(5, 5, 5, c, c)).astype(np.float32) * .05)
        for b in ((1, 8) if n == 100 else (1,)):
            pts, ptf = make_pts(b)
            bb = jnp.broadcast_to(bounds, (b, 6))
            results[f"front_fused@{n}_b{b}"] = timed(
                f"front_fused@{n}_b{b}",
                lambda p, f, n=n, w1=w1, b1=b1, wp=wp, bb=bb: front_fused(
                    p, f, bb, w1, b1, wp, voxel_size=n), pts, ptf)
            results[f"sort_prepass@{n}_b{b}"] = timed(
                f"sort_prepass@{n}_b{b}",
                lambda p, f, n=n, bb=bb: sort_points_by_row(
                    p, f, bb, voxel_size=n), pts, ptf)
            results[f"voxelize_xla@{n}_b{b}"] = timed(
                f"voxelize_xla@{n}_b{b}",
                lambda p, f, n=n, bb=bb: voxelize(p, f, bb, voxel_size=n),
                pts, ptf)

    # decoder v2 batch scaling
    for b in (1, 8):
        n, c = 100, 64
        d0s = jnp.asarray(rng.normal(size=(CHAIN, b, n, n, n, c))
                          .astype(np.float32), jnp.bfloat16)
        u0s = jnp.asarray(rng.normal(size=(CHAIN, b, n, n, n, c))
                          .astype(np.float32), jnp.bfloat16)
        wf = jnp.asarray((rng.normal(size=(3, 3, 3, 2 * c, c)) * .05)
                         .astype(np.float32))
        bf_ = jnp.zeros((c,), jnp.float32)
        wt = jnp.asarray((rng.normal(size=(1, 3, 3, 3, c, 1)) * .05)
                         .astype(np.float32))
        bt = jnp.zeros((1,), jnp.float32)
        results[f"decoder_v2@100_b{b}"] = timed(
            f"decoder_v2@100_b{b}",
            lambda d, u: decoder_head_v2(d, u, wf, bf_, wt, bt), d0s, u0s)

    print(json.dumps({"all": {k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
