"""Paired on-chip A/B of decoder_head v1 vs v2 at the canonical operating point.

Both variants run alternately in ONE process (relay jitter makes cross-process
comparisons untrustworthy); prints per-variant medians. Run AFTER any bench
finishes — never overlap TPU processes.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxactb_tpu.ops.pallas.decoder_head import decoder_head
    from voxactb_tpu.ops.pallas.decoder_head_v2 import decoder_head_v2

    rng = np.random.default_rng(0)
    n, c, t_heads, chain = 100, 64, 1, 16
    d0s = jnp.asarray(rng.normal(size=(chain, 1, n, n, n, c)).astype(np.float32),
                      jnp.bfloat16)
    u0s = jnp.asarray(rng.normal(size=(chain, 1, n, n, n, c)).astype(np.float32),
                      jnp.bfloat16)
    wf = jnp.asarray((rng.normal(size=(3, 3, 3, 2 * c, c)) * .05).astype(np.float32))
    bf = jnp.asarray(np.zeros(c, np.float32))
    wt = jnp.asarray((rng.normal(size=(t_heads, 3, 3, 3, c, 1)) * .05)
                     .astype(np.float32))
    bt = jnp.asarray(np.zeros(t_heads, np.float32))

    def chained(fn):
        def run(d0s, u0s):
            def step(carry, xs):
                d0, u0 = xs
                tr, kp, gm = fn(d0, u0, wf, bf, wt, bt)
                return carry, (jnp.sum(tr) + jnp.sum(kp) + jnp.sum(gm))
            return jax.lax.scan(step, 0, (d0s, u0s))[1]
        return jax.jit(run)

    runs = {"v1": chained(decoder_head), "v2": chained(decoder_head_v2)}
    for name, fn in runs.items():
        t0 = time.time()
        np.asarray(fn(d0s, u0s))
        print(f"{name} compile {time.time()-t0:.1f}s", flush=True)

    results = {k: [] for k in runs}
    for rep in range(5):
        for name, fn in runs.items():
            t0 = time.time()
            out = np.asarray(fn(d0s, u0s))
            results[name].append((time.time() - t0) / chain * 1000)
            assert np.isfinite(out).all()
    print(json.dumps({k: round(sorted(v)[len(v) // 2], 2)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
