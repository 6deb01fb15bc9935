"""Measure achievable HBM bandwidth and MXU throughput on this chip/tunnel."""

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

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    # bandwidth probe: aligned [16, 1024, 1024, 64] bf16 slices (128MB each)
    big = jnp.asarray(rng.normal(size=(N_CHAIN, 1024, 1024, 64)).astype(
        np.float32), jnp.bfloat16)
    # matmul probe: 2048^3 bf16
    a = jnp.asarray(rng.normal(size=(N_CHAIN, 2048, 2048)).astype(np.float32),
                    jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(2048, 2048)).astype(np.float32),
                    jnp.bfloat16)

    def scan_time(xs, f):
        def chained(xs):
            def step(c, x):
                return c, jnp.sum(f(x).astype(jnp.float32))
            _, ys = jax.lax.scan(step, 0, xs)
            return ys
        cfn = jax.jit(chained)
        np.asarray(cfn(xs))
        t0 = time.time()
        np.asarray(cfn(xs))
        return (time.time() - t0) / N_CHAIN

    t_read = scan_time(big, lambda x: jnp.max(x, axis=(0, 1)))
    gb = big[0].size * 2 / 1e9
    print(json.dumps({"probe": "read_reduce", "ms": round(t_read * 1e3, 3),
                      "GB": gb, "GBps": round(gb / t_read, 1)}), flush=True)

    t_rw = scan_time(big, lambda x: x * 1.0001 + 0.5)
    # note: output is materialized then summed -> ~3x slice traffic
    print(json.dumps({"probe": "rw_elementwise", "ms": round(t_rw * 1e3, 3),
                      "GBps_eff_3x": round(3 * gb / t_rw, 1)}), flush=True)

    t_mm = scan_time(a, lambda x: jnp.dot(x, b,
                                          preferred_element_type=jnp.float32))
    flops = 2 * 2048 ** 3
    print(json.dumps({"probe": "matmul2048", "ms": round(t_mm * 1e3, 3),
                      "TFLOPs": round(flops / t_mm / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
