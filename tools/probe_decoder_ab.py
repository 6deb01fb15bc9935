"""Paired on-chip A/B of the decoder tail variants at the canonical N=100 point.

Times the FULL tail from the decoded patch slab h [B,20,20,20,C]:
  v1 / v2: XLA phase-upsample (h -> u0, writes+reads 128 MB) then the fused
           decoder kernel reading (d0, u0) from HBM.
  v3:      decoder_head_v3 reading d0 from HBM and synthesizing u0 rows
           in-kernel from h (u0 never exists in HBM).
All variants run alternately in ONE process (relay jitter makes cross-process
comparisons untrustworthy); prints per-variant medians and cross-checks the
trans argmax of every variant against v1. Run AFTER any bench finishes —
never overlap TPU processes.
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
    from voxactb_tpu.ops.pallas.decoder_head_v3 import decoder_head_v3
    from voxactb_tpu.ops.upsample_conv import upsample_conv

    rng = np.random.default_rng(0)
    n, c, t_heads, chain = 100, 64, 1, 16
    s = n // 5
    d0s = jnp.asarray(rng.normal(size=(chain, 1, n, n, n, c)).astype(np.float32),
                      jnp.bfloat16)
    hs = jnp.asarray(rng.normal(size=(chain, 1, s, s, s, c)).astype(np.float32),
                     jnp.bfloat16)
    upk = jnp.asarray((rng.normal(size=(5, 5, 5, c, c)) * .05).astype(np.float32))
    upb = jnp.asarray(np.zeros(c, np.float32))
    wf = jnp.asarray((rng.normal(size=(3, 3, 3, 2 * c, c)) * .05).astype(np.float32))
    bf = jnp.asarray(np.zeros(c, np.float32))
    wt = jnp.asarray((rng.normal(size=(t_heads, 3, 3, 3, c, 1)) * .05)
                     .astype(np.float32))
    bt = jnp.asarray(np.zeros(t_heads, np.float32))

    def via_upsample(fn):
        def tail(d0, h):
            u0 = jax.nn.leaky_relu(
                upsample_conv(h, upk.astype(jnp.bfloat16),
                              upb.astype(jnp.bfloat16), 5),
                0.02).astype(jnp.bfloat16)
            return fn(d0, u0, wf, bf, wt, bt)
        return tail

    def v3_tail(d0, h):
        return decoder_head_v3(d0, h, upk, upb, wf, bf, wt, bt)

    def chained(tail):
        def run(d0s, hs):
            def step(carry, xs):
                d0, h = xs
                tr, kp, gm = tail(d0, h)
                am = jnp.argmax(tr.reshape(tr.shape[0], -1, tr.shape[-1]),
                                axis=1)
                return carry, (jnp.sum(tr) + jnp.sum(kp) + jnp.sum(gm), am)
            return jax.lax.scan(step, 0, (d0s, hs))[1]
        return jax.jit(run)

    runs = {"v1": chained(via_upsample(decoder_head)),
            "v2": chained(via_upsample(decoder_head_v2)),
            "v3": chained(v3_tail)}
    outs = {}
    for name, fn in list(runs.items()):
        t0 = time.time()
        try:
            s_, am = fn(d0s, hs)
            outs[name] = (np.asarray(s_), np.asarray(am))
            print(f"{name} compile {time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            del runs[name]

    if "v1" in outs:
        for name in outs:
            if name != "v1":
                same = (outs[name][1] == outs["v1"][1]).all()
                print(f"{name} argmax == v1: {same}", flush=True)

    results = {k: [] for k in runs}
    for rep in range(5):
        for name, fn in runs.items():
            t0 = time.time()
            out, _ = fn(d0s, hs)
            np.asarray(out)
            results[name].append((time.time() - t0) / chain * 1000)
    print(json.dumps({k: round(sorted(v)[len(v) // 2], 2)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
