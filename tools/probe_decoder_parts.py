"""Attribute decoder_head_v2's on-chip time to its parts.

profile_stages shows the fused decoder tail at ~12.5 ms/act vs a 3.95 ms
row-stream floor at n=100, while the same 1-row grid streams at full bandwidth
in a bare copy kernel — so the gap is UNOVERLAPPED in-kernel compute, but which
part? This runs the kernel's compile-time ablations paired in one process
(median of 3, same inputs):

  full     the real kernel (reference point)
  nostats  soft-argmax fold removed          -> stats share
  notrans  trans-conv pass removed           -> trans share
  tap1     one of nine k3 taps               -> marginal 8-tap dot+accum share
  dma      rows in, zero rows out            -> the kernel's own stream floor

Timing only: every variant except `full` computes WRONG outputs by design.

Run alone on the chip:  python tools/probe_decoder_parts.py [--n 100]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--t-heads", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode smoke (no timing value)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
    import jax.numpy as jnp

    from voxactb_tpu.ops.pallas.decoder_head_v2 import decoder_head_v2

    n, c, th = args.n, args.c, args.t_heads
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.normal(size=(1, n, n, n, c)).astype(np.float32),
                     jnp.bfloat16)
    u0 = jnp.asarray(rng.normal(size=(1, n, n, n, c)).astype(np.float32),
                     jnp.bfloat16)
    wf = jnp.asarray(
        rng.normal(size=(3, 3, 3, 2 * c, c)).astype(np.float32) * 0.05,
        jnp.bfloat16)
    bf = jnp.asarray(rng.normal(size=(c,)).astype(np.float32), jnp.bfloat16)
    wt = jnp.asarray(
        rng.normal(size=(th, 3, 3, 3, c, 1)).astype(np.float32) * 0.05,
        jnp.bfloat16)
    bt = jnp.asarray(rng.normal(size=(th,)).astype(np.float32), jnp.bfloat16)

    variants = ["full", "nostats", "notrans", "tap1", "dma"]
    # chain CHAIN calls per fetch: a single-call fetch pays the ~100-200 ms
    # relay round trip + a 4 MB trans download, which drowned the overnight
    # r4d run's deltas (its `notrans` came out SLOWER than `full`); per-call
    # deltas are only meaningful when the kernel runs many times per fetch
    CHAIN = 16
    import functools

    fns = {}
    for v in variants:
        abl = "" if v == "full" else v

        @functools.partial(jax.jit, static_argnames=("ablate",))
        def chained(d0, u0, ablate=abl):
            def one(carry, _):
                out = decoder_head_v2(d0 + carry, u0, wf, bf, wt, bt,
                                      interpret=args.cpu, ablate=ablate)
                # fold a scalar back in so iterations cannot be CSE'd
                return carry + 0.0 * out[0].ravel()[0].astype(jnp.bfloat16), \
                    out[0].ravel()[0]
            return jax.lax.scan(one, jnp.bfloat16(0.0), None, length=CHAIN)[1]

        probe = np.asarray(chained(d0, u0, ablate=abl))  # compile + warm
        if v == "full":
            assert np.isfinite(np.asarray(
                decoder_head_v2(d0, u0, wf, bf, wt, bt,
                                interpret=args.cpu)[0])).all()
        fns[v] = (chained, abl)
        print(json.dumps({"compiled": v}), flush=True)

    if args.cpu:
        print(json.dumps({"cpu_smoke": "ok"}))
        return

    walls = {v: [] for v in variants}
    for _ in range(args.reps):
        for v in variants:
            chained, abl = fns[v]
            t0 = time.perf_counter()
            np.asarray(chained(d0, u0, ablate=abl))
            walls[v].append(time.perf_counter() - t0)
    med = {v: round(sorted(w)[len(w) // 2] / CHAIN * 1e3, 2)
           for v, w in walls.items()}
    shares = {
        "stats_ms": round(med["full"] - med["nostats"], 2),
        "trans_ms": round(med["full"] - med["notrans"], 2),
        "eight_taps_ms": round(med["full"] - med["tap1"], 2),
        "dma_floor_ms": med["dma"],
    }
    print(json.dumps({"n": n, "medians_ms": med, "shares": shares}))


if __name__ == "__main__":
    main()
