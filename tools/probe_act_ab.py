"""Paired act-chain A/B of the round-4 kernel schedules, in ONE process.

Variants (cumulative off a common base — the round-3 bench flags):
  base      pallas front+decoder(v2)+encoder, XLA attention
  flash     + pallas_attention (trunk logits never in HBM)
  v2c       + decoder_head_v2c (K-concat z-accumulation)
  unroll8   + front scatter_unroll=8 (plane-split RMW chains)
  all       flash + v2c + unroll8

Run at batch 1 and batch 8 on the 100^3 grid plus batch 1 at the 50^3 crop
point. Alternates variants inside one process (the relay jitters ~40%
run-to-run across processes), median of 3 fetches each. Prints one JSON line
per measurement and a final summary — the decision data for the bench flag
defaults (BENCH_PALLAS_ATTN / _DECODER_V2C and the front unroll).

ALSO asserts cross-variant action agreement: every variant must decode the
same 9-dof actions (argmax contract) on the same random observations.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_CHAIN = {1: 16, 8: 4}


def build(cfg, batch, n_chain):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(__file__) or ".")
    import bench

    model_chain, rgbs, pcds = None, None, None
    # reuse bench.build_chain but with our chain length
    old = bench.N_CHAIN
    bench.N_CHAIN = n_chain
    try:
        chained, rgbs, pcds = bench.build_chain(cfg, batch)
    finally:
        bench.N_CHAIN = old
    return chained, rgbs, pcds


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxactb_tpu.config import MethodConfig

    def cfg(n, flash=False, v2c=False, unroll=False):
        return MethodConfig(
            voxel_sizes=[n], which_arm="right", compute_dtype="bfloat16",
            zshift_conv3d=True, pallas_decoder=True, pallas_encoder=True,
            pallas_front=True, pallas_attention=flash,
            pallas_decoder_v2c=v2c,
            front_scatter_unroll=8 if unroll else 1)

    variants = {
        "base": dict(),
        "flash": dict(flash=True),
        "v2c": dict(v2c=True),
        "unroll8": dict(unroll=True),
        "all": dict(flash=True, v2c=True, unroll=True),
    }

    results = {}
    for n, batch in ((100, 1), (100, 8), (50, 1)):
        nc = N_CHAIN[batch] if n == 100 else 32
        chains = {}
        actions = {}
        for name, kw in variants.items():
            chained, rgbs, pcds = build(cfg(n, **kw), batch, nc)
            acts = np.asarray(chained(rgbs, pcds))  # compile + warm
            assert np.isfinite(acts).all(), (n, batch, name)
            chains[name] = (chained, rgbs, pcds)
            actions[name] = acts
            print(json.dumps({"compiled": name, "n": n, "batch": batch}),
                  flush=True)
        # action agreement: same argmax decode across schedules
        ref = actions["base"]
        for name, acts in actions.items():
            if not np.allclose(acts, ref, atol=1e-5):
                bad = int((~np.isclose(acts, ref, atol=1e-5)).sum())
                print(json.dumps({"action_mismatch": name, "n": n,
                                  "batch": batch, "elements": bad}),
                      flush=True)
        # paired timing: alternate variants, 3 rounds, median
        walls = {name: [] for name in variants}
        for _ in range(3):
            for name, (chained, rgbs, pcds) in chains.items():
                t0 = time.perf_counter()
                np.asarray(chained(rgbs, pcds))
                walls[name].append(time.perf_counter() - t0)
        key = f"n{n}_b{batch}"
        results[key] = {
            name: round(sorted(w)[1] / nc / batch * 1e3, 2)
            for name, w in walls.items()}   # ms per act
        print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
