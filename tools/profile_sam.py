"""On-chip A/B of the SAM ViT-H encoder: fused global attention vs XLA path.

Paired in ONE process (the relay jitters ~40% run-to-run across processes).
Also splits the encoder cost by block type (global / windowed / mlp-only) so
the next optimization target is measured, not guessed.

Run (chip must be free): python tools/profile_sam.py [--frames 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, reps=3):
    np.asarray(fn(*args))  # compile + warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[len(walls) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--skip-blocks", action="store_true",
                    help="only the full-encoder A/B")
    ap.add_argument("--stage", action="store_true",
                    help="attribute the encoder's cost per stage (patch-embed /"
                         " windowed blocks / global blocks / neck) by "
                         "DIFFERENCING depth-truncated full-encoder runs — the"
                         " per-block chains keep activations resident and miss"
                         " the real HBM pressure; truncation keeps it")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxactb_tpu.models.sam_encoder import SamBlock, SamImageEncoder

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    img = jnp.asarray(rng.normal(size=(1, 1024, 1024, 3)).astype(np.float32))

    results = {}

    def enc(fused, fused_win=False):
        return SamImageEncoder(embed_dim=1280, depth=32, num_heads=16,
                               global_attn_indexes=(7, 15, 23, 31),
                               fused_global=fused, fused_windowed=fused_win,
                               dtype=bf)

    e = enc(False)
    params = jax.jit(e.init)(jax.random.key(0), img)

    if args.stage:
        # truncated FULL-encoder ladder under the production flags (fused
        # global+windowed, the bench defaults). Blocks 0-6 are windowed,
        # 7 is the first global (global_attn_indexes), so:
        #   d0   = patch-embed + pos only
        #   d7   = + 7 windowed blocks
        #   d8   = + the first global block
        #   d32nn= all 32 blocks, no neck
        #   full = + neck
        def enc_t(depth_limit, skip_neck=True):
            return SamImageEncoder(
                embed_dim=1280, depth=32, num_heads=16,
                global_attn_indexes=(7, 15, 23, 31),
                fused_global=True, fused_windowed=True,
                depth_limit=depth_limit, skip_neck=skip_neck, dtype=bf)

        ladder = {}
        for name, d, skip in (("d0", 0, True), ("d7", 7, True),
                              ("d8", 8, True), ("d32nn", -1, True),
                              ("full", -1, False)):
            # reduce to a scalar INSIDE the jit: truncated encoders return the
            # [1,64,64,1280] trunk activation, and fetching 21 MB through the
            # relay costs ~1s — the first run of this ladder measured fetch,
            # not compute (d0 'patch embed' 1078 ms > full 480 ms)
            m = enc_t(d, skip)
            f = jax.jit(lambda p, x, m=m: jnp.sum(
                m.apply(p, x).astype(jnp.float32)))
            ladder[name] = timed(f, params, img) * 1e3
            print(json.dumps({"stage_run": name,
                              "ms": round(ladder[name], 1)}), flush=True)

        win_ms = ladder["d7"] - ladder["d0"]          # 7 windowed blocks
        glob_ms = ladder["d8"] - ladder["d7"]         # 1 global block
        stages = {
            "patch_embed_ms": round(ladder["d0"], 1),
            "windowed_28_ms": round(win_ms / 7 * 28, 1),
            "global_4_ms": round(glob_ms * 4, 1),
            "neck_ms": round(ladder["full"] - ladder["d32nn"], 1),
            "full_ms": round(ladder["full"], 1),
            "ladder_sum_ms": round(
                ladder["d0"] + win_ms / 7 * 28 + glob_ms * 4
                + ladder["full"] - ladder["d32nn"], 1),
        }
        # per-stage SOL on the relay (~66 GB/s, ~1.9 ms/op latency floor):
        # each stage is weight-read + activation-stream bound (cost_model)
        from cost_model import sam_encoder_cost, speed_of_light
        cm = sam_encoder_cost()
        stages["sol_full_ms_relay"] = round(
            speed_of_light(cm, 60e12, 66e9)["sol_ms"], 1)
        stages["sol_frac_relay"] = round(
            stages["sol_full_ms_relay"] / max(stages["full_ms"], 1e-9), 3)
        print(json.dumps({"stage_table": stages}))
        return

    for name, fused, fused_win in (("False", False, False),
                                   ("True", True, False),
                                   ("True+win", True, True)):
        f = jax.jit(enc(fused, fused_win).apply)
        s = timed(f, params, img)
        results[f"vit_h_ms_fused={name}"] = round(s * 1e3, 1)
        print(json.dumps({"probe": f"vit_h fused={name}",
                          "ms_per_frame": results[f"vit_h_ms_fused={name}"]}),
              flush=True)

    if not args.skip_blocks:
        # one block of each type on the ViT-H token grid, chained 4x
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 1280)).astype(np.float32),
                        bf)

        def block(window, fused):
            return SamBlock(1280, 16, window_size=window, grid_size=(64, 64),
                            fused_global=fused, fused_windowed=fused,
                            dtype=bf)

        for name, window, fused in (("global_xla", 0, False),
                                    ("global_fused", 0, True),
                                    ("windowed", 14, False),
                                    ("windowed_fused", 14, True)):
            m = block(window, fused)
            p = jax.jit(block(window, False).init)(jax.random.key(1), x)

            @jax.jit
            def chain(p, x, m=m):
                def step(c, _):
                    return m.apply(p, c), None
                y, _ = jax.lax.scan(step, x, None, length=4)
                return y

            s = timed(chain, p, x)
            results[f"block_{name}_ms"] = round(s / 4 * 1e3, 2)
            print(json.dumps({"probe": f"block {name}",
                              "ms_per_block": results[f"block_{name}_ms"]}),
                  flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
