"""Standalone-op latency profile of the fused act program's building blocks.

Times each hot op in isolation (chained 16x on device in one scan, fetched once) at
the canonical 100^3 / bf16 operating point, plus alternative formulations of the
convolutions, to locate and fix the hotspot.

Run: python tools/profile_stages.py [--batch 8]
--batch B profiles every stage at batch B (the measured half of the
batched-8 MEASURED-vs-SOL table; ceilings come from cost_model.act_cost(batch=8)
via bench.py's batched8_stage_ceiling_ms key).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_CHAIN = 16
N = 100
S = 20  # patch grid


def main(batch: int = 1, only=None):
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

    # the big grid tensors scale with batch (d0 at batch 8 is 1 GB per chain
    # step) — shrink the chain so the largest stage input (cat128, 2x d0)
    # stays under ~4 GB of HBM, and synthesize on DEVICE (host numpy for
    # d0@batch8 alone would be 8e9 normals / 33 GB of host RAM)
    n_chain = max(2, min(N_CHAIN, int(4e9 / (batch * N ** 3 * 128 * 2))))
    if n_chain != N_CHAIN:
        print(json.dumps({"note": f"chain shortened to {n_chain} at "
                                  f"batch {batch} to fit HBM"}), flush=True)

    def dev_normal(key, shape, dtype=bf):
        return jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.float32).astype(dtype),
        )(jax.random.key(key))

    grid10 = dev_normal(0, (n_chain, batch, N, N, N, 10))
    d0 = dev_normal(1, (n_chain, batch, N, N, N, 64))
    cat128 = dev_normal(2, (n_chain, batch, N, N, N, 128))
    small = dev_normal(3, (n_chain, batch, S, S, S, 128))
    seq = dev_normal(4, (n_chain, batch, 8077, 128))

    k1 = jnp.asarray(rng.normal(size=(1, 1, 1, 10, 64)).astype(np.float32) * .1, bf)
    k5s5 = jnp.asarray(rng.normal(size=(5, 5, 5, 64, 64)).astype(np.float32) * .1, bf)
    k3 = jnp.asarray(rng.normal(size=(3, 3, 3, 128, 64)).astype(np.float32) * .1, bf)
    k3_1 = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 1)).astype(np.float32) * .1, bf)
    k5up = jnp.asarray(rng.normal(size=(5, 5, 5, 128, 64)).astype(np.float32) * .1, bf)
    bias64 = jnp.zeros((64,), bf)

    latents = jnp.asarray(rng.normal(size=(2048, 512)).astype(np.float32) * .1, bf)
    wq = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32) * .05, bf)
    wkv = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32) * .05, bf)

    def conv3d(x, k, stride=1):
        return jax.lax.conv_general_dilated(
            x, k, (stride,) * 3, "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(bf)

    def patchify_s2d(x, k):
        ksz = k.shape[0]
        b, n = x.shape[0], x.shape[1]
        sgrid = n // ksz
        cin = x.shape[-1]
        pad = ksz // 2
        xp = jnp.pad(x, ((0, 0),) + ((pad, 0),) * 3 + ((0, 0),),
                     mode="edge")[:, :n, :n, :n]
        xp = xp.reshape(b, sgrid, ksz, sgrid, ksz, sgrid, ksz, cin)
        xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, sgrid ** 3, ksz ** 3 * cin)
        w = k.reshape(ksz ** 3 * cin, k.shape[-1])
        return jnp.einsum("bpk,kf->bpf", xp, w,
                          preferred_element_type=jnp.float32).astype(bf)

    def conv3d_as_2d_zshift(x, k):
        """k3 conv3d decomposed into 3 z-shifted 2D convs (D folded into batch)."""
        b, d, h, w, cin = x.shape
        cout = k.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        acc = jnp.zeros((b, d, h, w, cout), jnp.float32)
        for dz in range(3):
            sl = xp[:, dz:dz + d].reshape(b * d, h, w, cin)
            y = jax.lax.conv_general_dilated(
                sl, k[dz], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = acc + y.reshape(b, d, h, w, cout)
        return acc.astype(bf)

    def attn_trunk(s):
        # cross-attn (1 head, 64) + 6 self-attn layers + FFs, shapes only
        x = jnp.broadcast_to(latents[None], (s.shape[0], 2048, 512))
        kv = jnp.einsum("bnd,de->bne", s, wkv, preferred_element_type=jnp.float32
                        ).astype(bf)
        sim = jnp.einsum("bid,bjd->bij", x[..., :128], kv,
                         preferred_element_type=jnp.float32)
        a = jax.nn.softmax(sim, -1).astype(bf)
        x = x + jnp.pad(jnp.einsum("bij,bjd->bid", a, kv,
                                   preferred_element_type=jnp.float32
                                   ).astype(bf), ((0, 0), (0, 0), (0, 384)))
        for _ in range(6):
            q = jnp.einsum("bnd,de->bne", x, wq,
                           preferred_element_type=jnp.float32).astype(bf)
            sim = jnp.einsum("bid,bjd->bij", q, q,
                             preferred_element_type=jnp.float32)
            a = jax.nn.softmax(sim, -1).astype(bf)
            x = x + jnp.einsum("bij,bjd->bid", a, q,
                               preferred_element_type=jnp.float32).astype(bf)
            h = jnp.einsum("bnd,de->bne", x, wq,
                           preferred_element_type=jnp.float32).astype(bf)
            x = x + h
        return x

    from voxactb_tpu.ops.voxelize import voxelize

    pts = jnp.asarray(rng.uniform(-0.5, 1.5, (n_chain, batch, 32768, 3)).astype(
        np.float32))
    ptf = jnp.asarray(rng.uniform(-1, 1, (n_chain, batch, 32768, 3)).astype(
        np.float32))
    vox_bounds = jnp.asarray([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]] * batch,
                             jnp.float32)

    def d0_consumers_separate(x):
        """ss0 + globalmax + patchify, each re-reading d0 (round-1 structure)."""
        return (spatial_softmax_3d(x), jnp.max(x, axis=(1, 2, 3)),
                conv3d(x, k5s5, stride=5))

    # the REAL trunk (models/perceiver.py modules at the canonical 100^3 dims:
    # 8-head self-attn x6 + 1-head cross + decoder cross) — the simplified
    # attn_trunk below underestimates it 8x on the logits
    from flax import linen as nn_flax

    from voxactb_tpu.models.perceiver import FeedForward, PreNormAttention

    class RealTrunk(nn_flax.Module):
        flash: bool = False

        @nn_flax.compact
        def __call__(self, seq):
            lat = self.param("latents", nn_flax.initializers.normal(1.0),
                             (2048, 512))
            x = jnp.broadcast_to(lat[None].astype(bf),
                                 (seq.shape[0], 2048, 512))
            x = PreNormAttention(1, 64, 512, norm_context=True,
                                 flash=self.flash, dtype=bf,
                                 name="cross")(x, seq) + x
            x = FeedForward(512, dtype=bf, name="cross_ff")(x) + x
            for i in range(6):
                x = PreNormAttention(8, 64, 512, flash=self.flash, dtype=bf,
                                     name=f"sa{i}")(x) + x
                x = FeedForward(512, dtype=bf, name=f"ff{i}")(x) + x
            return PreNormAttention(1, 64, 128, norm_context=True,
                                    flash=self.flash, dtype=bf,
                                    name="dec")(seq, x)

    trunk_params = {}

    def real_trunk(s, flash=False):
        m = RealTrunk(flash=flash)
        if "p" not in trunk_params:
            trunk_params["p"] = m.init(jax.random.key(0), s)
        return m.apply(trunk_params["p"], s)

    # init once outside the timed scan (params are shared by both variants)
    _ = real_trunk(jnp.zeros((batch, 8077, 128), bf))

    # --- the ACTUAL pallas kernels the fused act program runs (front_fused,
    # decoder_head_v2) and a per-grid-step overhead probe. The overhead probe
    # streams the same 128 MB (d0-sized copy) through grids of 100 / 25 / 5
    # steps: if time falls as the step count falls, the kernels pay a fixed
    # per-grid-step cost that batching multiplies (grid leads with batch).
    from voxactb_tpu.ops.pallas.decoder_head_v2 import decoder_head_v2
    from voxactb_tpu.ops.pallas.decoder_head_v2c import decoder_head_v2c
    from voxactb_tpu.ops.pallas.front_fused import front_fused
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w1_ff = jnp.asarray(rng.normal(size=(10, 64)).astype(np.float32) * .1)
    b1_ff = jnp.zeros((64,), jnp.float32)
    wp_ff = jnp.asarray(rng.normal(size=(5, 5, 5, 64, 64)).astype(np.float32) * .1)
    kf_v2 = jnp.asarray(rng.normal(size=(3, 3, 3, 128, 64)).astype(np.float32) * .1, bf)
    bf_v2 = jnp.zeros((64,), jnp.float32)
    wt_v2 = jnp.asarray(rng.normal(size=(1, 3, 3, 3, 64, 1)).astype(np.float32) * .1, bf)
    bt_v2 = jnp.zeros((1,), jnp.float32)

    def copy_rows_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def grid_copy(x, rows_per_step: int):
        b, n, h, w, c = x.shape
        g = n // rows_per_step
        return pl.pallas_call(
            copy_rows_kernel,
            grid=(b, g),
            in_specs=[pl.BlockSpec((1, rows_per_step, h, w, c),
                                   lambda bb, tt: (bb, tt, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows_per_step, h, w, c),
                                   lambda bb, tt: (bb, tt, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    # (input with leading N_CHAIN axis, op) — scan consumes a fresh slice per step so
    # XLA cannot hoist the op out of the loop
    stages = {
        "front_fused@100": (
            (pts, ptf),
            lambda xs: front_fused(xs[0], xs[1], vox_bounds, w1_ff, b1_ff,
                                   wp_ff, voxel_size=100)),
        # scatter-cost isolation: row_cap clamps the serial per-point loop
        # (wrong output, timing only). cap64 runs ~1/5 the scatter iterations
        # of the real ~330/row — the time delta to the full kernel IS the
        # serial-scatter share.
        "front_fused_cap64@100": (
            (pts, ptf),
            lambda xs: front_fused(xs[0], xs[1], vox_bounds, w1_ff, b1_ff,
                                   wp_ff, voxel_size=100, row_cap=64)),
        "front_fused_unroll8@100": (
            (pts, ptf),
            lambda xs: front_fused(xs[0], xs[1], vox_bounds, w1_ff, b1_ff,
                                   wp_ff, voxel_size=100, scatter_unroll=8)),
        "front_fused_matmul@100": (
            (pts, ptf),
            lambda xs: front_fused(xs[0], xs[1], vox_bounds, w1_ff, b1_ff,
                                   wp_ff, voxel_size=100, scatter_matmul=True)),
        "decoder_v2_tail@100": (
            (d0, d0),
            lambda xs: decoder_head_v2(xs[0], xs[1], kf_v2, bf_v2,
                                       wt_v2, bt_v2)),
        "decoder_v2c_tail@100": (
            (d0, d0),
            lambda xs: decoder_head_v2c(xs[0], xs[1], kf_v2, bf_v2,
                                        wt_v2, bt_v2)),
        # 1-row vs 4-row measured IDENTICAL (31.0 vs 31.7 ms for 2.05 GB at
        # batch 8, 2026-08-19): per-grid-step overhead is negligible and the
        # platform's true streaming bandwidth is ~66 GB/s. A 20-row variant
        # OOMs VMEM (25.6 MB windows x double-buffer x in+out = 203 MB) — keep
        # blocks comfortably under ~8 MB per operand.
        "grid_copy_1row@100": (d0, lambda x: grid_copy(x, 1)),
        "grid_copy_4row@100": (d0, lambda x: grid_copy(x, 4)),
        "voxelize_32k->100^3": (
            (pts, ptf),
            lambda xs: voxelize(xs[0], xs[1], vox_bounds, voxel_size=100)),
        "d0_consumers_separate@100": (d0, d0_consumers_separate),
        "conv1x1_10->64@100": (grid10, lambda x: conv3d(x, k1)),
        "patchify_k5s5@100": (d0, lambda x: conv3d(x, k5s5, stride=5)),
        "patchify_s2d_matmul@100": (d0, lambda x: patchify_s2d(x, k5s5)),
        "ss0_softmax64@100": (d0, spatial_softmax_3d),
        "globalmax@100": (d0, lambda x: jnp.max(x, axis=(1, 2, 3))),
        "final_k3_conv3d@100": (cat128, lambda x: conv3d(x, k3)),
        "final_k3_as_2d@100": (cat128, lambda x: conv3d_as_2d_zshift(x, k3)),
        "trans_k3_64->1@100": (d0, lambda x: conv3d(x, k3_1)),
        "fused_upsample20->100": (small, lambda x: upsample_conv(
            x, k5up, bias64, 5)),
        "attention_trunk": (seq, attn_trunk),
        "real_attn_trunk": (seq, lambda s: real_trunk(s, flash=False)),
        "real_attn_trunk_flash": (seq, lambda s: real_trunk(s, flash=True)),
    }

    results = {}
    for name, (inp, fn) in stages.items():
        if only and not any(o in name for o in only):
            continue
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
        walls = []
        for _ in range(3):  # median of 3: the relay jitters run-to-run
            t0 = time.time()
            np.asarray(cfn(inp))
            walls.append(time.time() - t0)
        per_step_ms = sorted(walls)[1] / n_chain * 1000
        results[name] = round(per_step_ms, 2)
        print(json.dumps({"stage": name, "per_step_ms": results[name],
                          "compile_s": round(compile_s, 1)}), flush=True)

    print(json.dumps({"batch": batch, "all": results}))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filter: run only stages whose name "
                         "contains any of these")
    args = ap.parse_args()
    main(batch=args.batch, only=args.only)
