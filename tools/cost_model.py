"""Analytic FLOPs / HBM-bytes model of the fused act program (voxelize + Q-forward).

Produces the quantified roofline proof for bench.py: per-stage FLOPs and the
MINIMAL HBM traffic (every tensor written once, read once by its consumers — the
speed-of-light for a perfectly fused program), from which bench.py derives

    sol_ms     = max(flops / peak_flops, bytes / hbm_bw)
    mfu_pct    = flops / (measured_s * peak_flops)
    hbm_util   = bytes / (measured_s * hbm_bw)

on both the relay-measured ceilings (tools/roofline.py) and physical v5e specs
(197 TFLOP/s bf16, 819 GB/s). Shapes follow voxactb_tpu/models/perceiver.py's
shape walk at the canonical N=100 / patch-5 / latents-2048x512 operating point.
"""

from __future__ import annotations

from typing import Dict

V5E_PEAK_FLOPS = 197e12    # bf16
V5E_HBM_BW = 819e9         # bytes/s


def act_cost(n: int = 100, batch: int = 1, img: int = 128, cams: int = 2,
             im_ch: int = 64, latents: int = 2048, latent_dim: int = 512,
             depth: int = 6, patch: int = 5, lang_len: int = 77,
             input_dim: int = 10, heads_t: int = 1,
             fused_decoder: bool = False) -> Dict[str, float]:
    """Per-act FLOPs and minimal HBM bytes of the inference program."""
    s = n // patch                      # patch grid (20)
    seq = lang_len + s ** 3             # 8077
    dim = 2 * im_ch                     # 128 (voxel + proprio stream)
    p = cams * img * img                # points per sample
    bf2, f4 = 2, 4                      # bf16 / f32 widths

    fl: Dict[str, float] = {}
    by: Dict[str, float] = {}

    # voxelize: scatter-add of [P, 8] + grid emit (bandwidth only)
    by["voxelize"] = (p * 6 * f4                       # coords+rgb in
                      + (n + 2) ** 3 * 8 * f4 * 2      # scatter grid init+read
                      + n ** 3 * input_dim * f4)       # output grid
    fl["voxelize"] = p * 30

    # 1x1x1 preprocess -> d0 [N^3, 64]
    fl["preprocess"] = 2 * n ** 3 * input_dim * im_ch
    by["preprocess"] = n ** 3 * input_dim * f4 + n ** 3 * im_ch * bf2

    # stats(d0): two passes (max, exp-weighted sums)
    fl["stats_d0"] = 6 * n ** 3 * im_ch
    by["stats_d0"] = 2 * n ** 3 * im_ch * bf2

    # patchify conv k5 s5 (+ proprio/lang preprocess, negligible)
    fl["patchify"] = 2 * s ** 3 * patch ** 3 * im_ch * im_ch
    by["patchify"] = n ** 3 * im_ch * bf2 + s ** 3 * im_ch * bf2

    # perceiver trunk: cross-attn (1 head, dim->latent), depth self-attn + GEGLU FF,
    # decoder cross-attn back to the sequence
    d_lat, d_in = latent_dim, dim
    cross = (2 * latents * d_lat * 64 + 2 * seq * d_in * 128
             + 2 * latents * seq * 64 * 2 + 2 * latents * 64 * d_lat)
    ff = 2 * latents * d_lat * (4 * d_lat) * 2 + 2 * latents * (4 * d_lat // 2) * d_lat
    self_attn = (2 * latents * d_lat * (3 * d_lat)
                 + 2 * latents * latents * d_lat * 2
                 + 2 * latents * d_lat * d_lat)
    dec = (2 * seq * d_in * 64 + 2 * latents * d_lat * 128
           + 2 * seq * latents * 64 * 2 + 2 * seq * 64 * d_in)
    fl["attention"] = cross + ff + depth * (self_attn + ff) + dec
    # weights + activations stream once
    attn_params = depth * (4 * d_lat * d_lat + 3 * d_lat * 4 * d_lat) \
        + 2 * latents * d_lat
    by["attention"] = attn_params * bf2 + 4 * seq * d_in * bf2 \
        + 2 * latents * d_lat * bf2 * depth

    # decoder upsample: conv_in k5 @20^3 + phase-composed k3 -> 125*64 channels
    fl["upsample"] = (2 * s ** 3 * patch ** 3 * dim * im_ch
                      + 2 * s ** 3 * 27 * im_ch * (patch ** 3 * im_ch))
    by["upsample"] = s ** 3 * dim * bf2 + n ** 3 * im_ch * bf2

    # final conv k3 (cat 128 -> 64) + lrelu
    fl["final_conv"] = 2 * n ** 3 * 27 * (2 * im_ch) * im_ch
    # trans decoder(s) k3 64 -> 1
    fl["trans"] = heads_t * 2 * n ** 3 * 27 * im_ch
    # stats(u)
    fl["stats_u"] = 6 * n ** 3 * im_ch

    if fused_decoder:
        # pallas decoder_head: reads d0+u0 once, writes trans + stats only
        by["decoder_tail"] = (2 * n ** 3 * im_ch * bf2
                              + heads_t * n ** 3 * f4)
    else:
        # XLA chain: cat materialized + read, u materialized + read by trans/stats
        by["decoder_tail"] = (2 * n ** 3 * im_ch * bf2 * 2     # cat w+r
                              + n ** 3 * im_ch * bf2 * 3       # u w + 2 consumers
                              + heads_t * n ** 3 * f4)

    total_fl = float(sum(fl.values())) * batch
    total_by = float(sum(by.values())) * batch
    return {
        "flops": total_fl,
        "bytes": total_by,
        "flops_by_stage": fl,
        "bytes_by_stage": by,
    }


def speed_of_light(cost: Dict[str, float], peak_flops: float = V5E_PEAK_FLOPS,
                   hbm_bw: float = V5E_HBM_BW) -> Dict[str, float]:
    t_flops = cost["flops"] / peak_flops
    t_bytes = cost["bytes"] / hbm_bw
    return {
        "sol_ms": max(t_flops, t_bytes) * 1e3,
        "compute_ms": t_flops * 1e3,
        "memory_ms": t_bytes * 1e3,
        "bound": "compute" if t_flops > t_bytes else "memory",
    }


if __name__ == "__main__":
    import json

    c = act_cost()
    print(json.dumps({
        "flops_g": round(c["flops"] / 1e9, 1),
        "hbm_mb": round(c["bytes"] / 1e6, 1),
        "sol_v5e": speed_of_light(c),
        "sol_relay": speed_of_light(c, 60e12, 66e9),
        "stage_gflops": {k: round(v / 1e9, 1) for k, v in
                         c["flops_by_stage"].items()},
        "stage_mb": {k: round(v / 1e6, 1) for k, v in
                     c["bytes_by_stage"].items()},
    }, indent=1))
