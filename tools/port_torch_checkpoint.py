"""Port a reference QAttentionAgent torch checkpoint onto voxactb_tpu parameters.

The reference saves ``QAttentionAgent_layer0.pt`` state_dicts
(qattention_peract_bc_agent.py:878-880) whose keys follow the module tree of
``QFunction`` -> ``PerceiverVoxelLangEncoder`` (perceiver_lang_io.py:136-334), with a
DDP ``module.`` prefix when trained distributed (stripped on load, :845-855).
``map_reference_qattention`` translates those tensors into this framework's flax
param tree so checkpoint-level parity is testable.

Layout conversions:
  torch Conv3d  [out, in, kd, kh, kw] -> flax NDHWC kernel [kd, kh, kw, in, out]
  torch Linear  [out, in]             -> flax Dense kernel [in, out]

Usage:
  python tools/port_torch_checkpoint.py --ckpt QAttentionAgent_layer0.pt \\
      --out params.msgpack [--two-arm] [--arm-pred]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def _conv3d(sd, key):
    return {
        "kernel": _np(sd[f"{key}.conv3d.weight"]).transpose(2, 3, 4, 1, 0),
        "bias": _np(sd[f"{key}.conv3d.bias"]),
    }


def _dense_block(sd, key):
    return {
        "Dense_0": {
            "kernel": _np(sd[f"{key}.linear.weight"]).T,
            "bias": _np(sd[f"{key}.linear.bias"]),
        }
    }


def _linear(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).T,
            "bias": _np(sd[f"{key}.bias"])}


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _attention(sd, prenorm_key, has_context_norm):
    """reference PreNorm(Attention) pair -> PreNormAttention params."""
    out = {
        "norm": _ln(sd, f"{prenorm_key}.norm"),
        "attn": {
            "to_q": {"kernel": _np(sd[f"{prenorm_key}.fn.to_q.weight"]).T},
            "to_kv": {"kernel": _np(sd[f"{prenorm_key}.fn.to_kv.weight"]).T},
            "to_out": _linear(sd, f"{prenorm_key}.fn.to_out"),
        },
    }
    if has_context_norm:
        out["norm_context"] = _ln(sd, f"{prenorm_key}.norm_context")
    return out


def _feedforward(sd, prenorm_key):
    """reference PreNorm(FeedForward(net: Linear, GEGLU, Linear))."""
    return {
        "norm": _ln(sd, f"{prenorm_key}.norm"),
        "w_in": _linear(sd, f"{prenorm_key}.fn.net.0"),
        "w_out": _linear(sd, f"{prenorm_key}.fn.net.2"),
    }


def map_reference_qattention(state_dict: Dict, depth: int = 6,
                             arm_pred: bool = False,
                             two_arm_heads: bool = False) -> dict:
    """Reference ``QAttentionAgent_layer0.pt`` state_dict -> flax {'params': ...}."""
    # strip QFunction/DDP prefixes (load_weights behavior, :845-855)
    sd = {}
    for k, v in state_dict.items():
        for prefix in ("_qnet.module.", "_qnet."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        sd[k] = v

    p = {
        "input_preprocess": _conv3d(sd, "input_preprocess"),
        "patchify": _conv3d(sd, "patchify"),
        "proprio_preprocess": _dense_block(sd, "proprio_preprocess"),
        "lang_preprocess": _linear(sd, "lang_preprocess"),
        "pos_encoding": _np(sd["pos_encoding"]),
        "latents": _np(sd["latents"]),
        "cross_attend": _attention(sd, "cross_attend_blocks.0", True),
        "cross_ff": _feedforward(sd, "cross_attend_blocks.1"),
        "decoder_cross_attn": _attention(sd, "decoder_cross_attn", True),
        "final": _conv3d(sd, "final"),
        "trans_decoder": _conv3d(sd, "trans_decoder"),
        "dense0": _dense_block(sd, "dense0"),
        "dense1": _dense_block(sd, "dense1"),
        "rot_grip_collision_ff": _dense_block(sd, "rot_grip_collision_ff"),
    }
    for i in range(depth):
        p[f"self_attn_{i}"] = _attention(sd, f"layers.{i}.0", False)
        p[f"self_ff_{i}"] = _feedforward(sd, f"layers.{i}.1")

    # Conv3DUpsample: reference conv_up.0 (pre-upsample conv) and conv_up.2
    # (post-upsample conv -> our composed out_kernel/out_bias)
    p["up0"] = {
        "conv_in": _conv3d(sd, "up0.conv_up.0"),
        "out_kernel": _np(sd["up0.conv_up.2.conv3d.weight"]).transpose(
            2, 3, 4, 1, 0),
        "out_bias": _np(sd["up0.conv_up.2.conv3d.bias"]),
    }

    if arm_pred and "dense2.linear.weight" in sd:
        p["dense2"] = _dense_block(sd, "dense2")
        p["arm_ff"] = _dense_block(sd, "arm_ff")

    if two_arm_heads:
        p["trans_decoder_left"] = _conv3d(sd, "trans_decoder_left_arm")
        p["dense0_left"] = _dense_block(sd, "dense0_left_arm")
        p["dense1_left"] = _dense_block(sd, "dense1_left_arm")
        p["rot_grip_collision_ff_left"] = _dense_block(
            sd, "rot_grip_collision_ff_left_arm")

    return {"params": p}


def reference_key_shapes(depth: int = 6, voxel_size: int = 100,
                         low_dim: int = 4, im: int = 64, latents: int = 2048,
                         latent_dim: int = 512, arm_pred: bool = False) -> Dict:
    """Shape table of the reference checkpoint (for synthetic round-trip tests)."""
    s = voxel_size // 5
    dim = im * 2
    flat = im * 4 + dim * 4 + im * 4
    shapes = {
        "input_preprocess.conv3d.weight": (im, 10, 1, 1, 1),
        "input_preprocess.conv3d.bias": (im,),
        "patchify.conv3d.weight": (im, im, 5, 5, 5),
        "patchify.conv3d.bias": (im,),
        "proprio_preprocess.linear.weight": (im, low_dim),
        "proprio_preprocess.linear.bias": (im,),
        "lang_preprocess.weight": (dim, 512),
        "lang_preprocess.bias": (dim,),
        "pos_encoding": (1, 77 + s ** 3, dim),
        "latents": (latents, latent_dim),
        "cross_attend_blocks.0.norm.weight": (latent_dim,),
        "cross_attend_blocks.0.norm.bias": (latent_dim,),
        "cross_attend_blocks.0.norm_context.weight": (dim,),
        "cross_attend_blocks.0.norm_context.bias": (dim,),
        "cross_attend_blocks.0.fn.to_q.weight": (64, latent_dim),
        "cross_attend_blocks.0.fn.to_kv.weight": (128, dim),
        "cross_attend_blocks.0.fn.to_out.weight": (latent_dim, 64),
        "cross_attend_blocks.0.fn.to_out.bias": (latent_dim,),
        "cross_attend_blocks.1.norm.weight": (latent_dim,),
        "cross_attend_blocks.1.norm.bias": (latent_dim,),
        "cross_attend_blocks.1.fn.net.0.weight": (latent_dim * 8, latent_dim),
        "cross_attend_blocks.1.fn.net.0.bias": (latent_dim * 8,),
        "cross_attend_blocks.1.fn.net.2.weight": (latent_dim, latent_dim * 4),
        "cross_attend_blocks.1.fn.net.2.bias": (latent_dim,),
        "decoder_cross_attn.norm.weight": (dim,),
        "decoder_cross_attn.norm.bias": (dim,),
        "decoder_cross_attn.norm_context.weight": (latent_dim,),
        "decoder_cross_attn.norm_context.bias": (latent_dim,),
        "decoder_cross_attn.fn.to_q.weight": (64, dim),
        "decoder_cross_attn.fn.to_kv.weight": (128, latent_dim),
        "decoder_cross_attn.fn.to_out.weight": (dim, 64),
        "decoder_cross_attn.fn.to_out.bias": (dim,),
        "up0.conv_up.0.conv3d.weight": (im, dim, 5, 5, 5),
        "up0.conv_up.0.conv3d.bias": (im,),
        "up0.conv_up.2.conv3d.weight": (im, im, 5, 5, 5),
        "up0.conv_up.2.conv3d.bias": (im,),
        "final.conv3d.weight": (im, im * 2, 3, 3, 3),
        "final.conv3d.bias": (im,),
        "trans_decoder.conv3d.weight": (1, im, 3, 3, 3),
        "trans_decoder.conv3d.bias": (1,),
        "dense0.linear.weight": (256, flat),
        "dense0.linear.bias": (256,),
        "dense1.linear.weight": (im, 256),
        "dense1.linear.bias": (im,),
        "rot_grip_collision_ff.linear.weight": (220, im),
        "rot_grip_collision_ff.linear.bias": (220,),
    }
    for i in range(depth):
        shapes.update({
            f"layers.{i}.0.norm.weight": (latent_dim,),
            f"layers.{i}.0.norm.bias": (latent_dim,),
            f"layers.{i}.0.fn.to_q.weight": (latent_dim, latent_dim),
            f"layers.{i}.0.fn.to_kv.weight": (latent_dim * 2, latent_dim),
            f"layers.{i}.0.fn.to_out.weight": (latent_dim, latent_dim),
            f"layers.{i}.0.fn.to_out.bias": (latent_dim,),
            f"layers.{i}.1.norm.weight": (latent_dim,),
            f"layers.{i}.1.norm.bias": (latent_dim,),
            f"layers.{i}.1.fn.net.0.weight": (latent_dim * 8, latent_dim),
            f"layers.{i}.1.fn.net.0.bias": (latent_dim * 8,),
            f"layers.{i}.1.fn.net.2.weight": (latent_dim, latent_dim * 4),
            f"layers.{i}.1.fn.net.2.bias": (latent_dim,),
        })
    if arm_pred:
        shapes.update({
            "dense2.linear.weight": (im, flat),
            "dense2.linear.bias": (im,),
            "arm_ff.linear.weight": (2, im),
            "arm_ff.linear.bias": (2,),
        })
    return shapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--arm-pred", action="store_true")
    ap.add_argument("--two-arm", action="store_true")
    args = ap.parse_args()

    import torch
    from flax import serialization

    sd = torch.load(args.ckpt, map_location="cpu")
    params = map_reference_qattention(sd, args.depth, args.arm_pred,
                                      args.two_arm)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": serialization.to_state_dict(params), "step": 0}))
    print(f"ported {args.ckpt} -> {args.out}")


if __name__ == "__main__":
    main()
