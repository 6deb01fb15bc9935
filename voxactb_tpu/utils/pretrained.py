"""Pretrained-weights discovery + loaders for the language / vision towers.

This image ships no pretrained checkpoints (zero egress), so every tower runs
random-init by default — fine for memorization tests, but the reference conditions
on REAL CLIP RN50 language (launch_utils.py:384-400) and drives grid recentering
with real OWL-ViT + SAM (vlm.py:77-143). This module is the single hook through
which real weights enter when they exist on disk:

    export VOXACTB_WEIGHTS_DIR=/path/to/weights   # or drop files in repo weights/

Recognized files (first match wins):
    clip_rn50.pt | RN50.pt            OpenAI CLIP RN50 (state_dict or jit archive)
    sam_vit_b.pth | sam_vit_l.pth | sam_vit_h.pth   segment-anything checkpoints
    owlvit_base.pt                    transformers OwlViTForObjectDetection state_dict
"""

from __future__ import annotations

import os
from typing import Optional

_CANDIDATES = {
    "clip": ("clip_rn50.pt", "RN50.pt"),
    "sam_vit_b": ("sam_vit_b.pth",),
    "sam_vit_l": ("sam_vit_l.pth",),
    "sam_vit_h": ("sam_vit_h.pth",),
    "owlvit": ("owlvit_base.pt",),
}


def weights_dir() -> str:
    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "weights")
    return os.environ.get("VOXACTB_WEIGHTS_DIR", default)


def find_weights(name: str) -> Optional[str]:
    """Path of a recognized checkpoint for ``name`` (see _CANDIDATES), or None."""
    d = weights_dir()
    for fname in _CANDIDATES.get(name, ()):
        p = os.path.join(d, fname)
        if os.path.exists(p):
            return p
    return None


def _torch_state_dict(path: str):
    """Load a torch checkpoint as a state_dict of tensors/arrays.

    Handles plain state_dicts, {'state_dict'|'model': ...} wrappers, and OpenAI's
    TorchScript archives (the reference's load path, clip.py:559-607, tries jit
    first then falls back to a state_dict)."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()
    if isinstance(obj, dict):
        for key in ("state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return obj


def load_clip_text(path: Optional[str] = None):
    """(ClipTextEncoder at RN50 text dims, ported params) from a CLIP checkpoint.
    Returns None when no checkpoint is found."""
    path = path or find_weights("clip")
    if path is None:
        return None
    from voxactb_tpu.models.clip_text import (
        ClipTextEncoder,
        load_torch_clip_weights,
    )

    sd = _torch_state_dict(path)
    params = load_torch_clip_weights(sd)
    width = params["params"]["positional_embedding"].shape[1]
    layers = sum(1 for k in params["params"] if k.startswith("resblock_"))
    embed = params["params"]["text_projection"].shape[1]
    vocab = params["params"]["token_embedding"].shape[0]
    ctx = params["params"]["positional_embedding"].shape[0]
    heads = width // 64
    model = ClipTextEncoder(vocab_size=vocab, context_length=ctx, width=width,
                            heads=heads, layers=layers, embed_dim=embed)
    return model, params


def load_clip_image(path: Optional[str] = None):
    """(ClipResNetImageEncoder RN50, ported variables incl. batch_stats), or None."""
    path = path or find_weights("clip")
    if path is None:
        return None
    from voxactb_tpu.models.clip_image import (
        ClipResNetImageEncoder,
        load_torch_clip_image_weights,
    )

    sd = _torch_state_dict(path)
    variables = load_torch_clip_image_weights(sd)
    stem = variables["params"]["stem_conv1"]["kernel"].shape[-1]
    model = ClipResNetImageEncoder(width=stem * 2)
    return model, variables


def load_sam_encoder(size: str = "vit_h", path: Optional[str] = None):
    """(SamImageEncoder of the requested size, ported params), or None."""
    path = path or find_weights(f"sam_{size}")
    if path is None:
        return None
    from voxactb_tpu.models import sam_encoder as se

    sd = _torch_state_dict(path)
    params = se.load_torch_sam_weights(sd)
    model = {"vit_b": se.sam_vit_b, "vit_l": se.sam_vit_l,
             "vit_h": se.sam_vit_h}[size]()
    return model, params


def load_owlvit(path: Optional[str] = None):
    """((OwlViTDetector, det params), (ClipTextEncoder, text params)), or None."""
    path = path or find_weights("owlvit")
    if path is None:
        return None
    from voxactb_tpu.models.clip_text import ClipTextEncoder
    from voxactb_tpu.models.owlvit import (
        OwlViTDetector,
        OwlViTImageEncoder,
        load_hf_owlvit_weights,
    )

    sd = _torch_state_dict(path)
    det_params, text_params = load_hf_owlvit_weights(sd)
    vp = det_params["params"]["image_encoder"]
    dim = vp["cls_token"].shape[-1]
    depth = sum(1 for k in vp if k.startswith("block_"))
    n_pos = vp["pos_embed"].shape[1] - 1
    patch = vp["patch_embed"]["kernel"].shape[0]
    img = int(round(n_pos ** 0.5)) * patch
    tp = text_params["params"]
    embed = tp["text_projection"].shape[1]
    det = OwlViTDetector(
        embed_dim=embed,
        image_encoder=OwlViTImageEncoder(
            img_size=img, patch=patch, dim=dim, depth=depth,
            heads=max(1, dim // 64)))
    text = ClipTextEncoder(
        vocab_size=tp["token_embedding"].shape[0],
        context_length=tp["positional_embedding"].shape[0],
        width=tp["positional_embedding"].shape[1],
        heads=max(1, tp["positional_embedding"].shape[1] // 64),
        layers=sum(1 for k in tp if k.startswith("resblock_")),
        embed_dim=embed)
    return (det, det_params), (text, text_params)
