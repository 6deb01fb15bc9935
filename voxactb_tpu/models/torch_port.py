"""Shared torch->flax tensor-porting helpers for every weight loader.

Each loader (CLIP text/image, OWL-ViT, SAM encoder/decoder) previously carried
its own copies of these closures; one factory here keeps the porting subtleties
(dense transpose, the ConvTranspose spatial flip) in a single place.
"""

from __future__ import annotations

import numpy as np


def make_port_helpers(state_dict, prefix: str = ""):
    """Returns (a, dense, ln, sam_attn, conv_t) closures over ``state_dict``.

    - ``a(key)``: tensor -> f32 numpy (detaches torch tensors, passes numpy).
    - ``dense(key)``: torch Linear [out, in] -> flax {"kernel" [in, out], "bias"}.
    - ``ln(key)``: torch LayerNorm -> flax {"scale", "bias"}.
    - ``sam_attn(key)``: SAM q/k/v/out projection group.
    - ``conv_t(key)``: torch ConvTranspose2d [in, out, kh, kw] -> flax
      [kh, kw, in, out]. flax's ConvTranspose (lax.conv_transpose,
      transpose_kernel=False) uses the kernel in forward-conv orientation, so
      torch's kernel must be spatially flipped (verified numerically in
      tests/test_hf_tower_parity.py).
    """

    def a(key):
        v = state_dict[prefix + key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    def dense(key):
        return {"kernel": a(key + ".weight").T, "bias": a(key + ".bias")}

    def ln(key):
        return {"scale": a(key + ".weight"), "bias": a(key + ".bias")}

    def sam_attn(key):
        return {"q": dense(key + ".q_proj"), "k": dense(key + ".k_proj"),
                "v": dense(key + ".v_proj"), "out": dense(key + ".out_proj")}

    def conv_t(key):
        w = a(key + ".weight").transpose(2, 3, 0, 1)[::-1, ::-1]
        return {"kernel": np.ascontiguousarray(w), "bias": a(key + ".bias")}

    return a, dense, ln, sam_attn, conv_t
