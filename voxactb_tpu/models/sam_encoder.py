"""SAM image encoder (ViT-det with windowed attention) in flax.

The reference drives grid recentering through facebook's segment-anything ViT-H
checkpoint (RLBench/rlbench/backend/vlm.py:117-143). This is the TPU-native encoder:
ViT with 16x16 patch embed, decomposed relative position attention, window attention
except at the four global blocks, and the 256-channel conv neck — the standard public
SAM architecture. ``sam_vit_h()/l()/b()`` build the released sizes;
``load_torch_sam_weights`` maps a segment-anything ``state_dict`` onto the module for
checkpoint parity when weights are locally available (this image has no network
egress, so tests run tiny randomly-initialized configs).

TPU notes: channels-last everywhere; attention is batched over windows (64 windows of
14x14=196 tokens for ViT-H at 1024^2), which XLA tiles as clean batched matmuls; use
``dtype=bfloat16`` for MXU throughput with f32 softmax.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from voxactb_tpu.models.torch_port import make_port_helpers


def _rel_pos_embed(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Interpolate/select relative position embeddings (SAM's get_rel_pos)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class WindowAttention(nn.Module):
    """Multi-head attention with decomposed relative positions over a 2D token grid."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    fused_global: bool = False   # pallas kernel: logits never hit HBM
    fused_interpret: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each [B, HW, heads, hd]
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        scale = head_dim ** -0.5

        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim))

        # fast path for the big GLOBAL blocks: the XLA formulation below
        # materializes f32 [B, heads, HW, HW] logits (+ their 6-D rel-pos
        # broadcast view) in HBM — ~1 GB each for ViT-H at 1024^2. The pallas
        # kernel (ops/pallas/sam_attention.py) folds the decomposed bias into
        # the QK contraction and keeps logits in VMEM.
        use_fused = (self.fused_global and self.use_rel_pos
                     and not self.is_initializing()
                     and self.dtype == jnp.bfloat16)
        if use_fused:
            from voxactb_tpu.ops.pallas.sam_attention import (
                global_rel_attention,
            )

            Rh = _rel_pos_embed(h, h, rel_h.astype(jnp.float32))
            Rw = _rel_pos_embed(w, w, rel_w.astype(jnp.float32))
            rq = q.reshape(b, self.num_heads, h, w, head_dim).astype(
                jnp.float32)
            rel_h_term = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh).reshape(
                b * self.num_heads, h * w, h)
            rel_w_term = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw).reshape(
                b * self.num_heads, h * w, w)
            flat = lambda t: t.reshape(b * self.num_heads, h * w, head_dim)
            out = global_rel_attention(
                flat(q * scale), flat(k), flat(v), rel_h_term, rel_w_term,
                kh=h, kw=w, interpret=self.fused_interpret)
            out = out.reshape(b, self.num_heads, h * w, head_dim)
        else:
            attn = jnp.einsum("bhid,bhjd->bhij", q * scale, k,
                              preferred_element_type=jnp.float32)
            if self.use_rel_pos:
                Rh = _rel_pos_embed(h, h, rel_h.astype(jnp.float32))  # [h,h,hd]
                Rw = _rel_pos_embed(w, w, rel_w.astype(jnp.float32))
                rq = q.reshape(b, self.num_heads, h, w, head_dim).astype(
                    jnp.float32)
                rel_h_term = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh)
                rel_w_term = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw)
                attn = attn.reshape(b, self.num_heads, h, w, h, w)
                attn = attn + rel_h_term[..., :, None] + rel_w_term[..., None, :]
                attn = attn.reshape(b, self.num_heads, h * w, h * w)

            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def window_partition(x, window: int):
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return windows, (hp, wp)


def window_unpartition(windows, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SamBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 14       # 0 => global attention
    grid_size: Tuple[int, int] = (64, 64)
    mlp_ratio: float = 4.0
    fused_global: bool = False
    fused_windowed: bool = False
    fused_interpret: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            hw = y.shape[1:3]
            y, pad_hw = window_partition(y, self.window_size)
            inp = (self.window_size, self.window_size)
        else:
            inp = self.grid_size
        # the kernel is shape-generic: the windowed blocks' [nW*heads, 196,
        # 196] f32 logits (+ the 6-D rel-pos broadcast view) are smaller per
        # block than the global blocks' but there are 28 of them — fusing
        # them is the same VMEM-resident-logits win at kh=kw=window
        fuse = (self.fused_global if self.window_size == 0
                else self.fused_windowed)
        y = WindowAttention(self.dim, self.num_heads, input_size=inp,
                            fused_global=fuse,
                            fused_interpret=self.fused_interpret,
                            dtype=self.dtype, name="attn")(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, hw)
        x = shortcut + y

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class SamImageEncoder(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (7, 15, 23, 31)
    out_chans: int = 256
    # fused global-attention kernel: engages only at bf16 (the perf dtype);
    # f32 runs (parity tests vs torch) keep the XLA formulation
    fused_global: bool = True
    # same kernel for the 28 windowed blocks (kh=kw=window); default follows
    # the on-chip A/B (tools/profile_sam.py)
    fused_windowed: bool = False
    fused_interpret: bool = False
    # profiling hooks (tools/profile_sam.py --stage): run only the first
    # ``depth_limit`` blocks / skip the neck, so stage costs can be attributed
    # by DIFFERENCES of full-encoder runs (per-block chains keep activations
    # resident and miss the real HBM pressure). -1 = full depth.
    depth_limit: int = -1
    skip_neck: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 3] normalized
        g = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, self.embed_dim))
        x = x + pos.astype(self.dtype)

        run_depth = self.depth if self.depth_limit < 0 else self.depth_limit
        for i in range(run_depth):
            x = SamBlock(
                self.embed_dim, self.num_heads,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                grid_size=(g, g), fused_global=self.fused_global,
                fused_windowed=self.fused_windowed,
                fused_interpret=self.fused_interpret,
                dtype=self.dtype, name=f"block_{i}",
            )(x)

        if self.skip_neck:
            return x.astype(jnp.float32)
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN, to 256 channels
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln2")(x)
        return x.astype(jnp.float32)  # [B, g, g, 256]


def sam_vit_h(dtype=jnp.float32, **kw) -> SamImageEncoder:
    return SamImageEncoder(embed_dim=1280, depth=32, num_heads=16,
                           global_attn_indexes=(7, 15, 23, 31), dtype=dtype,
                           **kw)


def sam_vit_l(dtype=jnp.float32) -> SamImageEncoder:
    return SamImageEncoder(embed_dim=1024, depth=24, num_heads=16,
                           global_attn_indexes=(5, 11, 17, 23), dtype=dtype)


def sam_vit_b(dtype=jnp.float32) -> SamImageEncoder:
    return SamImageEncoder(embed_dim=768, depth=12, num_heads=12,
                           global_attn_indexes=(2, 5, 8, 11), dtype=dtype)


SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def preprocess_image(rgb: np.ndarray, img_size: int = 1024) -> np.ndarray:
    """uint8 RGB [H,W,3] -> normalized, resized+padded [1, img_size, img_size, 3]."""
    import jax.image as jimage

    h, w = rgb.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jnp.asarray(rgb, jnp.float32)
    x = jimage.resize(x, (nh, nw, 3), method="linear")
    x = (x - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    out = jnp.zeros((img_size, img_size, 3), jnp.float32)
    out = out.at[:nh, :nw].set(x)
    return np.asarray(out[None])


def load_hf_sam_vision_weights(state_dict) -> dict:
    """Map a transformers ``SamModel`` / ``SamVisionModel`` vision-encoder
    state_dict (``vision_encoder.*`` keys, modeling_sam.py naming) onto
    :class:`SamImageEncoder`. Same math as the facebook layout importer below —
    only the key names differ (``patch_embed.projection`` vs ``patch_embed.proj``,
    ``layers.N.layer_norm1`` vs ``blocks.N.norm1``, ``neck.layer_norm1`` vs
    ``neck.1`` ...)."""

    a = make_port_helpers(state_dict)[0]

    p = "vision_encoder."
    params = {
        "patch_embed": {
            "kernel": a(p + "patch_embed.projection.weight").transpose(2, 3, 1, 0),
            "bias": a(p + "patch_embed.projection.bias"),
        },
        "pos_embed": a(p + "pos_embed"),
        "neck_conv1": {"kernel": a(p + "neck.conv1.weight").transpose(2, 3, 1, 0)},
        "neck_ln1": {"scale": a(p + "neck.layer_norm1.weight"),
                     "bias": a(p + "neck.layer_norm1.bias")},
        "neck_conv2": {"kernel": a(p + "neck.conv2.weight").transpose(2, 3, 1, 0)},
        "neck_ln2": {"scale": a(p + "neck.layer_norm2.weight"),
                     "bias": a(p + "neck.layer_norm2.bias")},
    }
    depth = max(int(k.split(".")[2]) for k in state_dict
                if k.startswith(p + "layers.")) + 1
    for i in range(depth):
        b = f"{p}layers.{i}."
        params[f"block_{i}"] = {
            "norm1": {"scale": a(b + "layer_norm1.weight"),
                      "bias": a(b + "layer_norm1.bias")},
            "norm2": {"scale": a(b + "layer_norm2.weight"),
                      "bias": a(b + "layer_norm2.bias")},
            "attn": {
                "qkv": {"kernel": a(b + "attn.qkv.weight").T,
                        "bias": a(b + "attn.qkv.bias")},
                "proj": {"kernel": a(b + "attn.proj.weight").T,
                         "bias": a(b + "attn.proj.bias")},
                "rel_pos_h": a(b + "attn.rel_pos_h"),
                "rel_pos_w": a(b + "attn.rel_pos_w"),
            },
            "mlp_fc1": {"kernel": a(b + "mlp.lin1.weight").T,
                        "bias": a(b + "mlp.lin1.bias")},
            "mlp_fc2": {"kernel": a(b + "mlp.lin2.weight").T,
                        "bias": a(b + "mlp.lin2.bias")},
        }
    return {"params": params}


def load_torch_sam_weights(state_dict) -> dict:
    """Map a segment-anything ``image_encoder.*`` state_dict onto SamImageEncoder."""

    a = make_port_helpers(state_dict)[0]

    p = "image_encoder."
    params = {
        "patch_embed": {
            # torch conv [out,in,kh,kw] -> flax [kh,kw,in,out]
            "kernel": a(p + "patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": a(p + "patch_embed.proj.bias"),
        },
        "pos_embed": a(p + "pos_embed"),
        "neck_conv1": {"kernel": a(p + "neck.0.weight").transpose(2, 3, 1, 0)},
        "neck_ln1": {"scale": a(p + "neck.1.weight"), "bias": a(p + "neck.1.bias")},
        "neck_conv2": {"kernel": a(p + "neck.2.weight").transpose(2, 3, 1, 0)},
        "neck_ln2": {"scale": a(p + "neck.3.weight"), "bias": a(p + "neck.3.bias")},
    }
    depth = max(int(k.split(".")[2]) for k in state_dict
                if k.startswith(p + "blocks.")) + 1
    for i in range(depth):
        b = f"{p}blocks.{i}."
        params[f"block_{i}"] = {
            "norm1": {"scale": a(b + "norm1.weight"), "bias": a(b + "norm1.bias")},
            "norm2": {"scale": a(b + "norm2.weight"), "bias": a(b + "norm2.bias")},
            "attn": {
                "qkv": {"kernel": a(b + "attn.qkv.weight").T,
                        "bias": a(b + "attn.qkv.bias")},
                "proj": {"kernel": a(b + "attn.proj.weight").T,
                         "bias": a(b + "attn.proj.bias")},
                "rel_pos_h": a(b + "attn.rel_pos_h"),
                "rel_pos_w": a(b + "attn.rel_pos_w"),
            },
            "mlp_fc1": {"kernel": a(b + "mlp.lin1.weight").T,
                        "bias": a(b + "mlp.lin1.bias")},
            "mlp_fc2": {"kernel": a(b + "mlp.lin2.weight").T,
                        "bias": a(b + "mlp.lin2.bias")},
        }
    return {"params": params}
