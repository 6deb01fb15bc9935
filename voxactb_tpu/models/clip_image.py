"""CLIP ModifiedResNet (RN50) image tower in flax.

Counterpart of the vendored CLIP visual side (peract/helpers/clip/core/clip.py:
``ModifiedResNet`` — 3-conv stem with blur-free avgpool striding, 4 bottleneck stages,
``AttentionPool2d`` head projecting to the 1024-d joint space). The reference's
CLIP-UNet fusion baselines consume both the pooled embedding and the intermediate
stage features, so ``__call__`` can return the pyramid too.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from voxactb_tpu.models.torch_port import make_port_helpers


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        identity = x

        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = jax.nn.relu(y)
        if self.stride > 1:  # CLIP's anti-aliased striding: avgpool then conv
            y = nn.avg_pool(y, (self.stride,) * 2, strides=(self.stride,) * 2)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn3")(y)

        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = nn.avg_pool(x, (self.stride,) * 2,
                                   strides=(self.stride,) * 2) \
                if self.stride > 1 else x
            identity = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return jax.nn.relu(y + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, 1+HW, C]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5),
                         (h * w + 1, c))
        tokens = tokens + pos[None].astype(self.dtype)

        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        hd = c // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q * hd ** -0.5, k,
                       preferred_element_type=jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name="c_proj")(out)[:, 0].astype(jnp.float32)


class ClipResNetImageEncoder(nn.Module):
    """RN50: layers (3,4,6,3), width 64, embed 1024, input 224^2."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_pyramid: bool = False):
        # 3-conv stem (clip.py ModifiedResNet.stem). Padding is explicit (1, 1):
        # torch's pad=1 is symmetric even at stride 2, where XLA's "SAME" pads
        # asymmetrically (0 left, 1 right) — a one-pixel window shift that breaks
        # weight-level parity with the reference tower.
        for i, (ch, stride) in enumerate(
                [(self.width // 2, 2), (self.width // 2, 1), (self.width, 1)]):
            x = nn.Conv(ch, (3, 3), strides=(stride,) * 2,
                        padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype, name=f"stem_conv{i+1}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"stem_bn{i+1}")(x)
            x = jax.nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        pyramid = []
        planes = self.width
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(planes, stride, dtype=self.dtype,
                           name=f"layer{stage+1}_0")(x, train)
            for bidx in range(1, blocks):
                x = Bottleneck(planes, 1, dtype=self.dtype,
                               name=f"layer{stage+1}_{bidx}")(x, train)
            pyramid.append(x)
            planes *= 2

        emb = AttentionPool2d(
            embed_dim=self.width * 32, num_heads=self.heads,
            output_dim=self.output_dim, dtype=self.dtype, name="attnpool")(x)
        if return_pyramid:
            return emb, pyramid
        return emb


def load_torch_clip_image_weights(state_dict, prefix: str = "visual.") -> dict:
    """Map the reference CLIP ``ModifiedResNet`` state_dict onto this module.

    Accepts the full CLIP state_dict (keys ``visual.*``, clip.py:311-365) or a bare
    ``ModifiedResNet`` one (``prefix=""``); values may be torch tensors or numpy.
    Returns ``{"params": ..., "batch_stats": ...}`` — BatchNorm running stats land in
    the ``batch_stats`` collection so eval-mode forwards reproduce the torch tower.
    """

    a = make_port_helpers(state_dict, prefix)[0]

    def conv(key):  # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
        return {"kernel": a(key + ".weight").transpose(2, 3, 1, 0)}

    def bn(key):
        return ({"scale": a(key + ".weight"), "bias": a(key + ".bias")},
                {"mean": a(key + ".running_mean"), "var": a(key + ".running_var")})

    params, stats = {}, {}
    for i in (1, 2, 3):
        params[f"stem_conv{i}"] = conv(f"conv{i}")
        params[f"stem_bn{i}"], stats[f"stem_bn{i}"] = bn(f"bn{i}")

    layer_blocks = {}
    for k in state_dict:
        kk = k[len(prefix):] if k.startswith(prefix) else None
        if kk and kk.startswith("layer"):
            stage = int(kk[5])
            blk = int(kk.split(".")[1])
            layer_blocks[stage] = max(layer_blocks.get(stage, 0), blk + 1)
    for stage, blocks in sorted(layer_blocks.items()):
        for b in range(blocks):
            p = f"layer{stage}.{b}"
            leaf, bstats = {}, {}
            for c in ("conv1", "conv2", "conv3"):
                leaf[c] = conv(f"{p}.{c}")
            for c in ("bn1", "bn2", "bn3"):
                leaf[c], bstats[c] = bn(f"{p}.{c}")
            if prefix + f"{p}.downsample.0.weight" in state_dict:
                leaf["downsample_conv"] = conv(f"{p}.downsample.0")
                leaf["downsample_bn"], bstats["downsample_bn"] = bn(
                    f"{p}.downsample.1")
            params[f"layer{stage}_{b}"] = leaf
            stats[f"layer{stage}_{b}"] = bstats

    params["attnpool"] = {
        "positional_embedding": a("attnpool.positional_embedding"),
    }
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        params["attnpool"][proj] = {
            "kernel": a(f"attnpool.{proj}.weight").T,
            "bias": a(f"attnpool.{proj}.bias"),
        }
    return {"params": params, "batch_stats": stats}


CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_clip_image(rgb: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 [H,W,3] -> normalized [1,size,size,3] (bicubic resize, center values)."""
    x = jnp.asarray(rgb, jnp.float32) / 255.0
    x = jax.image.resize(x, (size, size, 3), method="cubic")
    x = (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return np.asarray(x[None])
