"""Baseline policy networks: CNN-BC-lang, ViT-BC-lang, and the C2FARM LingUNet Q-net.

Counterparts of the reference baseline zoo (SURVEY §2.1): ``BCLangAgent``'s
CNN+lang+proprio direct regressor (peract/agents/baselines/bc_lang/bc_lang_agent.py:34
over CNNLangAndFcsNet, network_utils.py:393), the ViT variant
(vit_bc_lang/vit_bc_lang_agent.py:34 over ViTLangAndFcsNet :598), and C2FARM's
language-conditioned 3D-UNet Q-attention
(c2farm_lingunet_bc/qattention_lingunet_bc_agent.py:28 + networks.py).
All channels-last flax modules.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from voxactb_tpu.models.blocks import Conv3D, DenseBlock, act_fn


class CnnLangPolicy(nn.Module):
    """Per-camera siamese CNN over rgb(+pcd) -> lang-tiled conv -> MLP action head.

    Action = [xyz(3), quat(4), grip(1)] regressed directly (bc_lang behavior).
    """

    filters: Sequence[int] = (32, 64, 64)
    fc_layers: Sequence[int] = (128, 64)
    action_dim: int = 8
    activation: str = "lrelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgbs, pcds, proprio, lang_goal_emb):
        feats = []
        for rgb, pcd in zip(rgbs, pcds):
            x = jnp.concatenate([rgb, pcd], -1).astype(self.dtype)
            for i, f in enumerate(self.filters):
                x = nn.Conv(f, (3, 3), strides=(2, 2), dtype=self.dtype,
                            name=f"conv_{i}_{len(feats)}")(x)
                x = act_fn(self.activation)(x)
            feats.append(x.mean(axis=(1, 2)))
        h = jnp.concatenate(
            feats + [proprio.astype(self.dtype),
                     lang_goal_emb.astype(self.dtype)], -1)
        for i, f in enumerate(self.fc_layers):
            h = DenseBlock(f, self.activation, self.dtype, name=f"fc_{i}")(h)
        out = DenseBlock(self.action_dim, None, self.dtype, name="head")(h)
        # normalize the quaternion part like the reference's post-processing
        xyz, quat, rest = out[:, :3], out[:, 3:7], out[:, 7:]
        quat = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-8)
        return jnp.concatenate([xyz, quat, rest], -1).astype(jnp.float32)


class ViTLangPolicy(nn.Module):
    """Patch-ViT over concatenated camera images + lang + proprio -> action."""

    patch: int = 8
    dim: int = 128
    depth: int = 4
    heads: int = 4
    action_dim: int = 8
    activation: str = "lrelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgbs, pcds, proprio, lang_goal_emb):
        x = jnp.concatenate(
            [jnp.concatenate([r, p], -1) for r, p in zip(rgbs, pcds)], 2
        ).astype(self.dtype)  # concat cameras along width
        b, h, w, c = x.shape
        x = nn.Conv(self.dim, (self.patch,) * 2, strides=(self.patch,) * 2,
                    padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        tokens = x.reshape(b, -1, self.dim)
        lang = nn.Dense(self.dim, dtype=self.dtype, name="lang_proj")(
            lang_goal_emb.astype(self.dtype))[:, None]
        tokens = jnp.concatenate([lang, tokens], 1)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, tokens.shape[1], self.dim))
        tokens = tokens + pos.astype(self.dtype)
        for i in range(self.depth):
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(tokens)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype, name=f"attn_{i}")(y, y)
            tokens = tokens + y
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(tokens)
            y = nn.Dense(self.dim * 4, dtype=self.dtype)(y)
            y = jax.nn.gelu(y)
            tokens = tokens + nn.Dense(self.dim, dtype=self.dtype)(y)
        h = jnp.concatenate([tokens[:, 0], proprio.astype(self.dtype)], -1)
        out = DenseBlock(self.action_dim, None, self.dtype, name="head")(h)
        xyz, quat, rest = out[:, :3], out[:, 3:7], out[:, 7:]
        quat = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-8)
        return jnp.concatenate([xyz, quat, rest], -1).astype(jnp.float32)


class LingUNetQNet(nn.Module):
    """Language-FiLMed 3D U-Net over the voxel grid -> Q_trans + rot/grip heads.

    The C2FARM-BC lingunet Q-attention counterpart: conv encoder with language
    feature modulation at the bottleneck, transposed decode with skip connections,
    1-channel translation Q head and MLP rot/grip/collision heads.
    """

    base_channels: int = 16
    levels: int = 2
    num_rotation_classes: int = 72
    activation: str = "lrelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxel_grid, proprio, lang_goal_emb):
        x = voxel_grid.astype(self.dtype)
        skips = []
        ch = self.base_channels
        for i in range(self.levels):
            x = Conv3D(ch, 3, 1, self.activation, dtype=self.dtype, name=f"enc_{i}")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            ch *= 2

        # FiLM from language + proprio at the bottleneck
        cond = jnp.concatenate(
            [lang_goal_emb.astype(self.dtype), proprio.astype(self.dtype)], -1)
        gamma = nn.Dense(ch // 2, dtype=self.dtype, name="film_gamma")(cond)
        beta = nn.Dense(ch // 2, dtype=self.dtype, name="film_beta")(cond)
        x = Conv3D(ch // 2, 3, 1, self.activation, dtype=self.dtype, name="bottleneck")(x)
        x = x * (1 + gamma[:, None, None, None]) + beta[:, None, None, None]

        for i in reversed(range(self.levels)):
            b, d, h, w, c = x.shape
            x = jax.image.resize(x, (b, d * 2, h * 2, w * 2, c), "nearest")
            x = jnp.concatenate([x, skips[i]], -1)
            x = Conv3D(max(self.base_channels, c // 2), 3, 1, self.activation,
                       dtype=self.dtype, name=f"dec_{i}")(x)

        q_trans = Conv3D(1, 3, 1, None, dtype=self.dtype, name="trans_head")(
            x).astype(jnp.float32)
        pooled = jnp.max(x, axis=(1, 2, 3)).astype(self.dtype)
        h = DenseBlock(128, self.activation, self.dtype, name="head_fc")(
            jnp.concatenate([pooled, cond], -1))
        rgc = DenseBlock(self.num_rotation_classes * 3 + 4, None, self.dtype,
                         name="rot_grip_collision")(h).astype(jnp.float32)
        return {
            "trans": q_trans,
            "rot_grip": rgc[:, :-2],
            "collision": rgc[:, -2:],
        }
