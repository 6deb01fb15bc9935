"""OWL-ViT open-vocabulary detector in flax.

Counterpart of the transformers OWL-ViT the reference queries for task-object boxes
(rlbench/backend/vlm.py:77-115). Standard public architecture: a CLIP-style ViT image
tower whose PATCH tokens (not a pooled CLS) feed two heads — a class head scoring each
patch-query against text embeddings (scaled cosine logits with a learned shift) and a
box head (MLP -> cxcywh, biased toward each token's grid position). The text tower is
the CLIP text transformer (models/clip_text.py). Tiny configs run in tests; a weight
importer maps a transformers ``OwlViTForObjectDetection`` state_dict.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from voxactb_tpu.models.clip_text import ClipTextEncoder, quick_gelu


class ViTBlock(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, -1)
        hd = d // self.heads

        def split(a):
            return a.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q * hd ** -0.5, k,
                       preferred_element_type=jnp.float32), -1).astype(v.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(o)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(4 * d, dtype=self.dtype, name="fc1")(y)
        x = x + nn.Dense(d, dtype=self.dtype, name="fc2")(quick_gelu(y))
        return x


class OwlViTImageEncoder(nn.Module):
    """CLIP ViT tower returning per-patch feature tokens (CLS merged, OWL-style)."""

    img_size: int = 768
    patch: int = 32
    dim: int = 768
    depth: int = 12
    heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3]
        b = x.shape[0]
        g = self.img_size // self.patch
        x = nn.Conv(self.dim, (self.patch,) * 2, strides=(self.patch,) * 2,
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    name="patch_embed")(x)
        tokens = x.reshape(b, g * g, self.dim)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)).astype(self.dtype), tokens], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g * g + 1, self.dim))
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_ln")(
            tokens + pos.astype(self.dtype))
        for i in range(self.depth):
            tokens = ViTBlock(self.dim, self.heads, self.dtype,
                              name=f"block_{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_ln")(tokens)
        # OWL-ViT merges the CLS token into patch tokens multiplicatively
        cls_tok, patches = tokens[:, :1], tokens[:, 1:]
        return (patches * cls_tok).astype(jnp.float32)  # [B, g*g, dim]


class OwlViTDetector(nn.Module):
    """Patch tokens + text embeddings -> per-query logits + boxes (cxcywh, [0,1])."""

    embed_dim: int = 512
    image_encoder: Optional[OwlViTImageEncoder] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision = self.image_encoder or OwlViTImageEncoder(dtype=self.dtype)
        self.merged_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.class_proj = nn.Dense(self.embed_dim, use_bias=False,
                                   dtype=self.dtype)
        self.logit_shift = nn.Dense(1, dtype=self.dtype)
        self.logit_scale_head = nn.Dense(1, dtype=self.dtype)
        self.box_head = nn.Sequential([
            nn.Dense(self.vision.dim, dtype=self.dtype), jax.nn.gelu,
            nn.Dense(self.vision.dim, dtype=self.dtype), jax.nn.gelu,
            nn.Dense(4, dtype=self.dtype),
        ])

    def _box_bias(self, g: int):
        # each token is biased toward its own grid cell (OWL's compute_box_bias)
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        cx, cy = jnp.meshgrid(xs, xs, indexing="xy")
        centers = jnp.stack([cx.reshape(-1), cy.reshape(-1)], -1)
        centers = jnp.clip(centers, 1e-4, 1 - 1e-4)
        size = jnp.full_like(centers, 1.0 / g)
        bias = jnp.concatenate([jnp.log(centers / (1 - centers)),
                                jnp.log(size / (1 - size))], -1)
        return bias  # [g*g, 4] in logit space

    def __call__(self, image, text_embeds):
        """image [B,H,W,3]; text_embeds [Q, embed_dim] (from the CLIP text tower).

        Returns (logits [B, tokens, Q], boxes [B, tokens, 4] cxcywh in [0,1]).
        """
        feats = self.vision(image)                  # [B, T, D]
        b, t, d = feats.shape
        g = int(np.sqrt(t))
        feats_ln = self.merged_ln(feats.astype(self.dtype))

        # class head: scaled cosine similarity with learned shift/scale
        q_emb = self.class_proj(feats_ln)
        q_emb = q_emb / (jnp.linalg.norm(q_emb, axis=-1, keepdims=True) + 1e-6)
        txt = text_embeds / (jnp.linalg.norm(text_embeds, axis=-1,
                                             keepdims=True) + 1e-6)
        sims = jnp.einsum("btd,qd->btq", q_emb, txt.astype(q_emb.dtype),
                          preferred_element_type=jnp.float32)
        shift = self.logit_shift(feats_ln)
        scale = jax.nn.elu(self.logit_scale_head(feats_ln)) + 1.0
        logits = (sims + shift) * scale

        box_logits = self.box_head(feats_ln) + self._box_bias(g)[None]
        boxes = jax.nn.sigmoid(box_logits)
        return logits.astype(jnp.float32), boxes.astype(jnp.float32)


class OwlViTPipeline:
    """Text query -> best box, mirroring get_bounding_box_using_owl_vit
    (vlm.py:77-115). Usable as the box source for SamSegmenter."""

    def __init__(self, detector: OwlViTDetector, det_params,
                 text_encoder: Optional[ClipTextEncoder] = None,
                 text_params=None, tokenizer=None, img_size: int = 768):
        self._det = detector
        self._det_params = det_params
        self._text = text_encoder or ClipTextEncoder(embed_dim=detector.embed_dim)
        self._text_params = text_params
        self._tokenizer = tokenizer
        self._img_size = img_size
        self._jit_det = jax.jit(detector.apply)
        self._jit_text = jax.jit(self._text.apply) if text_params else None

    def embed_queries(self, queries: Sequence[str]) -> np.ndarray:
        if self._jit_text is None:
            raise RuntimeError("no text tower weights supplied")
        if self._tokenizer is None:
            from voxactb_tpu.utils.bpe import SimpleTokenizer

            self._tokenizer = SimpleTokenizer()
        tokens = jnp.asarray(self._tokenizer.tokenize(list(queries)))
        sent, _ = self._jit_text(self._text_params, tokens)
        return np.asarray(sent)

    def detect(self, rgb: np.ndarray, text_embeds: np.ndarray,
               score_threshold: float = 0.1):
        """-> (box_xyxy in source pixels, score) for the best query match."""
        h, w = rgb.shape[:2]
        x = jnp.asarray(rgb, jnp.float32)[None] / 255.0
        x = jax.image.resize(x, (1, self._img_size, self._img_size, 3), "linear")
        logits, boxes = self._jit_det(self._det_params, x,
                                      jnp.asarray(text_embeds))
        probs = jax.nn.sigmoid(np.asarray(logits)[0])  # [T, Q]
        best = np.unravel_index(np.argmax(probs), probs.shape)
        score = float(probs[best])
        if score < score_threshold:
            raise ValueError(f"no detection above {score_threshold} "
                             f"(best {score:.3f})")
        cx, cy, bw, bh = np.asarray(boxes)[0, best[0]]
        box = np.array([(cx - bw / 2) * w, (cy - bh / 2) * h,
                        (cx + bw / 2) * w, (cy + bh / 2) * h])
        return np.clip(box, 0, [w, h, w, h]), score
