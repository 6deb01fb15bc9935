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

from voxactb_tpu.models.torch_port import make_port_helpers

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
        self.vision = self.image_encoder or OwlViTImageEncoder(
            dtype=self.dtype, name="image_encoder")
        self.merged_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.class_proj = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.logit_shift = nn.Dense(1, dtype=self.dtype)
        self.logit_scale_head = nn.Dense(1, dtype=self.dtype)
        # exact (erf) gelu between the box-head layers: transformers' nn.GELU()
        self.box_dense0 = nn.Dense(self.vision.dim, dtype=self.dtype)
        self.box_dense1 = nn.Dense(self.vision.dim, dtype=self.dtype)
        self.box_dense2 = nn.Dense(4, dtype=self.dtype)

    def box_head(self, x):
        x = jax.nn.gelu(self.box_dense0(x), approximate=False)
        x = jax.nn.gelu(self.box_dense1(x), approximate=False)
        return self.box_dense2(x)

    def _box_bias(self, g: int):
        # each token is biased toward its own grid cell; the corner-coordinate +
        # epsilon'd logit formula follows transformers' compute_box_bias
        # (modeling_owlvit.py normalize_grid_corner_coordinates): coords are the
        # CELL CORNERS arange(1..g)/g, and the bias is log(c+1e-4)-log1p(-c+1e-4).
        xs = jnp.arange(1, g + 1, dtype=jnp.float32) / g
        cx, cy = jnp.meshgrid(xs, xs, indexing="xy")
        coords = jnp.stack([cx.reshape(-1), cy.reshape(-1)], -1)
        coords = jnp.clip(coords, 0.0, 1.0)
        coord_bias = jnp.log(coords + 1e-4) - jnp.log1p(-coords + 1e-4)
        size = jnp.full_like(coords, 1.0 / g)
        size_bias = jnp.log(size + 1e-4) - jnp.log1p(-size + 1e-4)
        return jnp.concatenate([coord_bias, size_bias], -1)  # [g*g, 4]

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


def load_hf_owlvit_weights(state_dict):
    """Map a transformers ``OwlViTForObjectDetection`` state_dict onto this stack.

    Returns ``(detector_params, text_params)``: the first loads
    :class:`OwlViTDetector` (vision tower + class/box heads), the second loads
    :class:`~voxactb_tpu.models.clip_text.ClipTextEncoder` configured with the
    checkpoint's text dims (the OWL text tower is CLIP's, context length 16).
    """
    import numpy as np

    a, dense, ln, _, _ = make_port_helpers(state_dict)

    def vit_blocks(prefix, names):
        """Shared CLIP-style encoder-layer mapping (vision 'block_i'/text 'resblock_i')."""
        out = {}
        lp = prefix + "encoder.layers."
        depth = max(int(k[len(lp):].split(".")[0]) for k in state_dict
                    if k.startswith(lp)) + 1
        for i in range(depth):
            p = f"{prefix}encoder.layers.{i}."
            qkv_w = np.concatenate(
                [a(p + f"self_attn.{h}_proj.weight").T for h in ("q", "k", "v")],
                axis=1)
            qkv_b = np.concatenate(
                [a(p + f"self_attn.{h}_proj.bias") for h in ("q", "k", "v")])
            out[names["block"].format(i)] = {
                names["ln1"]: ln(p + "layer_norm1"),
                names["ln2"]: ln(p + "layer_norm2"),
                names["qkv"]: {"kernel": qkv_w, "bias": qkv_b},
                names["proj"]: dense(p + "self_attn.out_proj"),
                names["fc1"]: dense(p + "mlp.fc1"),
                names["fc2"]: dense(p + "mlp.fc2"),
            }
        return out

    v = "owlvit.vision_model."
    vision = {
        "patch_embed": {
            "kernel": a(v + "embeddings.patch_embedding.weight").transpose(
                2, 3, 1, 0)},
        "cls_token": a(v + "embeddings.class_embedding").reshape(1, 1, -1),
        "pos_embed": a(v + "embeddings.position_embedding.weight")[None],
        "pre_ln": ln(v + "pre_layernorm"),
        "post_ln": ln(v + "post_layernorm"),
    }
    vision.update(vit_blocks(v, {"block": "block_{}", "ln1": "ln1", "ln2": "ln2",
                                 "qkv": "qkv", "proj": "proj",
                                 "fc1": "fc1", "fc2": "fc2"}))

    det_params = {"params": {
        "image_encoder": vision,
        "merged_ln": ln("layer_norm"),
        "class_proj": dense("class_head.dense0"),
        "logit_shift": dense("class_head.logit_shift"),
        "logit_scale_head": dense("class_head.logit_scale"),
        "box_dense0": dense("box_head.dense0"),
        "box_dense1": dense("box_head.dense1"),
        "box_dense2": dense("box_head.dense2"),
    }}

    t = "owlvit.text_model."
    text = {
        "token_embedding": a(t + "embeddings.token_embedding.weight"),
        "positional_embedding": a(t + "embeddings.position_embedding.weight"),
        "ln_final": ln(t + "final_layer_norm"),
        "text_projection": a("owlvit.text_projection.weight").T,
    }
    text.update(vit_blocks(t, {"block": "resblock_{}", "ln1": "ln_1",
                               "ln2": "ln_2", "qkv": "attn_in",
                               "proj": "attn_out", "fc1": "mlp_fc",
                               "fc2": "mlp_proj"}))
    return det_params, {"params": text}


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
