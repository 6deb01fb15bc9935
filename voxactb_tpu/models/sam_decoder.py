"""SAM prompt encoder (box prompts) + two-way-transformer mask decoder in flax.

Completes the segment-anything path the VLM uses (vlm.py:117-143 feeds OWL-ViT boxes
into SAM): standard public SAM architecture — random-Fourier positional encoding for
prompts, learned corner embeddings for boxes, the no-mask dense embedding added to the
image embedding, a depth-2 two-way transformer between prompt tokens and image
embedding, 4x upscaling, per-mask hypernetwork MLPs, and an IoU prediction head. Box
prompts only (the only prompt type the pipeline needs).

Exactness notes (verified against transformers' SamModel in
tests/test_hf_tower_parity.py): the FIRST two-way block's self-attention REPLACES the
queries (no residual — modeling_sam.py SamTwoWayAttentionBlock.forward), block
LayerNorms use eps 1e-6 while the final-attention LayerNorm keeps torch's default
1e-5, the upscaling LayerNorm uses eps 1e-6, and all GELUs are the exact erf form.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from voxactb_tpu.models.torch_port import make_port_helpers


class RandomFourierPE(nn.Module):
    """SAM's PositionEmbeddingRandom: coords in [0,1]^2 -> [2*feats] features."""

    num_feats: int = 128

    @nn.compact
    def __call__(self, coords):  # [..., 2]
        gauss = self.param("gaussian_matrix",
                           nn.initializers.normal(1.0), (2, self.num_feats))
        proj = (2.0 * coords - 1.0) @ gauss * (2 * np.pi)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)

    def grid(self, h: int, w: int):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # [h, w, 2]
        return self(grid)


class MLP(nn.Module):
    """SamFeedForward: relu MLP (proj_in, layers-2 hidden, proj_out)."""

    hidden: int
    out: int
    layers: int = 3
    sigmoid_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        return jax.nn.sigmoid(x) if self.sigmoid_out else x


class _Attn(nn.Module):
    dim: int
    heads: int
    downsample: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        hd = inner // self.heads
        b = q.shape[0]

        def proj(t, name):
            t = nn.Dense(inner, dtype=self.dtype, name=name)(t)
            return t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = proj(q, "q"), proj(k, "k"), proj(v, "v")
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", qh * hd ** -0.5, kh,
                       preferred_element_type=jnp.float32), -1).astype(vh.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(o)


class TwoWayBlock(nn.Module):
    dim: int
    heads: int
    mlp_dim: int = 2048
    skip_first_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, image, token_pe, image_pe):
        # token self-attention. In the first block (skip_first_pe) the attention
        # output REPLACES the tokens — no residual (SamTwoWayAttentionBlock).
        if self.skip_first_pe:
            attn_out = _Attn(self.dim, self.heads, dtype=self.dtype,
                             name="self_attn")(tokens, tokens, tokens)
            tokens = attn_out
        else:
            q = tokens + token_pe
            tokens = tokens + _Attn(self.dim, self.heads, dtype=self.dtype,
                                    name="self_attn")(q, q, tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(tokens)
        # token -> image cross attention
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(
            tokens + _Attn(self.dim, self.heads, 2, dtype=self.dtype,
                           name="cross_t2i")(tokens + token_pe,
                                             image + image_pe, image))
        # mlp (relu, SamMLPBlock with the mask-decoder config's hidden_act)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype)(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(
            tokens + nn.Dense(self.dim, dtype=self.dtype)(jax.nn.relu(y)))
        # image -> token cross attention
        image = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(
            image + _Attn(self.dim, self.heads, 2, dtype=self.dtype,
                          name="cross_i2t")(image + image_pe,
                                            tokens + token_pe, tokens))
        return tokens, image


class SamMaskDecoder(nn.Module):
    """Box prompt + image embedding [B, g, g, 256] -> masks [B, 4, 4g, 4g] + IoU."""

    dim: int = 256
    heads: int = 8
    depth: int = 2
    num_masks: int = 4  # 1 "whole" + 3 multimask outputs
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, boxes):
        """boxes: [B, 4] normalized (x0, y0, x1, y1) in [0, 1]."""
        b, g, _, c = image_embedding.shape
        pe_layer = RandomFourierPE(self.dim // 2, name="pe")

        # prompt tokens: two box corners with learned corner type embeddings
        corners = boxes.reshape(b, 2, 2)
        corner_pe = pe_layer(corners)  # [B, 2, dim]
        corner_type = self.param("corner_embed",
                                 nn.initializers.normal(1.0), (2, self.dim))
        prompt = corner_pe + corner_type[None]

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_masks, self.dim))
        tokens = jnp.concatenate([
            jnp.broadcast_to(iou_token[None], (b, 1, self.dim)),
            jnp.broadcast_to(mask_tokens[None], (b, self.num_masks, self.dim)),
            prompt,
        ], axis=1)

        # the no-mask dense prompt embedding is ADDED to the image embedding
        # (SamPromptEncoder.forward's else-branch + SamMaskDecoder.forward)
        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (1, self.dim))
        image = (image_embedding.astype(self.dtype)
                 + no_mask[None, None].astype(self.dtype)).reshape(b, g * g, c)
        image_pe = pe_layer.grid(g, g).reshape(1, g * g, self.dim)
        image_pe = jnp.broadcast_to(image_pe, (b, g * g, self.dim)).astype(
            self.dtype)
        token_pe = tokens.astype(self.dtype)

        x = tokens.astype(self.dtype)
        for i in range(self.depth):
            x, image = TwoWayBlock(self.dim, self.heads, self.mlp_dim,
                                   skip_first_pe=i == 0,
                                   dtype=self.dtype, name=f"block_{i}")(
                x, image, token_pe, image_pe)
        # final token->image attention (LayerNorm keeps torch's default 1e-5 —
        # SamTwoWayTransformer.layer_norm_final_attn is a bare nn.LayerNorm)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(
            x + _Attn(self.dim, self.heads, 2, dtype=self.dtype,
                      name="final_t2i")(x + token_pe, image + image_pe, image))

        iou_out = x[:, 0]
        mask_out = x[:, 1:1 + self.num_masks]

        # upscale image embedding 4x (two stride-2 transposed convs)
        img = image.reshape(b, g, g, c)
        img = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2),
                               padding="VALID", dtype=self.dtype, name="up1")(img)
        img = jax.nn.gelu(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(img), approximate=False)
        img = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2),
                               padding="VALID", dtype=self.dtype, name="up2")(img)
        img = jax.nn.gelu(img, approximate=False)  # [B, 4g, 4g, dim/8]

        hyper = jnp.stack([
            MLP(self.dim, self.dim // 8, name=f"hyper_{i}",
                dtype=self.dtype)(mask_out[:, i])
            for i in range(self.num_masks)
        ], axis=1)  # [B, M, dim/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, img,
                           preferred_element_type=jnp.float32)
        iou_pred = MLP(self.dim, self.num_masks, name="iou_head",
                       dtype=self.dtype)(iou_out).astype(jnp.float32)
        return masks.astype(jnp.float32), iou_pred


def load_hf_sam_decoder_weights(state_dict) -> dict:
    """Map a transformers ``SamModel`` prompt-encoder + mask-decoder state_dict onto
    :class:`SamMaskDecoder`.

    The HF model has TWO SamPositionalEmbedding instances (``shared_image_embedding``
    for the image grid and ``prompt_encoder.shared_embedding`` for prompts) that are
    equal in converted checkpoints; this module follows the original segment-anything
    design with ONE pe layer, loaded from the prompt encoder's copy.
    """

    a, dense, ln, sam_attn, conv_t = make_port_helpers(state_dict)

    def feed_forward(key, layers=3):
        out = {"Dense_0": dense(key + ".proj_in")}
        for i in range(layers - 2):
            out[f"Dense_{i + 1}"] = dense(f"{key}.layers.{i}")
        out[f"Dense_{layers - 1}"] = dense(key + ".proj_out")
        return out

    md = "mask_decoder."
    params = {
        "pe": {"gaussian_matrix":
               a("prompt_encoder.shared_embedding.positional_embedding")},
        "corner_embed": np.concatenate(
            [a("prompt_encoder.point_embed.2.weight"),
             a("prompt_encoder.point_embed.3.weight")], axis=0),
        "no_mask_embed": a("prompt_encoder.no_mask_embed.weight"),
        "iou_token": a(md + "iou_token.weight"),
        "mask_tokens": a(md + "mask_tokens.weight"),
        "up1": conv_t(md + "upscale_conv1"),
        "up2": conv_t(md + "upscale_conv2"),
        "LayerNorm_1": ln(md + "upscale_layer_norm"),
        "final_t2i": sam_attn(md + "transformer.final_attn_token_to_image"),
        "LayerNorm_0": ln(md + "transformer.layer_norm_final_attn"),
        "iou_head": feed_forward(md + "iou_prediction_head"),
    }
    lp = md + "transformer.layers."
    depth = max(int(k[len(lp):].split(".")[0]) for k in state_dict
                if k.startswith(lp)) + 1
    for i in range(depth):
        p = f"{md}transformer.layers.{i}."
        params[f"block_{i}"] = {
            "self_attn": sam_attn(p + "self_attn"),
            "cross_t2i": sam_attn(p + "cross_attn_token_to_image"),
            "cross_i2t": sam_attn(p + "cross_attn_image_to_token"),
            "LayerNorm_0": ln(p + "layer_norm1"),
            "LayerNorm_1": ln(p + "layer_norm2"),
            "LayerNorm_2": ln(p + "layer_norm3"),
            "LayerNorm_3": ln(p + "layer_norm4"),
            "Dense_0": dense(p + "mlp.lin1"),
            "Dense_1": dense(p + "mlp.lin2"),
        }
    n_masks = a(md + "mask_tokens.weight").shape[0]
    for i in range(n_masks):
        params[f"hyper_{i}"] = feed_forward(
            f"{md}output_hypernetworks_mlps.{i}")
    return {"params": params}


def load_torch_sam_decoder_weights(state_dict) -> dict:
    """Map a facebook segment-anything checkpoint's prompt-encoder + mask-decoder
    (``prompt_encoder.*`` / ``mask_decoder.*`` keys, original naming: norm1..4,
    mlp.lin1/lin2, output_upscaling.0/1/3, MLP ``layers.N``) onto
    :class:`SamMaskDecoder` — the companion of ``load_torch_sam_weights`` so a
    single sam_vit_*.pth loads the whole segmentation path."""

    a, dense, ln, sam_attn, conv_t = make_port_helpers(state_dict)

    def mlp3(key):  # facebook SamFeedForward equivalent: MLP with layers.0..2
        return {f"Dense_{i}": dense(f"{key}.layers.{i}") for i in range(3)}

    md = "mask_decoder."
    params = {
        "pe": {"gaussian_matrix":
               a("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix")},
        "corner_embed": np.concatenate(
            [a("prompt_encoder.point_embeddings.2.weight"),
             a("prompt_encoder.point_embeddings.3.weight")], axis=0),
        "no_mask_embed": a("prompt_encoder.no_mask_embed.weight"),
        "iou_token": a(md + "iou_token.weight"),
        "mask_tokens": a(md + "mask_tokens.weight"),
        "up1": conv_t(md + "output_upscaling.0"),
        "up2": conv_t(md + "output_upscaling.3"),
        "LayerNorm_1": ln(md + "output_upscaling.1"),
        "final_t2i": sam_attn(md + "transformer.final_attn_token_to_image"),
        "LayerNorm_0": ln(md + "transformer.norm_final_attn"),
        "iou_head": mlp3(md + "iou_prediction_head"),
    }
    lp = md + "transformer.layers."
    depth = max(int(k[len(lp):].split(".")[0]) for k in state_dict
                if k.startswith(lp)) + 1
    for i in range(depth):
        p = f"{lp}{i}."
        params[f"block_{i}"] = {
            "self_attn": sam_attn(p + "self_attn"),
            "cross_t2i": sam_attn(p + "cross_attn_token_to_image"),
            "cross_i2t": sam_attn(p + "cross_attn_image_to_token"),
            "LayerNorm_0": ln(p + "norm1"),
            "LayerNorm_1": ln(p + "norm2"),
            "LayerNorm_2": ln(p + "norm3"),
            "LayerNorm_3": ln(p + "norm4"),
            "Dense_0": dense(p + "mlp.lin1"),
            "Dense_1": dense(p + "mlp.lin2"),
        }
    n_masks = a(md + "mask_tokens.weight").shape[0]
    for i in range(n_masks):
        params[f"hyper_{i}"] = mlp3(f"{md}output_hypernetworks_mlps.{i}")
    return {"params": params}


class SamSegmenter:
    """End-to-end box-prompted segmentation: encoder + decoder + mask selection."""

    def __init__(self, encoder, encoder_params, decoder=None, decoder_params=None,
                 img_size: int = 1024):
        self._encoder = encoder
        self._enc_params = encoder_params
        self._decoder = decoder or SamMaskDecoder()
        self._dec_params = decoder_params
        self._img_size = img_size
        self._jit_enc = jax.jit(encoder.apply)
        self._jit_dec = jax.jit(self._decoder.apply)

    def segment_box(self, rgb: np.ndarray, box_xyxy) -> np.ndarray:
        from voxactb_tpu.models.sam_encoder import preprocess_image

        h, w = rgb.shape[:2]
        x = preprocess_image(rgb, self._img_size)
        emb = self._jit_enc(self._enc_params, x)
        if self._dec_params is None:
            self._dec_params = self._decoder.init(
                jax.random.key(0), emb, jnp.zeros((1, 4)))
        scale = self._img_size / max(h, w)
        # +0.5 shifts the corner to the pixel center (SamPromptEncoder._embed_boxes)
        box = (np.asarray(box_xyxy, np.float32) * scale + 0.5) / self._img_size
        masks, iou = self._jit_dec(self._dec_params, emb, box[None])
        best = int(np.argmax(np.asarray(iou)[0]))
        m = jnp.asarray(masks)[0, best]  # [4g, 4g] logits over the PADDED square

        # crop away the padding region, then resize to the source frame
        import jax.image as jimage

        mg = m.shape[0]
        ch = max(1, int(round(h * scale / self._img_size * mg)))
        cw = max(1, int(round(w * scale / self._img_size * mg)))
        m = jimage.resize(m[:ch, :cw], (h, w), "linear")
        return np.asarray(m) > 0
