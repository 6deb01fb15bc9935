"""CLIP text encoder (RN50 text tower) in flax — act-time language conditioning.

Counterpart of the vendored CLIP text side (peract/helpers/clip/core/clip.py:311-447):
12-layer pre-LN causal transformer, width 512, 8 heads, context 77, QuickGELU MLPs,
and the VoxAct-B-specific ``encode_text_with_embeddings`` (:426-441) that returns BOTH
the 1024-d sentence embedding (ln_final output at the EOT position @ text_projection)
and the 77x512 per-token embeddings (ln_final output) that feed the Perceiver's 'seq'
language fusion.

``load_torch_clip_weights`` maps an OpenAI CLIP ``state_dict`` (e.g. the RN50.pt the
reference downloads) onto this module so checkpoint-level parity is testable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from voxactb_tpu.models.torch_port import make_port_helpers

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        b, t, d = y.shape
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="attn_in")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(a):
            return a.reshape(b, t, self.heads, d // self.heads).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        scale = (d // self.heads) ** -0.5
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * scale
        sim = sim + mask  # additive causal mask (clip.py:398-404)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_out")(out)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(d, dtype=self.dtype, name="mlp_proj")(y)
        return x


class ClipTextEncoder(nn.Module):
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 1024  # RN50 CLIP joint space
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """tokens [B, 77] int32 -> (sentence_emb [B, embed_dim], token_embs [B, 77, width])."""
        b, t = tokens.shape
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok_emb[tokens].astype(self.dtype) + pos_emb[None, :t].astype(self.dtype)

        causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)[None, None]
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.dtype, name=f"resblock_{i}"
            )(x, causal)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        token_embs = x.astype(jnp.float32)

        text_proj = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id (clip.py:423)
        sent = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        sentence_emb = (sent @ text_proj.astype(self.dtype)).astype(jnp.float32)
        return sentence_emb, token_embs


def load_torch_clip_weights(state_dict) -> dict:
    """Map an OpenAI CLIP state_dict's text tower onto ClipTextEncoder params.

    Accepts a dict of numpy arrays or torch tensors keyed as in clip.py:311-365
    (``transformer.resblocks.N.attn.in_proj_weight`` etc.).
    """

    a = make_port_helpers(state_dict)[0]

    params = {
        "token_embedding": a("token_embedding.weight"),
        "positional_embedding": a("positional_embedding"),
        "text_projection": a("text_projection"),
        "ln_final": {"scale": a("ln_final.weight"), "bias": a("ln_final.bias")},
    }
    n_layers = max(
        int(k.split(".")[2]) for k in state_dict
        if k.startswith("transformer.resblocks.")
    ) + 1
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": a(f"{p}.ln_1.weight"), "bias": a(f"{p}.ln_1.bias")},
            "ln_2": {"scale": a(f"{p}.ln_2.weight"), "bias": a(f"{p}.ln_2.bias")},
            # torch Linear stores [out, in]; flax Dense wants [in, out]
            "attn_in": {"kernel": a(f"{p}.attn.in_proj_weight").T,
                        "bias": a(f"{p}.attn.in_proj_bias")},
            "attn_out": {"kernel": a(f"{p}.attn.out_proj.weight").T,
                         "bias": a(f"{p}.attn.out_proj.bias")},
            "mlp_fc": {"kernel": a(f"{p}.mlp.c_fc.weight").T,
                       "bias": a(f"{p}.mlp.c_fc.bias")},
            "mlp_proj": {"kernel": a(f"{p}.mlp.c_proj.weight").T,
                         "bias": a(f"{p}.mlp.c_proj.bias")},
        }
    return {"params": params}


class ClipLanguageEncoder:
    """Callable bundling tokenizer + jitted text encoder for agents' ``lang_encoder``."""

    def __init__(self, params=None, tokenizer=None, dtype=jnp.float32):
        self._model = ClipTextEncoder(dtype=dtype)
        if params is None:
            params = self._model.init(
                jax.random.key(0), jnp.zeros((1, CONTEXT_LENGTH), jnp.int32))
        self._params = params
        self._tokenizer = tokenizer
        self._encode = jax.jit(self._model.apply)

    def tokenize(self, texts):
        if self._tokenizer is None:
            from voxactb_tpu.utils.bpe import SimpleTokenizer

            self._tokenizer = SimpleTokenizer()
        return self._tokenizer.tokenize(texts)

    def __call__(self, tokens) -> Tuple[np.ndarray, np.ndarray]:
        tokens = jnp.asarray(tokens, jnp.int32).reshape(1, -1)
        sent, tok = self._encode(self._params, tokens)
        return np.asarray(sent), np.asarray(tok)

    def encode_text(self, texts):
        return self(self.tokenize(texts)[0])


class ClipModel:
    """Joint CLIP: image tower + text tower + temperature (clip.py:311-465).

    Assembles ``ClipResNetImageEncoder`` (models/clip_image.py) and
    :class:`ClipTextEncoder` into the reference's contrastive interface:
    ``encode_image`` / ``encode_text`` / ``__call__`` -> similarity logits.
    """

    def __init__(self, image_encoder=None, image_params=None,
                 text_encoder=None, text_params=None, logit_scale: float = 100.0):
        from voxactb_tpu.models.clip_image import ClipResNetImageEncoder

        self.image_encoder = image_encoder or ClipResNetImageEncoder()
        self.text_encoder = text_encoder or ClipTextEncoder()
        self.image_params = image_params
        self.text_params = text_params
        self.logit_scale = logit_scale
        self._jit_img = jax.jit(
            lambda p, x: self.image_encoder.apply(p, x))
        self._jit_txt = jax.jit(self.text_encoder.apply)

    def init(self, rng, image_size: int = 224):
        r1, r2 = jax.random.split(jax.random.key(rng) if isinstance(rng, int)
                                  else rng)
        if self.image_params is None:
            # NOTE: the attention-pool positional embedding is input-size dependent;
            # init at the size you will encode at (CLIP's canonical 224 by default)
            self.image_params = self.image_encoder.init(
                r1, jnp.zeros((1, image_size, image_size, 3), jnp.float32))
        if self.text_params is None:
            self.text_params = self.text_encoder.init(
                r2, jnp.zeros((1, CONTEXT_LENGTH), jnp.int32))
        return self

    def encode_image(self, images):
        return self._jit_img(self.image_params, jnp.asarray(images, jnp.float32))

    def encode_text(self, tokens):
        sent, _ = self._jit_txt(self.text_params, jnp.asarray(tokens, jnp.int32))
        return sent

    def encode_text_with_embeddings(self, tokens):
        """The VoxAct-B entry point (clip.py:426-441)."""
        return self._jit_txt(self.text_params, jnp.asarray(tokens, jnp.int32))

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        logits_per_image = self.logit_scale * img @ txt.T
        return logits_per_image, logits_per_image.T
