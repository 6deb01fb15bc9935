"""Pretrained-weights hook (utils/pretrained.py): discovery, CLIP loading into the
sim language encoder, and the facebook-layout SAM decoder importer."""

import os

import numpy as np
import pytest


def _fake_clip_state_dict(layers=2, width=64, vocab=120, ctx=77, embed=48):
    rng = np.random.default_rng(0)
    sd = {
        "token_embedding.weight": rng.normal(size=(vocab, width)),
        "positional_embedding": rng.normal(size=(ctx, width)),
        "text_projection": rng.normal(size=(width, embed)),
        "ln_final.weight": np.ones(width),
        "ln_final.bias": np.zeros(width),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": np.ones(width), f"{p}.ln_1.bias": np.zeros(width),
            f"{p}.ln_2.weight": np.ones(width), f"{p}.ln_2.bias": np.zeros(width),
            f"{p}.attn.in_proj_weight": rng.normal(size=(3 * width, width)) * .05,
            f"{p}.attn.in_proj_bias": np.zeros(3 * width),
            f"{p}.attn.out_proj.weight": rng.normal(size=(width, width)) * .05,
            f"{p}.attn.out_proj.bias": np.zeros(width),
            f"{p}.mlp.c_fc.weight": rng.normal(size=(4 * width, width)) * .05,
            f"{p}.mlp.c_fc.bias": np.zeros(4 * width),
            f"{p}.mlp.c_proj.weight": rng.normal(size=(width, 4 * width)) * .05,
            f"{p}.mlp.c_proj.bias": np.zeros(width),
        })
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_find_weights_absent(tmp_path, monkeypatch):
    from voxactb_tpu.utils import pretrained

    monkeypatch.setenv("VOXACTB_WEIGHTS_DIR", str(tmp_path))
    assert pretrained.find_weights("clip") is None
    assert pretrained.load_clip_text() is None


def test_load_clip_text_from_checkpoint(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from voxactb_tpu.utils import pretrained

    monkeypatch.setenv("VOXACTB_WEIGHTS_DIR", str(tmp_path))
    torch.save(_fake_clip_state_dict(), os.path.join(tmp_path, "clip_rn50.pt"))

    loaded = pretrained.load_clip_text()
    assert loaded is not None
    model, params = loaded
    assert model.layers == 2 and model.width == 64 and model.embed_dim == 48
    tokens = jnp.asarray(np.array([[1, 5, 9] + [0] * 73 + [119]]), jnp.int32)
    sent, tok = model.apply(params, tokens)
    assert sent.shape == (1, 48) and tok.shape == (1, 77, 64)
    assert np.isfinite(np.asarray(sent)).all()


def test_sim_language_encoder_uses_checkpoint(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    from voxactb_tpu.sim import environment as E

    monkeypatch.setenv("VOXACTB_WEIGHTS_DIR", str(tmp_path))
    # full CLIP vocab: the real BPE tokenizer emits ids up to 49407, which a
    # truncated test vocab would silently clamp into identical embeddings
    torch.save(_fake_clip_state_dict(embed=48, vocab=49408),
               os.path.join(tmp_path, "clip_rn50.pt"))
    # reset the process-wide cache so the hook re-resolves
    monkeypatch.setattr(E, "_LANG_ENC", None)
    monkeypatch.setattr(E, "_LANG_CACHE", {})

    enc = E.default_sim_language_encoder()
    sent, tok = enc("open the jar")
    # the checkpoint's text_projection is 48-d — proof the ported weights were
    # used rather than the 1024-d random-init fallback
    assert sent.shape == (48,)
    sent2, _ = enc("open the drawer")
    assert not np.allclose(sent, sent2)


def test_sam_decoder_facebook_layout_matches_hf(rng):
    """Renaming a transformers SamModel state_dict to the facebook layout and
    importing via load_torch_sam_decoder_weights must yield the identical param
    tree as the HF importer — proves one sam_vit_*.pth loads the whole path."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import jax

    from voxactb_tpu.models.sam_decoder import (
        load_hf_sam_decoder_weights,
        load_torch_sam_decoder_weights,
    )
    from tests.test_hf_tower_parity import _tiny_sam

    model = _tiny_sam()
    sd = model.state_dict()

    fb = {}
    for k, v in sd.items():
        k2 = (k
              .replace("prompt_encoder.shared_embedding.positional_embedding",
                       "prompt_encoder.pe_layer."
                       "positional_encoding_gaussian_matrix")
              .replace("prompt_encoder.point_embed.",
                       "prompt_encoder.point_embeddings."))
        if k.startswith("mask_decoder."):
            k2 = (k2
                  .replace(".layer_norm1", ".norm1")
                  .replace(".layer_norm2", ".norm2")
                  .replace(".layer_norm3", ".norm3")
                  .replace(".layer_norm4", ".norm4")
                  .replace("transformer.layer_norm_final_attn",
                           "transformer.norm_final_attn")
                  .replace("upscale_conv1", "output_upscaling.0")
                  .replace("upscale_layer_norm", "output_upscaling.1")
                  .replace("upscale_conv2", "output_upscaling.3"))
            # SamFeedForward proj_in / layers.0 / proj_out -> facebook MLP
            # layers.0 / layers.1 / layers.2 (each key hits exactly one case)
            if ("iou_prediction_head" in k2
                    or "output_hypernetworks_mlps" in k2):
                if ".proj_in." in k2:
                    k2 = k2.replace(".proj_in.", ".layers.0.")
                elif ".layers.0." in k2:
                    k2 = k2.replace(".layers.0.", ".layers.1.")
                elif ".proj_out." in k2:
                    k2 = k2.replace(".proj_out.", ".layers.2.")
        fb[k2] = v

    got = load_torch_sam_decoder_weights(fb)
    want = load_hf_sam_decoder_weights(sd)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_g) == len(flat_w)
    for path, leaf in flat_g:
        np.testing.assert_array_equal(leaf, flat_w[path],
                                      err_msg=str(path))
