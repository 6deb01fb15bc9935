"""Numeric forward parity of the vision/language towers against their torch
references: the vendored OpenAI CLIP in the reference tree
(peract/helpers/clip/core/clip.py:311-482 — text transformer via
``encode_text_with_embeddings`` and the RN50 ``ModifiedResNet`` visual tower incl.
attention pool) and transformers' ``OwlViTForObjectDetection`` / ``SamModel``
(the models the reference VLM drives, rlbench/backend/vlm.py:77-143).

Pattern mirrors tests/test_reference_parity.py: random-init the torch module at a
small-but-structured config, port its state_dict through this repo's importers, and
assert the flax forward reproduces the torch outputs.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
# import transformers BEFORE the vendored-CLIP loader stubs torchvision in
# sys.modules — its import-availability probe chokes on spec-less stub modules
transformers = pytest.importorskip("transformers")

REF_CLIP = "/root/reference/peract/helpers/clip/core/clip.py"


def _load_ref_clip():
    """Import the vendored clip.py with its unused heavy deps stubbed out
    (ftfy/torchvision are not in this image; only the model classes are needed)."""
    if "refclipcore.clip" in sys.modules:
        return sys.modules["refclipcore.clip"]
    pkg = types.ModuleType("refclipcore")
    pkg.__path__ = [os.path.dirname(REF_CLIP)]
    sys.modules["refclipcore"] = pkg
    st = types.ModuleType("refclipcore.simple_tokenizer")
    st.SimpleTokenizer = type("SimpleTokenizer", (), {})
    sys.modules["refclipcore.simple_tokenizer"] = st
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for n in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            setattr(tvt, n, lambda *a, **k: None)
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    spec = importlib.util.spec_from_file_location("refclipcore.clip", REF_CLIP)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refclipcore.clip"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(REF_CLIP),
                    reason="reference tree unavailable")
def test_clip_text_vs_reference(rng):
    """ClipTextEncoder vs the vendored CLIP's encode_text_with_embeddings
    (clip.py:426-441): ported weights must reproduce BOTH the projected sentence
    embedding and the 77-token per-token embeddings."""
    import jax.numpy as jnp

    ref = _load_ref_clip()
    torch.manual_seed(0)
    clip_t = ref.CLIP(embed_dim=32, image_resolution=64,
                      vision_layers=(1, 1, 1, 1), vision_width=16,
                      vision_patch_size=None, context_length=77, vocab_size=100,
                      transformer_width=64, transformer_heads=4,
                      transformer_layers=2)
    clip_t.eval()

    tokens = rng.integers(1, 90, (3, 77)).astype(np.int64)
    tokens[:, 60] = 99  # unique max = the EOT slot the pooling selects
    with torch.no_grad():
        sent_t, tok_t = clip_t.encode_text_with_embeddings(
            torch.from_numpy(tokens))

    from voxactb_tpu.models.clip_text import (
        ClipTextEncoder,
        load_torch_clip_weights,
    )

    params = load_torch_clip_weights(clip_t.state_dict())
    enc = ClipTextEncoder(vocab_size=100, context_length=77, width=64, heads=4,
                          layers=2, embed_dim=32)
    sent_j, tok_j = enc.apply(params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(sent_j), sent_t.numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(tok_j), tok_t.numpy(),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.skipif(not os.path.exists(REF_CLIP),
                    reason="reference tree unavailable")
def test_clip_image_resnet_vs_reference(rng):
    """ClipResNetImageEncoder vs the vendored ModifiedResNet (clip.py:128-210):
    stem striding/padding, anti-aliased bottleneck downsampling, and the
    attention-pool head must all match at ported weights."""
    import jax.numpy as jnp

    ref = _load_ref_clip()
    torch.manual_seed(0)
    visual = ref.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32, heads=8,
                                input_resolution=64, width=16)
    visual.eval()

    images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = visual(torch.from_numpy(images).permute(0, 3, 1, 2)).numpy()

    from voxactb_tpu.models.clip_image import (
        ClipResNetImageEncoder,
        load_torch_clip_image_weights,
    )

    variables = load_torch_clip_image_weights(visual.state_dict(), prefix="")
    enc = ClipResNetImageEncoder(layers=(1, 1, 1, 1), width=16, output_dim=32,
                                 heads=8)
    out_j = enc.apply(variables, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=5e-5, rtol=5e-5)


def _tiny_owlvit():
    from transformers import OwlViTConfig, OwlViTForObjectDetection

    cfg = OwlViTConfig(
        text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=16),
        vision_config=dict(hidden_size=32, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8),
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = OwlViTForObjectDetection(cfg)
    model.eval()
    return model


def test_owlvit_vs_transformers(rng):
    """OwlViTDetector + ClipTextEncoder vs transformers'
    OwlViTForObjectDetection: ported weights must reproduce pred_logits and
    pred_boxes (incl. the corner-coordinate box bias and the merged-CLS LN)."""
    import jax.numpy as jnp

    model = _tiny_owlvit()
    tokens = rng.integers(1, 90, (2, 16)).astype(np.int64)
    tokens[:, 10] = 98  # unique max -> pooled slot
    pixels = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = model(input_ids=torch.from_numpy(tokens),
                      pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2))

    from voxactb_tpu.models.clip_text import ClipTextEncoder
    from voxactb_tpu.models.owlvit import (
        OwlViTDetector,
        OwlViTImageEncoder,
        load_hf_owlvit_weights,
    )

    det_params, text_params = load_hf_owlvit_weights(model.state_dict())
    text = ClipTextEncoder(vocab_size=99, context_length=16, width=32, heads=4,
                           layers=2, embed_dim=32)
    sent, _ = text.apply(text_params, jnp.asarray(tokens, jnp.int32))
    # transformers normalizes the projected text embeds before the class head
    # (OwlViTModel.forward "normalized features"); the detector's own
    # normalization is idempotent, so pre-normalizing matches exactly.
    sent = sent / np.linalg.norm(np.asarray(sent), axis=-1, keepdims=True)

    det = OwlViTDetector(
        embed_dim=32,
        image_encoder=OwlViTImageEncoder(img_size=32, patch=8, dim=32, depth=2,
                                         heads=4))
    logits_j, boxes_j = det.apply(det_params, jnp.asarray(pixels),
                                  jnp.asarray(sent))
    np.testing.assert_allclose(np.asarray(logits_j),
                               out_t.logits.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(boxes_j),
                               out_t.pred_boxes.numpy(), atol=1e-5, rtol=1e-5)


def _tiny_sam():
    from transformers import SamConfig, SamModel

    cfg = SamConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=4,
                           num_attention_heads=2, image_size=64, patch_size=16,
                           window_size=2, global_attn_indexes=[1, 3],
                           output_channels=32, num_pos_feats=16),
        prompt_encoder_config=dict(hidden_size=32, image_size=64,
                                   image_embedding_size=4,
                                   mask_input_channels=8),
        mask_decoder_config=dict(hidden_size=32, num_hidden_layers=2,
                                 num_attention_heads=2, mlp_dim=64,
                                 iou_head_hidden_dim=32),
    )
    torch.manual_seed(0)
    model = SamModel(cfg)
    model.eval()
    # this repo follows original segment-anything's SINGLE positional-encoding
    # layer; transformers random-inits two independent copies — tie them
    with torch.no_grad():
        model.shared_image_embedding.positional_embedding.copy_(
            model.prompt_encoder.shared_embedding.positional_embedding)
    return model


def test_sam_encoder_vs_transformers(rng):
    """SamImageEncoder vs transformers' SAM vision encoder (windowed +
    decomposed-rel-pos attention, neck): ported weights, same features."""
    import jax.numpy as jnp

    model = _tiny_sam()
    pixels = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = model.vision_encoder(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)
        ).last_hidden_state.permute(0, 2, 3, 1).numpy()

    from voxactb_tpu.models.sam_encoder import (
        SamImageEncoder,
        load_hf_sam_vision_weights,
    )

    params = load_hf_sam_vision_weights(model.state_dict())
    enc = SamImageEncoder(img_size=64, patch_size=16, embed_dim=32, depth=4,
                          num_heads=2, window_size=2,
                          global_attn_indexes=(1, 3), out_chans=32)
    feats_j = enc.apply(params, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(feats_j), feats_t,
                               atol=1e-4, rtol=1e-4)


def test_sam_decoder_vs_transformers(rng):
    """SamMaskDecoder (+ box prompt encoding) vs the full transformers SamModel
    forward with input_boxes: mask logits and IoU scores must match, proving the
    two-way transformer, upscaling, and hypernetwork heads."""
    import jax.numpy as jnp

    model = _tiny_sam()
    pixels = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    box = np.array([[8.0, 12.0, 40.0, 52.0]], np.float32)  # input-image pixels
    with torch.no_grad():
        out_t = model(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2),
            input_boxes=torch.from_numpy(box)[None],
            multimask_output=True)

    from voxactb_tpu.models.sam_decoder import (
        SamMaskDecoder,
        load_hf_sam_decoder_weights,
    )
    from voxactb_tpu.models.sam_encoder import (
        SamImageEncoder,
        load_hf_sam_vision_weights,
    )

    enc = SamImageEncoder(img_size=64, patch_size=16, embed_dim=32, depth=4,
                          num_heads=2, window_size=2,
                          global_attn_indexes=(1, 3), out_chans=32)
    emb = enc.apply(load_hf_sam_vision_weights(model.state_dict()),
                    jnp.asarray(pixels))

    dec = SamMaskDecoder(dim=32, heads=2, depth=2, num_masks=4, mlp_dim=64)
    dec_params = load_hf_sam_decoder_weights(model.state_dict())
    # +0.5 centers the corner pixels; normalize by the prompt input size
    box_n = (box + 0.5) / 64.0
    masks_j, iou_j = dec.apply(dec_params, emb, jnp.asarray(box_n))

    # multimask_output=True drops the first ("whole") mask slot
    np.testing.assert_allclose(np.asarray(masks_j)[:, 1:],
                               out_t.pred_masks.numpy()[:, 0],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(iou_j)[:, 1:],
                               out_t.iou_scores.numpy()[:, 0],
                               atol=1e-4, rtol=1e-4)
