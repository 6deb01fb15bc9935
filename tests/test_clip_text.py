"""CLIP text encoder + BPE tokenizer."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxactb_tpu.models.clip_text import ClipLanguageEncoder, ClipTextEncoder
from voxactb_tpu.utils.bpe import EOT, SOT, SimpleTokenizer

# the merge table is vendored with the package; these tests require no external tree
VOCAB_AVAILABLE = os.path.exists(
    os.path.join(os.path.dirname(__file__), "..", "voxactb_tpu", "assets",
                 "bpe_simple_vocab_16e6.txt.gz")
)


@pytest.mark.skipif(not VOCAB_AVAILABLE, reason="no BPE vocab file")
def test_tokenizer_matches_clip_golden():
    tok = SimpleTokenizer()
    ids = tok.tokenize("a photo of a cat")[0]
    # the canonical OpenAI CLIP tokenization of this phrase
    np.testing.assert_array_equal(
        ids[:7], [SOT, 320, 1125, 539, 320, 2368, EOT])
    assert (ids[7:] == 0).all()


@pytest.mark.skipif(not VOCAB_AVAILABLE, reason="no BPE vocab file")
def test_tokenizer_decode_roundtrip():
    tok = SimpleTokenizer()
    text = "open the jar with the left hand"
    ids = [i for i in tok.tokenize(text)[0] if i not in (SOT, EOT, 0)]
    assert tok.decode(ids).strip() == text


def test_fallback_tokenizer_is_deterministic():
    tok = SimpleTokenizer(allow_hash_fallback=True)
    tok._fallback = True  # force
    a = tok.tokenize("grab the handle")[0]
    b = tok.tokenize("grab the handle")[0]
    np.testing.assert_array_equal(a, b)
    assert a[0] == SOT and EOT in a


def test_fallback_requires_explicit_opt_in(monkeypatch, tmp_path):
    """Silently producing non-CLIP token ids is an error, not a default."""
    import voxactb_tpu.utils.bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "_DEFAULT_VOCAB_PATHS",
                        [str(tmp_path / "missing.gz")])
    with pytest.raises(FileNotFoundError):
        SimpleTokenizer()


def test_text_encoder_shapes_and_eot_pick():
    enc = ClipTextEncoder(layers=2, width=64, heads=2, embed_dim=96)
    tokens = jnp.asarray([[SOT, 11, 22, EOT] + [0] * 73], jnp.int32)
    params = enc.init(jax.random.key(0), tokens)
    sent, tok_embs = enc.apply(params, tokens)
    assert sent.shape == (1, 96)
    assert tok_embs.shape == (1, 77, 64)
    # sentence embedding must come from the EOT position: raising EOT's position
    # changes it while padding stays untouched
    tokens2 = jnp.asarray([[SOT, 11, 22, 33, EOT] + [0] * 72], jnp.int32)
    sent2, _ = enc.apply(params, tokens2)
    assert not np.allclose(np.asarray(sent), np.asarray(sent2))


def test_causal_mask():
    """Future tokens must not influence earlier token embeddings."""
    enc = ClipTextEncoder(layers=2, width=64, heads=2, embed_dim=96)
    t1 = jnp.asarray([[SOT, 11, 22, EOT] + [0] * 73], jnp.int32)
    t2 = jnp.asarray([[SOT, 11, 99, EOT] + [0] * 73], jnp.int32)
    params = enc.init(jax.random.key(0), t1)
    _, e1 = enc.apply(params, t1)
    _, e2 = enc.apply(params, t2)
    # positions 0..1 precede the change at position 2 -> identical embeddings
    np.testing.assert_allclose(np.asarray(e1[0, :2]), np.asarray(e2[0, :2]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(e1[0, 2]), np.asarray(e2[0, 2]))


def test_language_encoder_plugs_into_agent_contract():
    enc = ClipLanguageEncoder()
    if VOCAB_AVAILABLE:
        tokens = enc.tokenize(["push the button"])
    else:
        tokens = np.zeros((1, 77), np.int32)
        tokens[0, :3] = [SOT, 100, EOT]
    sent, tok_embs = enc(tokens[0])
    assert sent.shape == (1, 1024)
    assert tok_embs.shape == (1, 77, 512)
    assert np.isfinite(sent).all()


def test_clip_joint_model(rng):
    from voxactb_tpu.models.clip_image import ClipResNetImageEncoder
    from voxactb_tpu.models.clip_text import ClipModel, ClipTextEncoder

    model = ClipModel(
        image_encoder=ClipResNetImageEncoder(layers=(1, 1, 1, 1), width=16,
                                             output_dim=32, heads=4),
        text_encoder=ClipTextEncoder(layers=1, width=32, heads=2, embed_dim=32),
    ).init(0, image_size=64)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    tokens = jnp.zeros((3, 77), jnp.int32)
    tokens = tokens.at[:, 0].set(SOT).at[:, 1].set(EOT)
    li, lt = model(images, tokens)
    assert li.shape == (2, 3) and lt.shape == (3, 2)
    sent, tok = model.encode_text_with_embeddings(tokens)
    assert sent.shape == (3, 32) and tok.shape == (3, 77, 32)
