"""CLIP vision tower parity vs HF torch + CLIPScorer end-to-end.

The reference CLIP-scores generated images with transformers' CLIPModel
(scripts/gen_sdxl_synthetic_dataset.py:34-36,97-104); these tests prove our
native vision tower converts its weights and reproduces logits_per_image.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.models.clip_vision import (
    CLIPScorer, CLIPVisionEncoder, clip_preprocess_images)

VISION_TINY = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    image_size=28,
    patch_size=7,
    projection_dim=24,
)


def test_vision_encoder_shapes():
    enc = CLIPVisionEncoder(**VISION_TINY)
    px = jnp.asarray(np.random.RandomState(0).randn(2, 28, 28, 3), jnp.float32)
    hidden_states, pooled, image_embeds = enc.encode(px)
    assert len(hidden_states) == 4  # embeddings + 3 layers
    assert hidden_states[0].shape == (2, 17, 32)  # 16 patches + CLS
    assert pooled.shape == (2, 32)
    assert image_embeds.shape == (2, 24)
    emb = enc.embed(px)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1),
                               1.0, atol=1e-5)


def test_vision_torch_parity():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    hf_cfg = HFConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=7,
        projection_dim=24, hidden_act="quick_gelu")
    torch.manual_seed(0)
    ref = CLIPVisionModelWithProjection(hf_cfg)
    ref.eval()

    enc = CLIPVisionEncoder(config=dict(VISION_TINY), _defer_init=True)
    missing, unexpected = enc.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()}, strict=False)
    assert not missing, missing
    assert not unexpected, unexpected

    px = np.random.RandomState(1).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = ref(pixel_values=torch.from_numpy(px))
    hidden_states, pooled, image_embeds = enc.encode(
        jnp.asarray(px.transpose(0, 2, 3, 1)))  # NCHW -> NHWC
    np.testing.assert_allclose(np.asarray(image_embeds),
                               out.image_embeds.numpy(), atol=3e-4)


def test_full_clipmodel_parity_logits_per_image():
    """Both towers loaded from ONE CLIPModel state dict reproduce
    logits_per_image (the quantity the reference writes to clip_scores.txt,
    gen_sdxl_synthetic_dataset.py:102)."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel

    from open_muse_tpu.models.clip_text import CLIPTextEncoder

    hf_cfg = CLIPConfig(
        text_config=dict(vocab_size=100, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=16, eos_token_id=99,
                         bos_token_id=98, hidden_act="quick_gelu"),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=7,
                           hidden_act="quick_gelu"),
        projection_dim=24)
    torch.manual_seed(0)
    ref = CLIPModel(hf_cfg)
    ref.eval()
    state = {k: v.numpy() for k, v in ref.state_dict().items()}

    vision = CLIPVisionEncoder(config=dict(VISION_TINY, num_hidden_layers=2),
                               _defer_init=True)
    vision.load_torch_weights(state, strict=False)
    text = CLIPTextEncoder(
        config=dict(vocab_size=100, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=16, projection_dim=24,
                    eos_token_id=99),
        _defer_init=True)
    # text tower: visual_projection/logit_scale are expected-unexpected here
    text.load_torch_weights(
        {k: v for k, v in state.items()
         if k.startswith("text_model.") or k.startswith("text_projection")},
        strict=False)

    rs = np.random.RandomState(2)
    px = rs.randn(3, 3, 28, 28).astype(np.float32)
    ids = rs.randint(1, 90, size=(2, 16)).astype(np.int64)
    ids[:, -1] = 99  # eos
    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids),
                  pixel_values=torch.from_numpy(px),
                  attention_mask=torch.ones_like(torch.from_numpy(ids)))
    logit_scale = float(np.exp(state["logit_scale"]))
    img = np.asarray(vision.embed(jnp.asarray(px.transpose(0, 2, 3, 1))))
    _, _, txt = text.encode(jnp.asarray(ids))
    txt = np.asarray(txt)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    ours = logit_scale * img @ txt.T
    np.testing.assert_allclose(ours, out.logits_per_image.numpy(), atol=2e-3)


def test_preprocess_matches_hf_processor():
    torch = pytest.importorskip("torch")
    from transformers import CLIPImageProcessor
    from PIL import Image

    proc = CLIPImageProcessor(size={"shortest_edge": 28},
                              crop_size={"height": 28, "width": 28})
    rs = np.random.RandomState(3)
    imgs = [Image.fromarray((rs.rand(40, 33, 3) * 255).astype(np.uint8)),
            Image.fromarray((rs.rand(28, 28, 3) * 255).astype(np.uint8))]
    ref = proc(images=imgs, return_tensors="np")["pixel_values"]  # NCHW
    ours = clip_preprocess_images(imgs, image_size=28)  # NHWC
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-2)


def test_scorer_best_of_prefers_matching_image():
    """End-to-end CLIPScorer sanity: scores are finite, shaped (N, T), and
    best_of returns a valid index deterministically."""
    from open_muse_tpu.models.clip_text import CLIPTextEncoder, SimpleTokenizer

    vision = CLIPVisionEncoder(**VISION_TINY)
    text = CLIPTextEncoder(vocab_size=100, hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           max_position_embeddings=16, projection_dim=24,
                           eos_token_id=99)
    scorer = CLIPScorer(vision, text,
                        SimpleTokenizer(vocab_size=100, model_max_length=16))
    rs = np.random.RandomState(4)
    images = [rs.rand(32, 32, 3) for _ in range(3)]
    scores = scorer.score(images, ["a red square", "a cat"])
    assert scores.shape == (3, 2) and np.isfinite(scores).all()
    idx = scorer.best_of(images, "a red square")
    assert 0 <= idx < 3
    assert idx == int(np.argmax(scores[:, 0]))
