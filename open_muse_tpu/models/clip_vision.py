"""CLIP vision encoder with projection + image-text scorer, TPU-native.

The reference CLIP-scores generated candidate images with HF transformers'
full ``CLIPModel`` (scripts/gen_sdxl_synthetic_dataset.py:34-36,97-104:
``logits_per_image`` over N candidates per prompt, written as
``clip_scores.txt``) and its published quality numbers include CLIP score
curves (benchmark/model_quality.py:32-74).  This module is the image half:
a ViT tower matching ``CLIPVisionModelWithProjection`` (weight-convertible
from the published torch checkpoints, same shape-driven converter as the
text tower) plus :class:`CLIPScorer`, which pairs it with
:class:`~open_muse_tpu.models.clip_text.CLIPTextEncoder` to reproduce
``logits_per_image`` as one jitted XLA program.

TPU notes: the patchify conv is a single stride-P VALID conv (one MXU-friendly
matmul over 16x16/14x14 patches); the encoder reuses the text tower's layers
(fp32 softmax, bf16-matmul friendly); preprocessing is pure numpy on host.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.configuration import BaseConfig
from ..core.modeling import ModelMixin
from .clip_text import CLIPEncoderLayer, _LayerNorm

__all__ = ["CLIPVisionEncoder", "CLIPVisionConfig", "CLIPScorer",
           "clip_preprocess_images"]

# OpenAI CLIP normalization constants (transformers CLIPImageProcessor)
CLIP_IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig(BaseConfig):
    # ViT-L/14 defaults (openai/clip-vit-large-patch14, the scorer the
    # reference uses in gen_sdxl_synthetic_dataset.py:34)
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768


class CLIPVisionModule(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, C) NHWC, CLIP-normalized.

        Returns (all_hidden_states tuple, pooled_output, image_embeds) —
        mirrors the HF CLIPVisionModelWithProjection surface (pooled =
        post_layernorm of the CLS token; image_embeds = visual projection).
        """
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          padding="VALID", use_bias=False,
                          name="patch_embedding", dtype=self.dtype)(
            pixel_values.astype(self.dtype))
        n_patches = patches.shape[1] * patches.shape[2]
        patches = patches.reshape(b, n_patches, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = nn.Embed(n_patches + 1, cfg.hidden_size,
                       name="position_embedding", dtype=self.dtype)(
            jnp.arange(n_patches + 1)[None, :])
        x = x + pos
        # HF attribute is literally "pre_layrnorm" (typo preserved upstream);
        # keep the name so the mechanical key map stays identity
        x = _LayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                       name="pre_layrnorm", dtype=self.dtype)(x)
        hidden_states = (x,)
        for i in range(cfg.num_hidden_layers):
            # no causal mask for vision: bidirectional attention
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}", dtype=self.dtype)(
                x, jnp.zeros((1, 1, 1, 1), jnp.float32))
            hidden_states = hidden_states + (x,)
        pooled = _LayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                            name="post_layernorm", dtype=self.dtype)(x[:, 0])
        image_embeds = nn.Dense(cfg.projection_dim, use_bias=False,
                                name="visual_projection", dtype=self.dtype)(pooled)
        return hidden_states, pooled, image_embeds


def clip_preprocess_images(images, image_size: int = 224) -> np.ndarray:
    """PIL images / uint8 or float arrays -> CLIP-normalized NHWC float32.

    Matches transformers' CLIPImageProcessor: resize shorter side to
    ``image_size`` (bicubic), center crop, scale to [0,1], normalize with
    the OpenAI mean/std."""
    from PIL import Image

    out = []
    for img in images:
        if isinstance(img, np.ndarray):
            arr = img
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
            img = Image.fromarray(arr)
        w, h = img.size
        # HF shortest-edge convention: long side truncates (int, not round)
        long_side = int(image_size * max(w, h) / min(w, h))
        new_w, new_h = ((image_size, long_side) if w <= h
                        else (long_side, image_size))
        img = img.resize((new_w, new_h), Image.BICUBIC)
        w2, h2 = img.size
        left, top = (w2 - image_size) // 2, (h2 - image_size) // 2
        img = img.crop((left, top, left + image_size, top + image_size))
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        out.append((arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD)
    return np.stack(out)


class CLIPVisionEncoder(ModelMixin):
    """HF-ish surface: ``encode(pixel_values) -> (hidden_states, pooled,
    image_embeds)``.  Loads ``CLIPVisionModelWithProjection`` checkpoints and
    the vision half of full ``CLIPModel`` checkpoints."""

    config_class = CLIPVisionConfig
    _class_name = "CLIPVisionModelWithProjection"
    _class_name_aliases = ("CLIPVisionModel", "CLIPVisionEncoder")

    def build_module(self):
        return CLIPVisionModule(self.config, dtype=self.dtype)

    def example_inputs(self):
        s = self.config.image_size
        return (jnp.zeros((1, s, s, self.config.num_channels), self.dtype),)

    def encode(self, pixel_values):
        return self.jit_apply("__call__", pixel_values)

    def __call__(self, pixel_values):
        return self.encode(pixel_values)

    def embed(self, pixel_values):
        """L2-normalized projected image embeddings (the CLIP-score half)."""
        _, _, image_embeds = self.encode(pixel_values)
        return image_embeds / jnp.linalg.norm(image_embeds, axis=-1,
                                              keepdims=True)

    def _torch_key_map(self, key: str):
        # HF torch keys: vision_model.embeddings.{class_embedding,
        # patch_embedding.weight, position_embedding.weight},
        # vision_model.pre_layrnorm.*, vision_model.encoder.layers.N.*,
        # vision_model.post_layernorm.*, visual_projection.weight
        if key.startswith("text_model.") or key in ("logit_scale",) \
                or key.startswith("text_projection"):
            return None  # text half of a full CLIPModel checkpoint
        if key.startswith("vision_model."):
            key = key[len("vision_model."):]
        key = key.replace("embeddings.", "")
        key = key.replace("encoder.layers.", "layers.")
        key = key.replace(".mlp.", ".")
        if "position_ids" in key:
            return None
        return key

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None,
                        dtype=jnp.float32, **overrides):
        """Load from an HF-format CLIP vision (or full CLIPModel) directory."""
        import json
        import os

        from ..core.modeling import resolve_pretrained_path

        path = resolve_pretrained_path(pretrained_model_name_or_path)
        if subfolder is not None:
            path = os.path.join(path, subfolder)
        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = json.load(f)
        if "vision_config" in hf_cfg:
            # a full CLIPModel config: its TOP-LEVEL projection_dim governs
            # visual_projection (the nested vision_config carries an unused
            # default of 512)
            proj = hf_cfg.get("projection_dim")
            hf_cfg = dict(hf_cfg["vision_config"])
            if proj is not None:
                hf_cfg["projection_dim"] = proj
        cfg, _ = CLIPVisionConfig.from_dict(hf_cfg)
        model = cls(config=cfg, _defer_init=True, dtype=dtype)

        from ..core.convert import load_torch_state_dict

        for name in ("model.safetensors", "pytorch_model.bin"):
            torch_file = os.path.join(path, name)
            if os.path.isfile(torch_file):
                state = load_torch_state_dict(torch_file)
                model.load_torch_weights(state, dtype=dtype, strict=False)
                return model
        raise EnvironmentError(f"no vision encoder weights found in {path}")


class CLIPScorer:
    """Image-text CLIP scoring: ``logits_per_image`` like HF CLIPModel
    (reference gen_sdxl_synthetic_dataset.py:102), as one jitted program.

    score(images, texts) returns (n_images, n_texts) logits =
    logit_scale * cos(image_embeds, text_embeds).
    """

    def __init__(self, vision_encoder, text_encoder, tokenizer,
                 logit_scale: float = 100.0):
        self.vision = vision_encoder
        self.text = text_encoder
        self.tokenizer = tokenizer
        self.logit_scale = float(logit_scale)

    @classmethod
    def from_pretrained(cls, path, tokenizer=None, dtype=jnp.float32):
        """Load both towers from one full-CLIPModel directory (or a dir with
        ``vision_encoder``/``text_encoder`` subfolders)."""
        import os

        from .clip_text import CLIPTextEncoder, SimpleTokenizer

        if os.path.isdir(os.path.join(path, "vision_encoder")):
            vision = CLIPVisionEncoder.from_pretrained(path, "vision_encoder",
                                                       dtype=dtype)
            text = CLIPTextEncoder.from_pretrained(path, "text_encoder",
                                                   dtype=dtype)
        else:
            vision = CLIPVisionEncoder.from_pretrained(path, dtype=dtype)
            text = CLIPTextEncoder.from_pretrained(path, dtype=dtype)
        logit_scale = 100.0
        from ..core.convert import load_torch_state_dict
        for name in ("model.safetensors", "pytorch_model.bin"):
            f = os.path.join(path, name)
            if os.path.isfile(f):
                state = load_torch_state_dict(f)
                if "logit_scale" in state:
                    logit_scale = float(np.exp(np.asarray(state["logit_scale"])))
                break
        if tokenizer is None:
            tokenizer = SimpleTokenizer(vocab_size=text.config.vocab_size)
        return cls(vision, text, tokenizer, logit_scale=logit_scale)

    def embed_images(self, images) -> jnp.ndarray:
        """PIL/array images -> L2-normalized image embeddings."""
        pixels = clip_preprocess_images(images, self.vision.config.image_size)
        return self.vision.embed(jnp.asarray(pixels))

    def embed_texts(self, texts) -> jnp.ndarray:
        ids = self.tokenizer(list(texts), padding="max_length", truncation=True,
                             max_length=self.text.config.max_position_embeddings,
                             return_tensors="np")["input_ids"]
        _, _, text_embeds = self.text.encode(jnp.asarray(ids))
        return text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)

    def score(self, images, texts) -> np.ndarray:
        """(n_images, n_texts) logits_per_image."""
        img = self.embed_images(images)
        txt = self.embed_texts(texts)
        return np.asarray(self.logit_scale * img @ txt.T)

    def best_of(self, images, text) -> int:
        """Index of the image best matching ``text`` (the reference's
        best-of-N candidate selection, gen_sdxl_synthetic_dataset.py:97-104 +
        training/data.py:415-446)."""
        return int(np.argmax(self.score(images, [text])[:, 0]))
