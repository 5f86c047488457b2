"""CLIP text encoder with projection, TPU-native (flax.linen).

The reference delegates text encoding to HF transformers'
``CLIPTextModelWithProjection`` (muse/pipeline_muse.py:21-28,130-131) and
consumes (a) the penultimate hidden state (``hidden_states[-2]``, with
``clip_skip`` support) and (b) the projected pooled embedding.  We implement
the text tower natively so the whole text->image pipeline is one JAX stack;
weights convert from the published torch checkpoints.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.configuration import BaseConfig
from ..core.modeling import ModelMixin

__all__ = ["CLIPTextEncoder", "CLIPTextConfig"]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig(BaseConfig):
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512
    eos_token_id: int = 49407


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new"):
        return lambda x: jax.nn.gelu(x, approximate=(name == "gelu_new"))
    raise ValueError(f"unknown activation {name}")


class _LayerNorm(nn.Module):
    dim: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return (out * scale + bias).astype(x.dtype)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        dense = lambda n: nn.Dense(cfg.hidden_size, name=n, dtype=self.dtype)
        b, t, _ = x.shape
        q = dense("q_proj")(x).reshape(b, t, heads, head_dim)
        k = dense("k_proj")(x).reshape(b, t, heads, head_dim)
        v = dense("v_proj")(x).reshape(b, t, heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (head_dim ** -0.5) + causal_mask
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, t, cfg.hidden_size)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        residual = x
        h = _LayerNorm(cfg.hidden_size, cfg.layer_norm_eps, name="layer_norm1",
                       dtype=self.dtype)(x)
        h = CLIPAttention(cfg, name="self_attn", dtype=self.dtype)(h, causal_mask)
        x = residual + h
        residual = x
        h = _LayerNorm(cfg.hidden_size, cfg.layer_norm_eps, name="layer_norm2",
                       dtype=self.dtype)(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1", dtype=self.dtype)(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, name="fc2", dtype=self.dtype)(h)
        return residual + h


class CLIPTextModule(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        """Returns (all_hidden_states tuple, last_hidden_state, text_embeds)."""
        cfg = self.config
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding",
                       dtype=self.dtype)(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       name="position_embedding", dtype=self.dtype)(
            jnp.arange(t)[None, :])
        x = tok + pos
        causal = jnp.triu(jnp.full((t, t), jnp.finfo(jnp.float32).min), k=1)
        causal = causal[None, None, :, :]
        hidden_states = (x,)
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}", dtype=self.dtype)(x, causal)
            hidden_states = hidden_states + (x,)
        last = _LayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                          name="final_layer_norm", dtype=self.dtype)(x)
        # pooled = features at the (first) EOS position; with CLIP's vocab the
        # EOS/pad id is the max id, so argmax finds the first EOS
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(last, eos_idx[:, None, None], axis=1)[:, 0]
        text_embeds = nn.Dense(cfg.projection_dim, use_bias=False,
                               name="text_projection", dtype=self.dtype)(pooled)
        return hidden_states, last, text_embeds


class SimpleTokenizer:
    """Deterministic hash tokenizer for offline/smoke runs (no hub access).

    Maps whitespace words to stable ids; BOS at 0, EOS/pad = vocab_size-1 so
    the CLIP pooling argmax convention holds.  Not a BPE — production runs
    point at a real tokenizer directory.
    """

    def __init__(self, vocab_size: int = 49408, model_max_length: int = 77):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length

    def __call__(self, texts, padding=None, truncation=None, max_length=None,
                 return_tensors=None):
        import hashlib

        import numpy as np

        max_length = max_length or self.model_max_length
        eos = self.vocab_size - 1
        batch = []
        for text in texts:
            ids = [1]  # bos
            for word in str(text).lower().split():
                h = int(hashlib.md5(word.encode()).hexdigest(), 16)
                ids.append(2 + h % (self.vocab_size - 3))
            ids = ids[: max_length - 1] + [eos]
            ids = ids + [eos] * (max_length - len(ids))
            batch.append(ids)
        return {"input_ids": np.asarray(batch, dtype=np.int32)}


class CLIPTextEncoder(ModelMixin):
    """User-facing wrapper exposing the HF-ish surface the pipeline needs:
    ``encode(input_ids) -> (hidden_states tuple, last_hidden_state, text_embeds)``.
    """

    config_class = CLIPTextConfig
    _class_name = "CLIPTextModelWithProjection"
    _class_name_aliases = ("CLIPTextModel", "CLIPTextEncoder")

    def build_module(self):
        return CLIPTextModule(self.config, dtype=self.dtype)

    def example_inputs(self):
        return (jnp.zeros((1, self.config.max_position_embeddings), dtype=jnp.int32),)

    def encode(self, input_ids):
        return self.jit_apply("__call__", input_ids)

    def __call__(self, input_ids):
        return self.encode(input_ids)

    def _torch_key_map(self, key: str):
        # HF torch keys: text_model.embeddings.token_embedding.weight,
        # text_model.encoder.layers.N.{self_attn.*, layer_norm1/2, mlp.fc1/2},
        # text_model.final_layer_norm.*, text_projection.weight
        if key.startswith("text_model."):
            key = key[len("text_model."):]
        key = key.replace("embeddings.", "")
        key = key.replace("encoder.layers.", "layers.")
        key = key.replace(".mlp.", ".")
        if key.startswith("position_ids") or key.endswith("position_ids"):
            return None
        return key

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None,
                        dtype=jnp.float32, **overrides):
        """Load from an HF-format CLIP text-encoder directory (the layout the
        reference checkpoints ship in their ``text_encoder`` subfolder)."""
        import json
        import os

        from ..core.modeling import resolve_pretrained_path

        path = resolve_pretrained_path(pretrained_model_name_or_path)
        if subfolder is not None:
            path = os.path.join(path, subfolder)
        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = json.load(f)
        if "text_config" in hf_cfg:
            # full-CLIPModel config: top-level projection_dim governs
            # text_projection (the nested default of 512 is unused)
            proj = hf_cfg.get("projection_dim")
            hf_cfg = dict(hf_cfg["text_config"])
            if proj is not None:
                hf_cfg["projection_dim"] = proj
        cfg, _ = CLIPTextConfig.from_dict(hf_cfg)
        model = cls(config=cfg, _defer_init=True, dtype=dtype)

        from ..core.convert import load_torch_state_dict, unflatten_dict

        flax_file = os.path.join(path, "flax_model.safetensors")
        if os.path.isfile(flax_file):
            from safetensors.numpy import load_file

            model.params = jax.tree_util.tree_map(
                jnp.asarray, unflatten_dict(load_file(flax_file)))
            return model
        for name in ("model.safetensors", "pytorch_model.bin"):
            torch_file = os.path.join(path, name)
            if os.path.isfile(torch_file):
                state = load_torch_state_dict(torch_file)
                model.load_torch_weights(state, dtype=dtype, strict=False)
                return model
        raise EnvironmentError(f"no text encoder weights found in {path}")
