"""T5 encoder, TPU-native (flax.linen).

The reference consumes HF ``T5EncoderModel.last_hidden_state`` for its
non-CLIP text-conditioned configs (muse/pipeline_muse.py:27,133).  This is a
native implementation (relative position bias, pre-RMSNorm, optional gated
FFN, no attention scaling — T5 folds the 1/sqrt(d) into init) that converts
the published torch checkpoints.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.configuration import BaseConfig
from ..core.modeling import ModelMixin

__all__ = ["T5TextEncoder", "T5Config"]


@dataclasses.dataclass(frozen=True)
class T5Config(BaseConfig):
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # "relu" | "gated-gelu"

    @property
    def is_gated(self) -> bool:
        return self.feed_forward_proj.startswith("gated")


class T5LayerNorm(nn.Module):
    """RMS norm without mean subtraction or bias (T5 style)."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        out = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        return out * scale.astype(out.dtype)


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, attention_mask=None):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, name=name,
                                      dtype=self.dtype)
        b, t, _ = x.shape
        q = dense("q")(x).reshape(b, t, cfg.num_heads, cfg.d_kv)
        k = dense("k")(x).reshape(b, t, cfg.num_heads, cfg.d_kv)
        v = dense("v")(x).reshape(b, t, cfg.num_heads, cfg.d_kv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)  # NO 1/sqrt(d)
        if self.has_relative_bias:
            rel_emb = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                               name="relative_attention_bias", dtype=jnp.float32)
            pos = jnp.arange(t)
            rel = pos[None, :] - pos[:, None]  # memory - query
            buckets = _relative_position_bucket(
                rel, cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance)
            position_bias = rel_emb(buckets).transpose(2, 0, 1)[None]  # (1,H,Q,K)
        if position_bias is not None:
            logits = logits + position_bias
        if attention_mask is not None:
            logits = jnp.where(attention_mask[:, None, None, :] == 0,
                               jnp.finfo(jnp.float32).min, logits)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, t, inner)
        return nn.Dense(cfg.d_model, use_bias=False, name="o",
                        dtype=self.dtype)(out), position_bias


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, attention_mask=None):
        cfg = self.config
        # layer_0: self attention
        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, name="layer_0_layer_norm",
                        dtype=self.dtype)(x)
        attn, position_bias = T5Attention(cfg, self.has_relative_bias,
                                          name="layer_0_SelfAttention",
                                          dtype=self.dtype)(h, position_bias,
                                                            attention_mask)
        x = x + attn
        # layer_1: feed forward
        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, name="layer_1_layer_norm",
                        dtype=self.dtype)(x)
        ff = lambda name, dim: nn.Dense(dim, use_bias=False, name=name,
                                        dtype=self.dtype)
        if cfg.is_gated:
            act = jax.nn.gelu(ff("layer_1_DenseReluDense_wi_0", cfg.d_ff)(h),
                              approximate=True)
            h = act * ff("layer_1_DenseReluDense_wi_1", cfg.d_ff)(h)
        else:
            h = jax.nn.relu(ff("layer_1_DenseReluDense_wi", cfg.d_ff)(h))
        h = ff("layer_1_DenseReluDense_wo", cfg.d_model)(h)
        return x + h, position_bias


class T5EncoderModule(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared",
                     dtype=self.dtype)(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(cfg, has_relative_bias=(i == 0),
                                       name=f"block_{i}", dtype=self.dtype)(
                x, position_bias, attention_mask)
        x = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon,
                        name="final_layer_norm", dtype=self.dtype)(x)
        return x


class T5TextEncoder(ModelMixin):
    config_class = T5Config
    _class_name = "T5EncoderModel"
    _class_name_aliases = ("T5TextEncoder",)

    def build_module(self):
        return T5EncoderModule(self.config, dtype=self.dtype)

    def example_inputs(self):
        return (jnp.zeros((1, 16), dtype=jnp.int32),)

    def encode(self, input_ids, attention_mask=None):
        """Returns (hidden_states_placeholder, last_hidden_state, None) so the
        pipeline's text-encoder protocol matches CLIPTextEncoder."""
        last = self.jit_apply("__call__", input_ids, attention_mask)
        return (last,), last, None

    def __call__(self, input_ids, attention_mask=None):
        return self.jit_apply("__call__", input_ids, attention_mask)

    def _torch_key_map(self, key: str):
        # HF keys: shared.weight | encoder.embed_tokens.weight (tied) |
        # encoder.block.N.layer.{0,1}.<SelfAttention|layer_norm|DenseReluDense>...
        # | encoder.final_layer_norm.weight
        if key == "encoder.embed_tokens.weight":
            return None  # tied duplicate of shared.weight
        if key.startswith("encoder."):
            key = key[len("encoder."):]
        key = key.replace(".layer.0.", ".layer_0_")
        key = key.replace(".layer.1.", ".layer_1_")
        key = key.replace("DenseReluDense.", "DenseReluDense_")
        key = key.replace("SelfAttention.", "SelfAttention_")
        # our attention submodule is named layer_0_SelfAttention with children
        # q/k/v/o/relative_attention_bias
        key = key.replace("layer_0_SelfAttention_", "layer_0_SelfAttention.")
        key = key.replace("layer_1_DenseReluDense_wi_0", "layer_1_DenseReluDense_wi_0")
        return key

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None,
                        dtype=jnp.float32, **overrides):
        import json
        import os

        from ..core.modeling import resolve_pretrained_path

        path = resolve_pretrained_path(pretrained_model_name_or_path)
        if subfolder is not None:
            path = os.path.join(path, subfolder)
        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = json.load(f)
        cfg, _ = T5Config.from_dict(hf_cfg)
        model = cls(config=cfg, _defer_init=True, dtype=dtype)
        from ..core.convert import load_torch_state_dict

        for name in ("model.safetensors", "pytorch_model.bin"):
            f = os.path.join(path, name)
            if os.path.isfile(f):
                model.load_torch_weights(load_torch_state_dict(f), dtype=dtype,
                                         strict=False)
                return model
        raise EnvironmentError(f"no T5 weights in {path}")
