"""MaskGiTUViT_v2: the research-run U-ViT masked-token model, TPU-native.

Reference parity: muse/modeling_transformer_v2.py (config :79-123, forward
:242-319, generate2 :330-479, blocks :485-1037).

TPU-native redesign highlights:
  * fused-residual prenorm is expressed functionally (norm returns
    (normed, residual)); XLA fuses the add+norm, replacing flash_attn's
    dropout_add_rms_norm CUDA kernels (reference :41-54, 645-738).
  * the entire generate2 decode loop — CFG batching, categorical sampling,
    confidence remasking — compiles into ONE XLA program via lax.scan
    (reference loops in Python per step, :422-474).
  * NHWC everywhere; depthwise+GRN ResBlocks and 1x1 convs lower to MXU
    matmuls; attention runs with fp32 softmax.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.configuration import BaseConfig
from ..core.modeling import ModelMixin
from ..ops import sampling
from ..ops.layers import (
    AdaLNModulation,
    Attention,
    GlobalResponseNorm,
    LayerNorm,
    Norm,
    sinusoidal_encode,
)
from ..ops.losses import cross_entropy_loss, weighted_cross_entropy_loss

__all__ = ["MaskGiTUViT_v2", "MaskGiTUViT_v2Config"]


@dataclasses.dataclass(frozen=True)
class MaskGiTUViT_v2Config(BaseConfig):
    # defaults: modeling_transformer_v2.py:79-123
    hidden_size: int = 1024
    use_bias: bool = False
    hidden_dropout: float = 0.0

    cond_embed_dim: int = 768
    micro_cond_encode_dim: int = 256
    micro_cond_embed_dim: int = 1280
    encoder_hidden_size: int = 768

    vocab_size: int = 8256  # codebook + 1 mask token, rounded up
    mask_token_id: int = 8255
    codebook_size: int = 8192

    in_channels: int = 768
    block_out_channels: Tuple[int, ...] = (768,)
    num_res_blocks: int = 3
    force_down_up_sample: bool = False
    block_num_heads: int = 12

    num_hidden_layers: int = 22
    num_attention_heads: int = 16

    attention_dropout: float = 0.0

    intermediate_size: int = 2816
    use_fused_mlp: bool = False

    norm_type: str = "rmsnorm"
    layer_norm_eps: float = 1e-6
    ln_elementwise_affine: bool = True
    use_fused_residual_norm: bool = False

    # Legacy: kept for pipeline compatibility (reference :121-123)
    add_cond_embeds: bool = True
    add_micro_cond_embeds: bool = True


def _norm(cfg, dim, name, dtype):
    return Norm(dim, cfg.norm_type, eps=cfg.layer_norm_eps, use_bias=cfg.use_bias,
                elementwise_affine=cfg.ln_elementwise_affine, name=name, dtype=dtype)


def _use_fused_attn_sublayer(cfg, x) -> bool:
    """Route both trunk attention sublayers through the fused Pallas kernel
    (ops/pallas/attn_sublayer, round-4 mega-kernel): research-config shapes
    (rmsnorm+affine, no bias, head_dim 64) on single-device TPU or inside a
    dp-only kernel_mesh (batch shards via shard_map, weights replicated);
    MUSE_TPU_PALLAS_ATTN_SUBLAYER=1 forces it elsewhere.  The unfused path
    stays the oracle."""
    if (cfg.norm_type != "rmsnorm" or cfg.use_bias
            or not cfg.ln_elementwise_affine):
        return False
    from ..ops.pallas.attn_sublayer import (sublayer_shapes_supported,
                                            use_pallas_attn_sublayer)

    if x is None or x.ndim != 3 or not sublayer_shapes_supported(
            x.shape[1], cfg.hidden_size, cfg.num_attention_heads,
            itemsize=x.dtype.itemsize):
        return False
    return use_pallas_attn_sublayer()


class Norm2D(nn.Module):
    """Channels-last norm over NHWC maps; inner child named 'norm' to match
    the reference param tree (modeling_transformer_v2.py:624-633)."""

    config: MaskGiTUViT_v2Config
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _norm(self.config, self.dim, "norm", self.dtype)(x)


class ConvEmbed(nn.Module):
    """token embed -> norm -> 1x1 conv (modeling_transformer_v2.py:485-500)."""

    config: MaskGiTUViT_v2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        batch, seq_len = input_ids.shape
        side = int(seq_len ** 0.5)
        ids = input_ids.reshape(batch, side, side)
        x = nn.Embed(cfg.vocab_size, cfg.in_channels, name="embeddings",
                     embedding_init=nn.initializers.normal(np.sqrt(1 / cfg.vocab_size)),
                     dtype=self.dtype)(ids)
        x = _norm(cfg, cfg.in_channels, "layer_norm", self.dtype)(x)
        # xavier_uniform with gain 0.02 (reference :211): scale = gain^2
        x = nn.Conv(cfg.block_out_channels[0], (1, 1), use_bias=cfg.use_bias,
                    kernel_init=nn.initializers.variance_scaling(
                        0.02 ** 2, "fan_avg", "uniform"),
                    name="conv", dtype=self.dtype)(x)
        return x


class ResBlock(nn.Module):
    """depthwise conv + GRN channel-MLP + AdaLN
    (modeling_transformer_v2.py:586-618)."""

    config: MaskGiTUViT_v2Config
    channels: int
    res_ffn_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_embeds, adaln_cache=None,
                 precompute: bool = False):
        cfg = self.config
        c = self.channels
        if precompute:
            return AdaLNModulation(cfg.hidden_size, c, use_bias=cfg.use_bias,
                                   name="adaLN_modulation", dtype=self.dtype)(
                None, cond_embeds, precompute=True)
        inner = int(c * self.res_ffn_factor)
        x_res = x
        h = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, use_bias=cfg.use_bias,
                    kernel_init=nn.initializers.truncated_normal(0.02),
                    name="depthwise", dtype=self.dtype)(x)
        h = Norm2D(cfg, c, name="norm", dtype=self.dtype)(h)
        h = nn.Dense(inner, use_bias=cfg.use_bias, name="channelwise_0",
                     kernel_init=nn.initializers.truncated_normal(0.02),
                     dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        h = GlobalResponseNorm(inner, name="channelwise_2")(h)
        h = nn.Dense(c, use_bias=cfg.use_bias, name="channelwise_4",
                     kernel_init=nn.initializers.truncated_normal(0.02),
                     dtype=self.dtype)(h)
        h = h + x_res
        return AdaLNModulation(cfg.hidden_size, c, use_bias=cfg.use_bias,
                               name="adaLN_modulation", dtype=self.dtype)(
            h, cond_embeds, cached=adaln_cache)


class AttentionBlock2D(nn.Module):
    """Two cross-attention sublayers over flattened NHWC maps
    (modeling_transformer_v2.py:795-831)."""

    config: MaskGiTUViT_v2Config
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states, ctx=None,
                 precompute: bool = False):
        cfg = self.config
        if precompute:
            mapped = encoder_hidden_states
            if cfg.hidden_size != self.channels:
                mapped = nn.Dense(
                    self.channels, use_bias=cfg.use_bias,
                    kernel_init=nn.initializers.truncated_normal(0.02),
                    name="kv_mapper", dtype=self.dtype)(jax.nn.silu(mapped))
            return {
                "kv1": Attention(self.channels, cfg.block_num_heads,
                                 use_bias=cfg.use_bias, name="attention",
                                 dtype=self.dtype)(mapped, mapped,
                                                   precompute_kv=True),
                "kv2": Attention(self.channels, cfg.block_num_heads,
                                 use_bias=cfg.use_bias, name="crossattention",
                                 dtype=self.dtype)(mapped, mapped,
                                                   precompute_kv=True),
            }
        ctx = ctx or {}
        b, hh, ww, c = x.shape
        h = x.reshape(b, hh * ww, c)
        if cfg.hidden_size != self.channels and ctx.get("kv1") is None:
            encoder_hidden_states = nn.Dense(
                self.channels, use_bias=cfg.use_bias,
                kernel_init=nn.initializers.truncated_normal(0.02),
                name="kv_mapper", dtype=self.dtype)(jax.nn.silu(encoder_hidden_states))
        # NOTE: both sublayers are cross-attention; naming kept from the
        # reference for state-dict compatibility (reference :806-812)
        h1, residual = _norm(cfg, self.channels, "attn_layer_norm", self.dtype)(
            h, return_residual=True)
        h1 = Attention(self.channels, cfg.block_num_heads, use_bias=cfg.use_bias,
                       name="attention", dtype=self.dtype)(
            h1, encoder_hidden_states, cached_kv=ctx.get("kv1"))
        h2, residual = _norm(cfg, self.channels, "crossattn_layer_norm", self.dtype)(
            h1, residual)
        h2 = Attention(self.channels, cfg.block_num_heads, use_bias=cfg.use_bias,
                       name="crossattention", dtype=self.dtype)(
            h2, encoder_hidden_states, cached_kv=ctx.get("kv2"))
        out = h2 + residual
        return out.reshape(b, hh, ww, c)


class DownsampleBlock(nn.Module):
    """(optional stride-2 conv) + N x [ResBlock + AttentionBlock2D]
    (modeling_transformer_v2.py:506-541)."""

    config: MaskGiTUViT_v2Config
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_embeds, encoder_hidden_states, ctx=None,
                 precompute: bool = False):
        cfg = self.config
        if precompute:
            return [{
                "adaln": ResBlock(cfg, self.channels, name=f"res_blocks_{i}",
                                  dtype=self.dtype)(
                    None, cond_embeds, precompute=True),
                "attn": AttentionBlock2D(cfg, self.channels,
                                         name=f"attention_blocks_{i}",
                                         dtype=self.dtype)(
                    None, encoder_hidden_states, precompute=True),
            } for i in range(cfg.num_res_blocks)]
        ctx = ctx or [{}] * cfg.num_res_blocks
        if cfg.force_down_up_sample:
            x = Norm2D(cfg, self.channels, name="downsample_0", dtype=self.dtype)(x)
            x = nn.Conv(self.channels, (2, 2), strides=(2, 2), padding="VALID",
                        use_bias=cfg.use_bias,
                        kernel_init=nn.initializers.truncated_normal(0.02),
                        name="downsample_1", dtype=self.dtype)(x)
        for i in range(cfg.num_res_blocks):
            x = ResBlock(cfg, self.channels, name=f"res_blocks_{i}", dtype=self.dtype)(
                x, cond_embeds, adaln_cache=ctx[i].get("adaln"))
            x = AttentionBlock2D(cfg, self.channels, name=f"attention_blocks_{i}",
                                 dtype=self.dtype)(x, encoder_hidden_states,
                                                   ctx=ctx[i].get("attn"))
        return x


class UpsampleBlock(nn.Module):
    """N x [ResBlock + AttentionBlock2D] + (optional stride-2 conv-transpose)
    (modeling_transformer_v2.py:544-583)."""

    config: MaskGiTUViT_v2Config
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_embeds, encoder_hidden_states, ctx=None,
                 precompute: bool = False):
        cfg = self.config
        if precompute:
            return [{
                "adaln": ResBlock(cfg, self.channels, name=f"res_blocks_{i}",
                                  dtype=self.dtype)(
                    None, cond_embeds, precompute=True),
                "attn": AttentionBlock2D(cfg, self.channels,
                                         name=f"attention_blocks_{i}",
                                         dtype=self.dtype)(
                    None, encoder_hidden_states, precompute=True),
            } for i in range(cfg.num_res_blocks)]
        ctx = ctx or [{}] * cfg.num_res_blocks
        for i in range(cfg.num_res_blocks):
            x = ResBlock(cfg, self.channels, name=f"res_blocks_{i}", dtype=self.dtype)(
                x, cond_embeds, adaln_cache=ctx[i].get("adaln"))
            x = AttentionBlock2D(cfg, self.channels, name=f"attention_blocks_{i}",
                                 dtype=self.dtype)(x, encoder_hidden_states,
                                                   ctx=ctx[i].get("attn"))
        if cfg.force_down_up_sample:
            x = Norm2D(cfg, self.channels, name="upsample_0", dtype=self.dtype)(x)
            x = nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2), padding="VALID",
                                 use_bias=cfg.use_bias,
                                 kernel_init=nn.initializers.truncated_normal(0.02),
                                 name="upsample_1", dtype=self.dtype)(x)
        return x


class GLUFeedForward(nn.Module):
    """GLU FFN with fused-residual prenorm (modeling_transformer_v2.py:926-951).

    Reference quirk: the pre-MLP norm is a LayerNorm even under rmsnorm config
    (reference :929)."""

    config: MaskGiTUViT_v2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_embeds, residual=None, adaln_cache=None,
                 precompute: bool = False):
        cfg = self.config
        if precompute:
            return AdaLNModulation(cfg.hidden_size, cfg.hidden_size,
                                   use_bias=cfg.use_bias,
                                   name="adaLN_modulation", dtype=self.dtype)(
                None, cond_embeds, precompute=True)
        x, residual = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps,
                                use_bias=cfg.use_bias,
                                elementwise_affine=cfg.ln_elementwise_affine,
                                name="pre_mlp_layer_norm", dtype=self.dtype)(
            x, residual, return_residual=True)
        x = AdaLNModulation(cfg.hidden_size, cfg.hidden_size, use_bias=cfg.use_bias,
                            name="adaLN_modulation", dtype=self.dtype)(
            x, cond_embeds, cached=adaln_cache)
        # NOTE: the wi_0/wi_1 up-projections are deliberately NOT manually
        # concatenated: XLA already fuses the pair into one matmul inside the
        # decode scan (profiler: a single 231 us op at 512px/bs8 = the full
        # 47 GFLOP GLU-up at ~peak MFU), and a trace-time concat of the
        # kernels costs +0.26 GB peak HBM for zero latency win (measured
        # 426.1 vs 426.8 ms).
        dense = lambda n, f: nn.Dense(f, use_bias=cfg.use_bias, name=n,
                                      kernel_init=nn.initializers.truncated_normal(0.02),
                                      dtype=self.dtype)
        a = dense("wi_0", cfg.intermediate_size)(x)
        b = dense("wi_1", cfg.intermediate_size)(x)
        out = _GLUDownProj(cfg.hidden_size, use_bias=cfg.use_bias, name="wo",
                           dtype=self.dtype)(a, b)
        return out, residual


class _GLUDownProj(nn.Module):
    """``(gelu(a) * b) @ kernel`` — the FFN down-projection with the GLU
    activation attached.  Param layout matches ``nn.Dense`` exactly (the
    module is named "wo", so checkpoints see ``...ffn.wo.kernel`` as before).

    Default ON on single-device TPU at 128-aligned shapes, and on dp-only
    kernel meshes where the rows shard via shard_map with the weight
    replicated (fsdp/tp meshes stay on XLA: pallas_call is opaque to the
    SPMD partitioner; MUSE_TPU_PALLAS_GLU=0/1 overrides — see
    use_pallas_glu): the op runs as
    the fused Pallas kernel, with a custom_vjp whose backward is the plain
    XLA expression — measured 617 vs 674-703 us/FFN against XLA's producer
    fusion at the research 512px/bs8 trunk shape (ops/pallas/glu_matmul.py).  The erf-GELU VPU work is why XLA's
    fusion sits at ~60% of MXU peak here; a materialization barrier made it
    worse (387.6 vs 381.9 ms end-to-end), the Pallas pipeline overlap is
    what wins.
    """

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        from ..ops.pallas.glu_matmul import glu_down_matmul, use_pallas_glu

        kernel = self.param(
            "kernel", nn.initializers.truncated_normal(0.02),
            (a.shape[-1], self.features)).astype(self.dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                .astype(self.dtype) if self.use_bias else None)
        kdim = a.shape[-1]
        if use_pallas_glu() and kdim % 128 == 0 and self.features % 128 == 0:
            flat = a.reshape(-1, kdim)
            out = glu_down_matmul(flat, b.reshape(-1, kdim), kernel)
            out = out.reshape(a.shape[:-1] + (self.features,))
        else:
            out = (jax.nn.gelu(a, approximate=False) * b) @ kernel
        return out + bias if bias is not None else out


class TransformerLayer(nn.Module):
    """self-attn + cross-attn + GLU FFN, all with AdaLN and fused-residual
    prenorm (modeling_transformer_v2.py:757-792)."""

    config: MaskGiTUViT_v2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states, cond_embeds, residual=None,
                 ctx=None, precompute: bool = False):
        """``precompute=True`` returns the dict of text/cond-derived tensors
        constant across MaskGIT decode steps (cross-attn kv + the three
        AdaLN mapper outputs); ``ctx=`` consumes it, skipping those matmuls
        inside the decode scan (parallel_decode_loop)."""
        cfg = self.config
        if precompute:
            return {
                "self_adaln": AdaLNModulation(
                    cfg.hidden_size, cfg.hidden_size, use_bias=cfg.use_bias,
                    name="self_attn_adaLN_modulation", dtype=self.dtype)(
                    None, cond_embeds, precompute=True),
                "cross_adaln": AdaLNModulation(
                    cfg.hidden_size, cfg.hidden_size, use_bias=cfg.use_bias,
                    name="cross_attn_adaLN_modulation", dtype=self.dtype)(
                    None, cond_embeds, precompute=True),
                "cross_kv": Attention(
                    cfg.hidden_size, cfg.num_attention_heads,
                    use_bias=cfg.use_bias, name="crossattention",
                    dtype=self.dtype)(
                    encoder_hidden_states, encoder_hidden_states,
                    precompute_kv=True),
                "ffn_adaln": GLUFeedForward(cfg, name="ffn", dtype=self.dtype)(
                    None, cond_embeds, precompute=True),
            }
        ctx = ctx or {}
        if _use_fused_attn_sublayer(cfg, x):
            return self._fused_sublayers(x, encoder_hidden_states, cond_embeds,
                                         residual, ctx)
        x, residual = _norm(cfg, cfg.hidden_size, "attn_layer_norm", self.dtype)(
            x, residual, return_residual=True)
        x = AdaLNModulation(cfg.hidden_size, cfg.hidden_size, use_bias=cfg.use_bias,
                            name="self_attn_adaLN_modulation", dtype=self.dtype)(
            x, cond_embeds, cached=ctx.get("self_adaln"))
        x = Attention(cfg.hidden_size, cfg.num_attention_heads, use_bias=cfg.use_bias,
                      name="attention", dtype=self.dtype)(x)
        x, residual = _norm(cfg, cfg.hidden_size, "crossattn_layer_norm", self.dtype)(
            x, residual)
        x = AdaLNModulation(cfg.hidden_size, cfg.hidden_size, use_bias=cfg.use_bias,
                            name="cross_attn_adaLN_modulation", dtype=self.dtype)(
            x, cond_embeds, cached=ctx.get("cross_adaln"))
        x = Attention(cfg.hidden_size, cfg.num_attention_heads, use_bias=cfg.use_bias,
                      name="crossattention", dtype=self.dtype)(
            x, encoder_hidden_states, cached_kv=ctx.get("cross_kv"))
        x, residual = GLUFeedForward(cfg, name="ffn", dtype=self.dtype)(
            x, cond_embeds, residual, adaln_cache=ctx.get("ffn_adaln"))
        return x, residual

    def _fused_sublayers(self, x, encoder_hidden_states, cond_embeds,
                         residual, ctx):
        """Both attention sublayers through the fused Pallas kernels
        (ops/pallas/attn_sublayer — round-4 mega-kernel).  Params are created
        through the SAME submodules/names as the unfused path, so the
        checkpoint tree is identical whichever branch runs."""
        from ..ops.pallas.attn_sublayer import (attn_sublayer_cross,
                                                attn_sublayer_self)

        cfg = self.config
        s1 = _norm(cfg, cfg.hidden_size, "attn_layer_norm", self.dtype)(
            None, params_only=True)
        self_adaln = ctx.get("self_adaln")
        if self_adaln is None:
            self_adaln = AdaLNModulation(
                cfg.hidden_size, cfg.hidden_size, use_bias=cfg.use_bias,
                name="self_attn_adaLN_modulation", dtype=self.dtype)(
                None, cond_embeds, precompute=True)
        w_self = Attention(cfg.hidden_size, cfg.num_attention_heads,
                           use_bias=cfg.use_bias, name="attention",
                           dtype=self.dtype)(x, return_weights=True)
        x, residual = attn_sublayer_self(
            x, residual, s1, self_adaln, w_self["wqkv"], w_self["wout"],
            num_heads=cfg.num_attention_heads, eps=cfg.layer_norm_eps)

        s2 = _norm(cfg, cfg.hidden_size, "crossattn_layer_norm", self.dtype)(
            None, params_only=True)
        cross_adaln = ctx.get("cross_adaln")
        if cross_adaln is None:
            cross_adaln = AdaLNModulation(
                cfg.hidden_size, cfg.hidden_size, use_bias=cfg.use_bias,
                name="cross_attn_adaLN_modulation", dtype=self.dtype)(
                None, cond_embeds, precompute=True)
        w_cross = Attention(cfg.hidden_size, cfg.num_attention_heads,
                            use_bias=cfg.use_bias, name="crossattention",
                            dtype=self.dtype)(x, return_weights=True)
        kv = ctx.get("cross_kv")
        if kv is None:
            # same math as Attention(precompute_kv=True): ehs @ [Wk|Wv]
            kv = jnp.dot(encoder_hidden_states.astype(self.dtype),
                         w_cross["wkv"])
        x, residual = attn_sublayer_cross(
            x, residual, s2, cross_adaln, w_cross["wq"], w_cross["wout"], kv,
            num_heads=cfg.num_attention_heads, eps=cfg.layer_norm_eps)

        x, residual = GLUFeedForward(cfg, name="ffn", dtype=self.dtype)(
            x, cond_embeds, residual, adaln_cache=ctx.get("ffn_adaln"))
        return x, residual


class ConvMlmLayer(nn.Module):
    """1x1 conv -> Norm2D -> 1x1 conv to codebook logits
    (modeling_transformer_v2.py:1002-1022)."""

    config: MaskGiTUViT_v2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        batch, seq_len, hidden = x.shape
        side = int(seq_len ** 0.5)
        x = x.reshape(batch, side, side, hidden)
        x = nn.Conv(cfg.in_channels, (1, 1), use_bias=cfg.use_bias,
                    kernel_init=nn.initializers.zeros, name="conv1", dtype=self.dtype)(x)
        x = Norm2D(cfg, cfg.in_channels, name="layer_norm", dtype=self.dtype)(x)
        logits = nn.Conv(cfg.codebook_size, (1, 1), use_bias=cfg.use_bias,
                         kernel_init=nn.initializers.truncated_normal(0.02),
                         name="conv2", dtype=self.dtype)(x)
        return logits.reshape(batch, seq_len, cfg.codebook_size)


class MaskGiTUViT_v2Module(nn.Module):
    config: MaskGiTUViT_v2Config
    dtype: jnp.dtype = jnp.float32
    # gradient checkpointing for the 22-layer trunk: False | True ('full',
    # recompute everything) | 'dots' (save matmul outputs, recompute only
    # elementwise — jax.checkpoint_policies.dots_with_no_batch_dims_saveable;
    # ~20% of the full-remat recompute FLOPs for modestly more memory)
    remat: Any = False

    @nn.compact
    def __call__(self, input_ids, encoder_hidden_states, cond_embeds, micro_conds,
                 labels=None, loss_weight=None, label_smoothing: float = 0.0,
                 step_ctx=None, return_step_ctx: bool = False):
        """``return_step_ctx=True`` computes and returns every tensor derived
        only from the text/cond inputs (encoder projection, cond MLP, all
        cross-attention kv, all AdaLN mapper outputs) — constant across
        MaskGIT decode steps.  ``step_ctx=`` replays a forward using them,
        hoisting those matmuls out of the decode scan
        (parallel_decode_loop; the reference recomputes them every step,
        modeling_transformer_v2.py:441-448)."""
        cfg = self.config
        if step_ctx is not None:
            ehs, cond = step_ctx["ehs"], step_ctx["cond"]
        else:
            ehs = nn.Dense(cfg.hidden_size, use_bias=cfg.use_bias,
                           kernel_init=nn.initializers.truncated_normal(0.02),
                           name="encoder_proj", dtype=self.dtype)(encoder_hidden_states)
            ehs = _norm(cfg, cfg.hidden_size, "encoder_proj_layer_norm", self.dtype)(ehs)

            micro = sinusoidal_encode(micro_conds.reshape(-1), cfg.micro_cond_encode_dim)
            micro = micro.reshape(micro_conds.shape[0], -1)
            cond = jnp.concatenate([cond_embeds.astype(jnp.float32),
                                    micro.astype(jnp.float32)], axis=1).astype(self.dtype)
            cond = nn.Dense(cfg.hidden_size, use_bias=cfg.use_bias, name="cond_embed_0",
                            kernel_init=nn.initializers.truncated_normal(0.02),
                            dtype=self.dtype)(cond)
            cond = jax.nn.silu(cond)
            cond = nn.Dense(cfg.hidden_size, use_bias=cfg.use_bias, name="cond_embed_2",
                            kernel_init=nn.initializers.truncated_normal(0.02),
                            dtype=self.dtype)(cond)

        if return_step_ctx:
            return {
                "ehs": ehs,
                "cond": cond,
                "down": DownsampleBlock(cfg, cfg.block_out_channels[0],
                                        name="down_blocks_0", dtype=self.dtype)(
                    None, cond, ehs, precompute=True),
                "layers": [TransformerLayer(cfg, name=f"transformer_layers_{i}",
                                            dtype=self.dtype)(
                    None, ehs, cond, precompute=True)
                    for i in range(cfg.num_hidden_layers)],
                "up": UpsampleBlock(cfg, cfg.block_out_channels[0],
                                    name="up_blocks_0", dtype=self.dtype)(
                    None, cond, ehs, precompute=True),
            }

        x = ConvEmbed(cfg, name="embed", dtype=self.dtype)(input_ids)
        x = DownsampleBlock(cfg, cfg.block_out_channels[0], name="down_blocks_0",
                            dtype=self.dtype)(
            x, cond, ehs, ctx=None if step_ctx is None else step_ctx["down"])

        batch, height, width, channels = x.shape
        x = x.reshape(batch, height * width, channels)
        x = _norm(cfg, cfg.block_out_channels[-1], "project_to_hidden_norm", self.dtype)(x)
        x = nn.Dense(cfg.hidden_size, use_bias=cfg.use_bias,
                     kernel_init=nn.initializers.truncated_normal(0.02),
                     name="project_to_hidden", dtype=self.dtype)(x)

        layer_cls = TransformerLayer
        # remat is a training feature; step_ctx decode never needs it
        if self.remat and step_ctx is None:
            policy = None
            if self.remat == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            layer_cls = nn.remat(TransformerLayer, static_argnums=(),
                                 policy=policy)
        residual = None
        for i in range(cfg.num_hidden_layers):
            if step_ctx is None:
                x, residual = layer_cls(cfg, name=f"transformer_layers_{i}",
                                        dtype=self.dtype)(x, ehs, cond, residual)
            else:
                x, residual = TransformerLayer(
                    cfg, name=f"transformer_layers_{i}", dtype=self.dtype)(
                    x, ehs, cond, residual, ctx=step_ctx["layers"][i])
        x = x + residual

        x = _norm(cfg, cfg.hidden_size, "project_from_hidden_norm", self.dtype)(x)
        x = nn.Dense(cfg.block_out_channels[-1], use_bias=cfg.use_bias,
                     kernel_init=nn.initializers.truncated_normal(0.02),
                     name="project_from_hidden", dtype=self.dtype)(x)

        x = x.reshape(batch, height, width, channels)
        x = UpsampleBlock(cfg, cfg.block_out_channels[0], name="up_blocks_0",
                          dtype=self.dtype)(
            x, cond, ehs, ctx=None if step_ctx is None else step_ctx["up"])
        batch, height, width, channels = x.shape
        x = x.reshape(batch, height * width, channels)
        logits = ConvMlmLayer(cfg, name="mlm_layer", dtype=self.dtype)(x)

        if labels is not None:
            if loss_weight is not None:
                loss = weighted_cross_entropy_loss(logits, labels, loss_weight,
                                                   label_smoothing)
            else:
                loss = cross_entropy_loss(logits, labels, label_smoothing)
            return logits, loss
        return logits


def _use_pallas_sample() -> bool:
    """Route the decode sampling tail through the fused Pallas kernel —
    ON by default on TPU (measured 2.95x vs the XLA tail at (8,1024,8192):
    0.91 vs 2.70 ms — one logits read + on-chip gumbel instead of separate
    categorical/gather/logsumexp passes).  MUSE_TPU_PALLAS_SAMPLE=0 disables
    (falls back to jax.random.categorical; the two are distributionally
    equivalent but draw different noise for the same key).  Multi-device:
    ON only inside a ``parallel.kernel_mesh`` context (the kernel then
    shard_maps over the batch axes — ops/pallas/__init__.kernels_enabled)."""
    import os

    from ..ops.pallas import kernels_enabled

    return (os.environ.get("MUSE_TPU_PALLAS_SAMPLE", "1") == "1"
            and kernels_enabled())


def _use_pallas_sample_cfg() -> bool:
    """Fold the CFG combine + vocab crop + fp32 convert INTO the sampling
    kernel (fused_categorical_cfg): the combined fp32 logits tensor never
    exists in HBM.  ON by default on TPU — measured e2e: 512px/bs1 65.7 ->
    59.4 ms, 512px/bs8 404.9 -> 384.3 ms, peak mem 3.26 -> 2.72 GB
    (STATUS.md).  MUSE_TPU_PALLAS_SAMPLE_CFG=0 falls back to the XLA
    combine + fused_categorical path.  Multi-device: mesh-gated like
    _use_pallas_sample."""
    import os

    from ..ops.pallas import kernels_enabled

    return (os.environ.get("MUSE_TPU_PALLAS_SAMPLE_CFG", "1") == "1"
            and kernels_enabled())


def _pallas_interpret() -> bool:
    from ..ops.pallas import interpret_mode

    return interpret_mode()


def decode_schedules(timesteps: int, temperature=1.0, guidance_scale: float = 0.0,
                     guidance_schedule: Optional[str] = None,
                     noise_schedule=sampling.cosine_schedule):
    """Per-step decode schedules, all static (reference
    modeling_transformer_v2.py:361-382).  Shared by generate2 and the
    step-distillation teacher (training/distill.py) so the two can never
    drift: the distilled student's K-step mask ratios coincide with the
    teacher's at every 2nd step because both come from
    ``noise_schedule((i+1)/T)``."""
    if isinstance(temperature, (tuple, list)):
        temperatures = np.linspace(temperature[0], temperature[1], timesteps)
    else:
        temperatures = np.linspace(temperature, 0.01, timesteps)
    if guidance_schedule == "linear":
        guidance_scales = np.linspace(0, guidance_scale, timesteps)
    elif guidance_schedule == "cosine":
        ratios = (np.arange(timesteps) + 1) / timesteps
        guidance_scales = np.floor(np.cos((1 - ratios) * np.pi * 0.5) * guidance_scale)
    else:
        guidance_scales = np.full(timesteps, guidance_scale)
    ratios = (np.arange(timesteps, dtype=np.float64) + 1) / timesteps
    mask_ratios = np.asarray(
        jax.device_get(noise_schedule(jnp.asarray(ratios, dtype=jnp.float32))))
    return (jnp.asarray(temperatures, dtype=jnp.float32),
            jnp.asarray(guidance_scales, dtype=jnp.float32),
            jnp.asarray(mask_ratios, dtype=jnp.float32))


def parallel_decode_loop(apply_fn, cfg, params, input_ids, ehs, conds, micros,
                         key, temperatures, guidance_scales, mask_ratios, *,
                         use_cfg: bool, seq_len: int, timesteps: int,
                         return_intermediate: bool = False,
                         return_trajectory: bool = False):
    """Pure, traceable MaskGIT decode loop (reference
    modeling_transformer_v2.py:422-474) — usable standalone (jitted by
    generate2) or embedded into a larger program (e.g. the fully-fused
    text->image pipeline in pipelines/pipeline_muse.py).

    ``return_trajectory=True`` returns ``(final, states, sampled)`` where
    ``states[t]`` is the carry-in ids at step t (mask tokens at the
    still-unknown positions; ``states[0]`` is all-mask) and ``sampled[t]``
    is the full committed grid after step t.  This is the teacher-side
    contract for step/guidance distillation (training/distill.py): the
    pair (states[t], sampled[t+k-1]) is a k-steps-to-one training example."""

    # hoist every text/cond-derived tensor out of the scan: encoder
    # projection, cond MLP, all cross-attn kv, all AdaLN mapper outputs are
    # constant across decode steps — the reference recomputes them in every
    # forward (modeling_transformer_v2.py:441-448); computing them once makes
    # them scan constants.  MUSE_TPU_DECODE_CTX=0 restores per-step compute.
    step_ctx = None
    if os.environ.get("MUSE_TPU_DECODE_CTX", "1") == "1":
        step_ctx = apply_fn({"params": params}, input_ids, ehs, conds,
                            micros, return_step_ctx=True)

    def step(carry, step_idx):
        ids, key = carry
        model_input = jnp.concatenate([ids, ids], axis=0) if use_cfg else ids
        raw_logits = apply_fn({"params": params}, model_input, ehs, conds,
                              micros, step_ctx=step_ctx)

        key, sample_key, mask_key = jax.random.split(key, 3)
        if use_cfg and _use_pallas_sample_cfg():
            # everything after the model — vocab crop, fp32 convert, CFG
            # split+combine, gumbel sample, confidence — in ONE streaming
            # kernel over the raw bf16 logits; none of those intermediates
            # touch HBM (ops/pallas/fused_sample.fused_categorical_cfg)
            from ..ops.pallas.fused_sample import fused_categorical_cfg

            seed = jax.random.randint(sample_key, (), 0, 2 ** 31 - 1,
                                      jnp.int32)
            sampled_ids, sampled_sel = fused_categorical_cfg(
                seed, raw_logits, guidance_scales[step_idx],
                cfg.codebook_size, interpret=_pallas_interpret())
            logits = None
        else:
            logits = raw_logits[..., : cfg.codebook_size].astype(jnp.float32)
            if use_cfg:
                cond_logits, uncond_logits = jnp.split(logits, 2, axis=0)
                logits = uncond_logits + guidance_scales[step_idx] * (
                    cond_logits - uncond_logits)
            if _use_pallas_sample():
                # one streaming pass over the combined logits: on-chip gumbel
                # + argmax + online-logsumexp confidence; distributionally
                # equivalent to the XLA path below
                from ..ops.pallas.fused_sample import fused_categorical

                seed = jax.random.randint(sample_key, (), 0, 2 ** 31 - 1,
                                          jnp.int32)
                sampled_ids, sampled_sel = fused_categorical(
                    seed, logits, interpret=_pallas_interpret())
            else:
                sampled_ids = jax.random.categorical(sample_key, logits,
                                                     axis=-1)
                sampled_sel = None
        # intermediate frames record the RAW samples, before already-known
        # tokens are restored (reference modeling_transformer_v2.py:447-450)
        raw_sampled_ids = sampled_ids
        unknown_map = ids == cfg.mask_token_id
        sampled_ids = jnp.where(unknown_map, sampled_ids, ids)

        mask_len = jnp.floor(seq_len * mask_ratios[step_idx])
        mask_len = jnp.maximum(
            1.0, jnp.minimum(jnp.sum(unknown_map, axis=-1, keepdims=True) - 1.0,
                             mask_len))
        if sampled_sel is None:
            # p(sampled) = exp(logit[sampled] - logsumexp(logits)): identical
            # to softmax-then-gather (reference :443-446) without
            # materializing the full (B, S, V) probability tensor in HBM —
            # at 512px/bs8 that tensor is 268 MB per step.  Gathering at the
            # MERGED ids is fine: known positions are overwritten below.
            sel_logit = jnp.take_along_axis(logits, sampled_ids[..., None],
                                            axis=-1)[..., 0]
            selected = jnp.exp(sel_logit - jax.nn.logsumexp(logits, axis=-1))
        else:
            # kernel confidence is at the RAW samples; known positions are
            # overwritten below, so the difference is immaterial
            selected = sampled_sel
        selected = jnp.where(unknown_map, selected, jnp.finfo(jnp.float32).max)
        masking = sampling.mask_by_random_topk(mask_key, mask_len, selected,
                                               temperatures[step_idx])
        new_ids = jnp.where(masking, cfg.mask_token_id, sampled_ids)
        out = raw_sampled_ids if return_intermediate else None
        state_in = ids if return_trajectory else None
        return (new_ids.astype(jnp.int32), key), (out, sampled_ids, state_in)

    (_, _), (intermediate, all_sampled, states) = jax.lax.scan(
        step, (input_ids.astype(jnp.int32), key), jnp.arange(timesteps))
    final = all_sampled[-1]
    if return_trajectory:
        return final, states, all_sampled
    if return_intermediate:
        return final, intermediate
    return final


class MaskGiTUViT_v2(ModelMixin):
    config_class = MaskGiTUViT_v2Config
    _class_name = "MaskGiTUViT_v2"
    _class_name_aliases = ("MaskGiTUViT",)
    _transposed_conv_patterns = (r"upsample_1\.kernel$",)

    def __init__(self, *args, remat: Any = False, **kwargs):
        self._remat = remat
        super().__init__(*args, **kwargs)
        # the reference unconditionally re-registers mask_token_id as
        # vocab_size - 1 (modeling_transformer_v2.py:158)
        if self.config.mask_token_id != self.config.vocab_size - 1:
            self.config = self.config.replace(
                mask_token_id=self.config.vocab_size - 1)
            self.module = self.build_module()
            self._jit_cache.clear()

    def build_module(self):
        return MaskGiTUViT_v2Module(self.config, dtype=self.dtype, remat=self._remat)

    def example_inputs(self):
        cfg = self.config
        seq = 1024 if cfg.force_down_up_sample else 256
        return (
            jnp.zeros((1, seq), dtype=jnp.int32),
            jnp.zeros((1, 77, cfg.encoder_hidden_size), dtype=self.dtype),
            jnp.zeros((1, cfg.cond_embed_dim), dtype=self.dtype),
            jnp.zeros((1, 5), dtype=jnp.float32),
        )

    def init_params(self, rng):
        params = super().init_params(rng)
        cfg = self.config
        # reference weight-init specials (modeling_transformer_v2.py:209-223):
        # mlm conv2 kernel tied to the input embedding at init; adaLN mappers
        # and mlm conv1 start at zero (conv1 zero handled by kernel_init).
        emb = params["embed"]["embeddings"]["embedding"]
        tied = emb[: cfg.codebook_size, :].T[None, None, :, :]
        params["mlm_layer"]["conv2"]["kernel"] = jnp.asarray(tied)

        def zero_adaln(tree):
            for key, value in tree.items():
                if key.endswith("adaLN_modulation"):
                    value["mapper"]["kernel"] = jnp.zeros_like(value["mapper"]["kernel"])
                    if "bias" in value["mapper"]:
                        value["mapper"]["bias"] = jnp.zeros_like(value["mapper"]["bias"])
                elif isinstance(value, dict):
                    zero_adaln(value)

        zero_adaln(params)
        return params

    def __call__(self, input_ids, encoder_hidden_states, cond_embeds, micro_conds,
                 labels=None, loss_weight=None, label_smoothing: float = 0.0):
        return self.jit_apply("__call__", input_ids, encoder_hidden_states,
                              cond_embeds, micro_conds, labels, loss_weight,
                              label_smoothing=float(label_smoothing))

    # Legacy: kept for API parity (reference :327-328)
    def generate(self, *a, **k):
        raise NotImplementedError("use generate2")

    def generate2(
        self,
        encoder_hidden_states,
        cond_embeds,
        micro_conds,
        empty_embeds=None,
        empty_cond_embeds=None,
        input_ids=None,
        negative_embeds=None,
        negative_cond_embeds=None,
        temperature=1.0,
        timesteps: int = 18,
        guidance_scale: float = 0.0,
        guidance_schedule: Optional[str] = None,
        noise_schedule=sampling.cosine_schedule,
        key=None,
        return_intermediate: bool = False,
        seq_len: Optional[int] = None,
        # Legacy kwargs accepted for pipeline compatibility (reference :349-352)
        generator=None,
        topk_filter_thres=None,
        noise_type=None,
        predict_all_tokens=None,
        use_tqdm=None,
    ):
        """MaskGIT parallel decode with CFG — one XLA program
        (reference modeling_transformer_v2.py:330-479)."""
        cfg = self.config
        if key is None:
            key = jax.random.PRNGKey(0) if generator is None else generator
        batch_size = encoder_hidden_states.shape[0]
        if seq_len is None:
            seq_len = 256
        if input_ids is None:
            input_ids = jnp.full((batch_size, seq_len), cfg.mask_token_id,
                                 dtype=jnp.int32)

        temperatures, guidance_scales, mask_ratios = decode_schedules(
            timesteps, temperature, guidance_scale, guidance_schedule,
            noise_schedule)

        if micro_conds.shape[0] == 1:
            micro_conds = jnp.broadcast_to(micro_conds, (batch_size,) + micro_conds.shape[1:])

        use_cfg = guidance_scale > 0
        if use_cfg:
            uncond_ehs = negative_embeds if negative_embeds is not None else empty_embeds
            if uncond_ehs.shape[0] == 1:
                uncond_ehs = jnp.broadcast_to(uncond_ehs, encoder_hidden_states.shape)
            ehs = jnp.concatenate([encoder_hidden_states, uncond_ehs], axis=0)
            uncond_cond = negative_cond_embeds if negative_cond_embeds is not None \
                else empty_cond_embeds
            if uncond_cond.shape[0] == 1:
                uncond_cond = jnp.broadcast_to(uncond_cond, cond_embeds.shape)
            conds = jnp.concatenate([cond_embeds, uncond_cond], axis=0)
            micros = jnp.concatenate([micro_conds, micro_conds], axis=0)
        else:
            ehs, conds, micros = encoder_hidden_states, cond_embeds, micro_conds

        cache_key = ("generate2", timesteps, use_cfg, bool(return_intermediate),
                     int(seq_len))
        if cache_key not in self._jit_cache:
            run = jax.jit(functools.partial(
                parallel_decode_loop, self.module.apply, cfg,
                use_cfg=use_cfg, seq_len=int(seq_len), timesteps=timesteps,
                return_intermediate=return_intermediate))
            self._jit_cache[cache_key] = run
        return self._jit_cache[cache_key](self.params, input_ids, ehs, conds, micros,
                                          key, temperatures, guidance_scales,
                                          mask_ratios)
