"""Taming-transformers VQGAN tokenizer, TPU-native.

Reference parity: muse/modeling_taming_vqgan.py (adds single-head conv-QKV
AttnBlocks at configured resolutions, a MidBlock with attention, and
quant_conv/post_quant_conv 1x1 projections around the quantizer).

Reproduced reference quirks (published checkpoints depend on them):
  * blocks apply their attention only when ``len(attn) > 1``
    (modeling_taming_vqgan.py:210-211, 249-250).
  * Downsample pads (0,1,0,1) then convs with VALID stride 2
    (modeling_taming_vqgan.py:55-59).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.configuration import BaseConfig
from ..core.modeling import ModelMixin
from ..ops.vq import VectorQuantizer
from .maskgit_vqgan import _VQWrapperMixin

__all__ = ["VQGANModel", "VQGANConfig"]


@dataclasses.dataclass(frozen=True)
class VQGANConfig(BaseConfig):
    # defaults: modeling_taming_vqgan.py:514-529
    resolution: int = 256
    num_channels: int = 3
    hidden_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    no_attn_mid_block: bool = False
    z_channels: int = 256
    num_embeddings: int = 1024
    quantized_embed_dim: int = 256
    dropout: float = 0.0
    resample_with_conv: bool = True
    commitment_cost: float = 0.25

    @property
    def num_resolutions(self) -> int:
        return len(self.channel_mult)


def _conv(features, kernel, name, strides=1, padding="SAME", use_bias=True,
          dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding=padding, use_bias=use_bias, name=name, dtype=dtype)


class ResnetBlock(nn.Module):
    """GroupNorm/SiLU/conv x2 with proper shortcut
    (modeling_taming_vqgan.py:65-134 — unlike maskgit's, the shortcut here
    consumes the residual input)."""

    in_channels: int
    out_channels: int
    use_conv_shortcut: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1", dtype=self.dtype)(x)
        h = jax.nn.silu(h)
        h = _conv(self.out_channels, 3, "conv1", dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2", dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        h = _conv(self.out_channels, 3, "conv2", dtype=self.dtype)(h)
        if self.in_channels != self.out_channels:
            if self.use_conv_shortcut:
                residual = _conv(self.out_channels, 3, "conv_shortcut",
                                 dtype=self.dtype)(residual)
            else:
                residual = _conv(self.out_channels, 1, "nin_shortcut",
                                 dtype=self.dtype)(residual)
        return h + residual


class AttnBlock(nn.Module):
    """Single-head self-attention with 1x1-conv QKV over the spatial map
    (modeling_taming_vqgan.py:137-174).  On TPU this is three 1x1 matmuls and
    one (HW x HW) attention — all MXU work."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm", dtype=self.dtype)(x)
        q = _conv(self.channels, 1, "q", dtype=self.dtype)(h)
        k = _conv(self.channels, 1, "k", dtype=self.dtype)(h)
        v = _conv(self.channels, 1, "v", dtype=self.dtype)(h)
        b, hh, ww, c = q.shape
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k,
                          preferred_element_type=jnp.float32) * (int(c) ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        h = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, hh, ww, c)
        h = _conv(self.channels, 1, "proj_out", dtype=self.dtype)(h)
        return h + residual


class Downsample(nn.Module):
    # modeling_taming_vqgan.py:47-62
    channels: int
    with_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return _conv(self.channels, 3, "conv", strides=2, padding="VALID",
                         dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    # modeling_taming_vqgan.py:27-44
    channels: int
    with_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.with_conv:
            x = _conv(self.channels, 3, "conv", dtype=self.dtype)(x)
        return x


class DownsamplingBlock(nn.Module):
    # modeling_taming_vqgan.py:219-255
    config: VQGANConfig
    curr_res: int
    block_idx: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        in_mult = (1,) + tuple(cfg.channel_mult)
        block_in = cfg.hidden_channels * in_mult[self.block_idx]
        block_out = cfg.hidden_channels * cfg.channel_mult[self.block_idx]
        has_attn = self.curr_res in cfg.attn_resolutions
        num_attn = cfg.num_res_blocks if has_attn else 0
        for j in range(cfg.num_res_blocks):
            h = ResnetBlock(block_in if j == 0 else block_out, block_out,
                            name=f"block_{j}", dtype=self.dtype)(h)
            # reference quirk: attention applies only when len(attn) > 1
            if has_attn and num_attn > 1:
                h = AttnBlock(block_out, name=f"attn_{j}", dtype=self.dtype)(h)
            elif has_attn:
                # params must still exist for checkpoint compatibility
                AttnBlock(block_out, name=f"attn_{j}", dtype=self.dtype)(h)
        if self.block_idx != cfg.num_resolutions - 1:
            h = Downsample(block_out, cfg.resample_with_conv, name="downsample",
                           dtype=self.dtype)(h)
        return h


class UpsamplingBlock(nn.Module):
    # modeling_taming_vqgan.py:177-216 (note: num_res_blocks + 1 blocks)
    config: VQGANConfig
    curr_res: int
    block_idx: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        if self.block_idx == cfg.num_resolutions - 1:
            block_in = cfg.hidden_channels * cfg.channel_mult[-1]
        else:
            block_in = cfg.hidden_channels * cfg.channel_mult[self.block_idx + 1]
        block_out = cfg.hidden_channels * cfg.channel_mult[self.block_idx]
        has_attn = self.curr_res in cfg.attn_resolutions
        num_attn = cfg.num_res_blocks + 1 if has_attn else 0
        for j in range(cfg.num_res_blocks + 1):
            h = ResnetBlock(block_in if j == 0 else block_out, block_out,
                            name=f"block_{j}", dtype=self.dtype)(h)
            if has_attn and num_attn > 1:
                h = AttnBlock(block_out, name=f"attn_{j}", dtype=self.dtype)(h)
        if self.block_idx != 0:
            h = Upsample(block_out, cfg.resample_with_conv, name="upsample",
                         dtype=self.dtype)(h)
        return h


class MidBlock(nn.Module):
    # modeling_taming_vqgan.py:258-285
    config: VQGANConfig
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        h = ResnetBlock(self.channels, self.channels, name="block_1",
                        dtype=self.dtype)(h)
        if not self.config.no_attn_mid_block:
            h = AttnBlock(self.channels, name="attn_1", dtype=self.dtype)(h)
        h = ResnetBlock(self.channels, self.channels, name="block_2",
                        dtype=self.dtype)(h)
        return h


class Encoder(nn.Module):
    config: VQGANConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        h = _conv(cfg.hidden_channels, 3, "conv_in", dtype=self.dtype)(pixel_values)
        curr_res = cfg.resolution
        for i_level in range(cfg.num_resolutions):
            h = DownsamplingBlock(cfg, curr_res, i_level, name=f"down_{i_level}",
                                  dtype=self.dtype)(h)
            if i_level != cfg.num_resolutions - 1:
                curr_res //= 2
        mid_channels = cfg.hidden_channels * cfg.channel_mult[-1]
        h = MidBlock(cfg, mid_channels, name="mid", dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out", dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        return _conv(cfg.z_channels, 3, "conv_out", dtype=self.dtype)(h)


class Decoder(nn.Module):
    config: VQGANConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        block_in = cfg.hidden_channels * cfg.channel_mult[-1]
        curr_res = cfg.resolution // 2 ** (cfg.num_resolutions - 1)
        h = _conv(block_in, 3, "conv_in", dtype=self.dtype)(z)
        h = MidBlock(cfg, block_in, name="mid", dtype=self.dtype)(h)
        # resolutions as constructed in reverse then re-reversed
        # (modeling_taming_vqgan.py:367-372)
        res_at = {}
        r = curr_res
        for i_level in reversed(range(cfg.num_resolutions)):
            res_at[i_level] = r
            if i_level != 0:
                r *= 2
        for i_level in reversed(range(cfg.num_resolutions)):
            h = UpsamplingBlock(cfg, res_at[i_level], i_level, name=f"up_{i_level}",
                                dtype=self.dtype)(h)
        block_out = cfg.hidden_channels * cfg.channel_mult[0]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out", dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        return _conv(cfg.num_channels, 3, "conv_out", dtype=self.dtype)(h)


class VQGANModule(nn.Module):
    config: VQGANConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, dtype=self.dtype)
        self.decoder = Decoder(cfg, dtype=self.dtype)
        self.quantize = VectorQuantizer(cfg.num_embeddings, cfg.quantized_embed_dim,
                                        cfg.commitment_cost, metric="sq_l2")
        self.quant_conv = nn.Conv(cfg.quantized_embed_dim, (1, 1), name="quant_conv",
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1), name="post_quant_conv",
                                       dtype=self.dtype)

    def encode(self, pixel_values, return_loss: bool = False):
        h = self.quant_conv(self.encoder(pixel_values))
        return self.quantize(h, return_loss)

    def decode(self, quantized_states):
        return self.decoder(self.post_quant_conv(quantized_states))

    def decode_code(self, codebook_indices):
        return self.decode(self.quantize.get_codebook_entry(codebook_indices))

    def get_code(self, pixel_values):
        return self.quantize.get_code(self.quant_conv(self.encoder(pixel_values)))

    def get_soft_code(self, pixel_values, temp: float = 1.0, stochastic: bool = False,
                      key=None):
        h = self.quant_conv(self.encoder(pixel_values))
        return self.quantize.get_soft_code(h, temp, stochastic, key)

    def __call__(self, pixel_values, return_loss: bool = False):
        z_q, indices, loss = self.encode(pixel_values, return_loss)
        recon = self.decode(z_q)
        return recon, z_q, indices, loss


class VQGANModel(_VQWrapperMixin, ModelMixin):
    config_class = VQGANConfig
    _class_name = "VQGANModel"

    def build_module(self):
        return VQGANModule(self.config, dtype=self.dtype)

    def example_inputs(self):
        r = self.config.resolution
        return (jnp.zeros((1, r, r, self.config.num_channels), dtype=self.dtype),)
