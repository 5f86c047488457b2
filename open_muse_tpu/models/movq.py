"""MOVQ tokenizer (Kandinsky-2): VQGAN whose decoder is spatially conditioned
on the quantized latent via SpatialNorm.  TPU-native (NHWC).

Reference parity: muse/modeling_movq.py (SpatialNorm :21-49, linear-QKV
AttnBlock :159-224, MoVQDecoder :392-452, cdist VectorQuantizer :455-552,
MOVQ :555-619).
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

__all__ = ["MOVQ", "MOVQConfig"]


@dataclasses.dataclass(frozen=True)
class MOVQConfig(BaseConfig):
    # defaults: modeling_movq.py:557-572
    resolution: int = 256
    num_channels: int = 3
    out_channels: int = 3
    hidden_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32,)
    z_channels: int = 4
    double_z: bool = False
    num_embeddings: int = 16384
    quantized_embed_dim: int = 4
    dropout: float = 0.0
    resample_with_conv: bool = True
    commitment_cost: float = 0.25

    @property
    def num_resolutions(self) -> int:
        return len(self.channel_mult)


def _conv(features, kernel, name, strides=1, padding="SAME", dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding=padding, name=name, dtype=dtype)


class SpatialNorm(nn.Module):
    """GroupNorm modulated by the quantized latent zq through 1x1 convs
    (modeling_movq.py:21-49)."""

    f_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, zq):
        b, h, w, _ = f.shape
        zq = jax.image.resize(zq, (b, h, w, zq.shape[-1]), method="nearest")
        norm_f = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_layer",
                              dtype=self.dtype)(f)
        conv_y = _conv(self.f_channels, 1, "conv_y", dtype=self.dtype)(zq)
        conv_b = _conv(self.f_channels, 1, "conv_b", dtype=self.dtype)(zq)
        return norm_f * conv_y + conv_b


class ResnetBlock(nn.Module):
    # modeling_movq.py:97-156
    in_channels: int
    out_channels: int
    spatial: bool = False  # norms are SpatialNorm when zq conditioning is on
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None):
        def norm(name, channels, h):
            if self.spatial:
                return SpatialNorm(channels, name=name, dtype=self.dtype)(h, zq)
            return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name,
                                dtype=self.dtype)(h)

        residual = x
        h = norm("norm1", self.in_channels, x)
        h = jax.nn.silu(h)
        h = _conv(self.out_channels, 3, "conv1", dtype=self.dtype)(h)
        h = norm("norm2", self.out_channels, h)
        h = jax.nn.silu(h)
        h = _conv(self.out_channels, 3, "conv2", dtype=self.dtype)(h)
        if self.in_channels != self.out_channels:
            residual = _conv(self.out_channels, 1, "nin_shortcut",
                             dtype=self.dtype)(residual)
        return h + residual


class AttnBlock(nn.Module):
    """Linear-QKV single-head attention with fp32 softmax
    (modeling_movq.py:159-224)."""

    channels: int
    spatial: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None):
        residual = x
        if self.spatial:
            h = SpatialNorm(self.channels, name="norm", dtype=self.dtype)(x, zq)
        else:
            h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm",
                             dtype=self.dtype)(x)
        b, hh, ww, c = h.shape
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, name="q", dtype=self.dtype)(h)
        k = nn.Dense(c, name="k", dtype=self.dtype)(h)
        v = nn.Dense(c, name="v", dtype=self.dtype)(h)
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, dtype=jnp.float32))
        attn = jnp.einsum("bqc,bkc->bqk", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        h = jnp.einsum("bqk,bkc->bqc", attn, v)
        h = nn.Dense(c, name="proj_out", dtype=self.dtype)(h)
        return h.reshape(b, hh, ww, c) + residual


class Downsample(nn.Module):
    # modeling_movq.py:79-94
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
    # modeling_movq.py:65-76
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
    # modeling_movq.py:269-305
    config: MOVQConfig
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
        for j in range(cfg.num_res_blocks):
            h = ResnetBlock(block_in if j == 0 else block_out, block_out,
                            name=f"block_{j}", dtype=self.dtype)(h)
            # reference quirk: attention applied only when len(attn) > 1
            # (modeling_movq.py:299-300)
            if has_attn and cfg.num_res_blocks > 1:
                h = AttnBlock(block_out, name=f"attn_{j}", dtype=self.dtype)(h)
            elif has_attn:
                AttnBlock(block_out, name=f"attn_{j}", dtype=self.dtype)(h)
        if self.block_idx != cfg.num_resolutions - 1:
            h = Downsample(block_out, cfg.resample_with_conv, name="downsample",
                           dtype=self.dtype)(h)
        return h


class UpsamplingBlock(nn.Module):
    # modeling_movq.py:227-266 (num_res_blocks + 1 blocks, zq conditioning)
    config: MOVQConfig
    curr_res: int
    block_idx: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, zq):
        cfg = self.config
        if self.block_idx == cfg.num_resolutions - 1:
            block_in = cfg.hidden_channels * cfg.channel_mult[-1]
        else:
            block_in = cfg.hidden_channels * cfg.channel_mult[self.block_idx + 1]
        block_out = cfg.hidden_channels * cfg.channel_mult[self.block_idx]
        has_attn = self.curr_res in cfg.attn_resolutions
        for j in range(cfg.num_res_blocks + 1):
            h = ResnetBlock(block_in if j == 0 else block_out, block_out, spatial=True,
                            name=f"block_{j}", dtype=self.dtype)(h, zq)
            if has_attn and (cfg.num_res_blocks + 1) > 1:
                h = AttnBlock(block_out, spatial=True, name=f"attn_{j}",
                              dtype=self.dtype)(h, zq)
        if self.block_idx != 0:
            h = Upsample(block_out, cfg.resample_with_conv, name="upsample",
                         dtype=self.dtype)(h)
        return h


class MidBlock(nn.Module):
    # modeling_movq.py:308-334 (attention always present)
    config: MOVQConfig
    channels: int
    spatial: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, zq=None):
        h = ResnetBlock(self.channels, self.channels, spatial=self.spatial,
                        name="block_1", dtype=self.dtype)(h, zq)
        h = AttnBlock(self.channels, spatial=self.spatial, name="attn_1",
                      dtype=self.dtype)(h, zq)
        h = ResnetBlock(self.channels, self.channels, spatial=self.spatial,
                        name="block_2", dtype=self.dtype)(h, zq)
        return h


class Encoder(nn.Module):
    # modeling_movq.py:337-389
    config: MOVQConfig
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


class MoVQDecoder(nn.Module):
    # modeling_movq.py:392-452
    config: MOVQConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, zq):
        cfg = self.config
        block_in = cfg.hidden_channels * cfg.channel_mult[-1]
        curr_res = cfg.resolution // 2 ** (cfg.num_resolutions - 1)
        h = _conv(block_in, 3, "conv_in", dtype=self.dtype)(z)
        h = MidBlock(cfg, block_in, spatial=True, name="mid", dtype=self.dtype)(h, zq)
        res_at = {}
        r = curr_res
        for i_level in reversed(range(cfg.num_resolutions)):
            res_at[i_level] = r
            if i_level != 0:
                r *= 2
        for i_level in reversed(range(cfg.num_resolutions)):
            h = UpsamplingBlock(cfg, res_at[i_level], i_level, name=f"up_{i_level}",
                                dtype=self.dtype)(h, zq)
        block_out = cfg.hidden_channels * cfg.channel_mult[0]
        h = SpatialNorm(block_out, name="norm_out", dtype=self.dtype)(h, zq)
        h = jax.nn.silu(h)
        return _conv(cfg.num_channels, 3, "conv_out", dtype=self.dtype)(h)


class MOVQModule(nn.Module):
    config: MOVQConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, dtype=self.dtype)
        self.decoder = MoVQDecoder(cfg, dtype=self.dtype)
        self.quantize = VectorQuantizer(cfg.num_embeddings, cfg.quantized_embed_dim,
                                        cfg.commitment_cost, metric="l2")
        self.quant_conv = nn.Conv(cfg.quantized_embed_dim, (1, 1), name="quant_conv",
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1), name="post_quant_conv",
                                       dtype=self.dtype)

    def encode(self, pixel_values, return_loss: bool = False):
        h = self.quant_conv(self.encoder(pixel_values))
        return self.quantize(h, return_loss)

    def decode(self, quant):
        # decoder consumes post_quant projection AND raw quant for SpatialNorm
        # (modeling_movq.py:595-598)
        return self.decoder(self.post_quant_conv(quant), quant)

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


class MOVQ(_VQWrapperMixin, ModelMixin):
    config_class = MOVQConfig
    _class_name = "MOVQ"

    def build_module(self):
        return MOVQModule(self.config, dtype=self.dtype)

    def example_inputs(self):
        r = self.config.resolution
        return (jnp.zeros((1, r, r, self.config.num_channels), dtype=self.dtype),)
