"""MaskGIT's VQGAN tokenizer (f16, 1024-entry codebook), TPU-native.

Reference parity: muse/modeling_maskgit_vqgan.py (encoder: conv_in -> 5
DownsamplingBlocks with avg-pool downsample -> mid res blocks -> GroupNorm ->
conv_out; decoder mirrored with nearest-neighbour upsampling; squared-L2
vector quantizer).  All convs are NHWC; GroupNorm runs channels-last; the
quantizer matmul hits the MXU directly.

Behavioral quirks of the reference that published checkpoints depend on are
reproduced intentionally:
  * ResnetBlock applies its 1x1 shortcut to the *conv2 output*, not the
    residual input (modeling_maskgit_vqgan.py:82-85).
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

__all__ = ["MaskGitVQGAN", "MaskGitVQGANConfig"]


@dataclasses.dataclass(frozen=True)
class MaskGitVQGANConfig(BaseConfig):
    # defaults: modeling_maskgit_vqgan.py:353-366
    resolution: int = 256
    num_channels: int = 3
    hidden_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    z_channels: int = 256
    num_embeddings: int = 1024
    quantized_embed_dim: int = 256
    dropout: float = 0.0
    resample_with_conv: bool = True
    commitment_cost: float = 0.25

    @property
    def num_resolutions(self) -> int:
        return len(self.channel_mult)

    @property
    def reduction_factor(self) -> int:
        return 2 ** (self.num_resolutions - 1)

    @property
    def latent_size(self) -> int:
        return self.resolution // self.reduction_factor


def _conv(features, kernel, name, use_bias=True, dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), padding="SAME", use_bias=use_bias,
                   name=name, dtype=dtype)


class ResnetBlock(nn.Module):
    """GroupNorm/SiLU/conv x2 (modeling_maskgit_vqgan.py:48-85)."""

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1", dtype=self.dtype)(x)
        h = jax.nn.silu(h)
        h = _conv(self.out_channels, 3, "conv1", use_bias=False, dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2", dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        h = _conv(self.out_channels, 3, "conv2", use_bias=False, dtype=self.dtype)(h)
        if self.in_channels != self.out_channels:
            # reference quirk: shortcut conv consumes conv2's output
            # (modeling_maskgit_vqgan.py:82-83)
            residual = _conv(self.out_channels, 1, "nin_shortcut", use_bias=False,
                             dtype=self.dtype)(h)
        return h + residual


class DownsamplingBlock(nn.Module):
    """Res blocks + avg-pool downsample (modeling_maskgit_vqgan.py:88-114)."""

    config: MaskGitVQGANConfig
    block_idx: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        in_mult = (1,) + tuple(cfg.channel_mult)
        block_in = cfg.hidden_channels * in_mult[self.block_idx]
        block_out = cfg.hidden_channels * cfg.channel_mult[self.block_idx]
        for j in range(cfg.num_res_blocks):
            h = ResnetBlock(block_in if j == 0 else block_out, block_out,
                            name=f"block_{j}", dtype=self.dtype)(h)
        if self.block_idx != cfg.num_resolutions - 1:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        return h


class UpsamplingBlock(nn.Module):
    """Res blocks + nearest-2x upsample conv (modeling_maskgit_vqgan.py:117-149)."""

    config: MaskGitVQGANConfig
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
        for j in range(cfg.num_res_blocks):
            h = ResnetBlock(block_in if j == 0 else block_out, block_out,
                            name=f"block_{j}", dtype=self.dtype)(h)
        if self.block_idx != 0:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
            h = _conv(block_out, 3, "upsample_conv", dtype=self.dtype)(h)
        return h


class Encoder(nn.Module):
    config: MaskGitVQGANConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        h = _conv(cfg.hidden_channels, 3, "conv_in", use_bias=False, dtype=self.dtype)(pixel_values)
        for i_level in range(cfg.num_resolutions):
            h = DownsamplingBlock(cfg, i_level, name=f"down_{i_level}", dtype=self.dtype)(h)
        mid_channels = cfg.hidden_channels * cfg.channel_mult[-1]
        for j in range(cfg.num_res_blocks):
            h = ResnetBlock(mid_channels, mid_channels, name=f"mid_{j}", dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out", dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        h = _conv(cfg.z_channels, 1, "conv_out", dtype=self.dtype)(h)
        return h


class Decoder(nn.Module):
    config: MaskGitVQGANConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        block_in = cfg.hidden_channels * cfg.channel_mult[-1]
        h = _conv(block_in, 3, "conv_in", dtype=self.dtype)(z)
        for j in range(cfg.num_res_blocks):
            h = ResnetBlock(block_in, block_in, name=f"mid_{j}", dtype=self.dtype)(h)
        for i_level in reversed(range(cfg.num_resolutions)):
            h = UpsamplingBlock(cfg, i_level, name=f"up_{i_level}", dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out", dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        h = _conv(cfg.num_channels, 3, "conv_out", dtype=self.dtype)(h)
        return h


class MaskGitVQGANModule(nn.Module):
    config: MaskGitVQGANConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quantize = VectorQuantizer(
            self.config.num_embeddings,
            self.config.quantized_embed_dim,
            self.config.commitment_cost,
            metric="sq_l2",
        )

    def encode(self, pixel_values, return_loss: bool = False):
        h = self.encoder(pixel_values)
        return self.quantize(h, return_loss)

    def decode(self, quantized_states):
        return self.decoder(quantized_states)

    def decode_code(self, codebook_indices):
        z_q = self.quantize.get_codebook_entry(codebook_indices)
        return self.decoder(z_q)

    def get_code(self, pixel_values):
        return self.quantize.get_code(self.encoder(pixel_values))

    def get_soft_code(self, pixel_values, temp: float = 1.0, stochastic: bool = False,
                      key=None):
        return self.quantize.get_soft_code(self.encoder(pixel_values), temp, stochastic, key)

    def __call__(self, pixel_values, return_loss: bool = False):
        z_q, indices, loss = self.encode(pixel_values, return_loss)
        recon = self.decoder(z_q)
        return recon, z_q, indices, loss


class _VQWrapperMixin:
    """Shared user-facing API (NHWC tensors, jitted methods)."""

    def encode(self, pixel_values, return_loss: bool = False):
        pixel_values = self._to_nhwc(pixel_values)
        z_q, indices, loss = self.jit_apply("encode", pixel_values, return_loss=return_loss)
        if return_loss:
            return z_q, indices, loss
        return z_q, indices

    def decode(self, quantized_states):
        return self.jit_apply("decode", quantized_states)

    def decode_code(self, codebook_indices):
        return self.jit_apply("decode_code", codebook_indices)

    def get_code(self, pixel_values):
        return self.jit_apply("get_code", self._to_nhwc(pixel_values))

    def __call__(self, pixel_values, return_loss: bool = False):
        return self.jit_apply("__call__", self._to_nhwc(pixel_values),
                              return_loss=return_loss)

    def get_soft_code(self, pixel_values, temp: float = 1.0, stochastic: bool = False,
                      key=None):
        return self.apply(self._to_nhwc(pixel_values), temp, stochastic, key,
                          method="get_soft_code")

    @staticmethod
    def _to_nhwc(pixel_values):
        """Accept NCHW (reference layout) or NHWC; convert to NHWC."""
        if pixel_values.ndim == 4 and pixel_values.shape[1] == 3 and pixel_values.shape[-1] != 3:
            return jnp.transpose(pixel_values, (0, 2, 3, 1))
        return pixel_values


class MaskGitVQGAN(_VQWrapperMixin, ModelMixin):
    config_class = MaskGitVQGANConfig
    _class_name = "MaskGitVQGAN"

    def build_module(self):
        return MaskGitVQGANModule(self.config, dtype=self.dtype)

    def example_inputs(self):
        r = self.config.resolution
        return (jnp.zeros((1, r, r, self.config.num_channels), dtype=self.dtype),)
