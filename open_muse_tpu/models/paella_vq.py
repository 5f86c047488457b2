"""Paella VQ tokenizer (ConvNeXt-ish, f4-per-level, 8192 codebook), TPU-native.

Reference parity: muse/modeling_paella_vq.py (PixelUnshuffle in_block :159,
gamma-gated ResBlocks :112-145, BatchNorm'd latent :166-171, cdist quantizer
:14-109, scale_factor latent scaling :195-209).  Inference-only in the
reference (:11); we mirror that (BatchNorm runs in inference mode with stored
statistics).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.configuration import BaseConfig
from ..core.modeling import ModelMixin
from ..ops.vq import VectorQuantizer
from .maskgit_vqgan import _VQWrapperMixin

__all__ = ["PaellaVQModel", "PaellaVQConfig"]


@dataclasses.dataclass(frozen=True)
class PaellaVQConfig(BaseConfig):
    # defaults: modeling_paella_vq.py:150-152
    levels: int = 2
    bottleneck_blocks: int = 12
    c_hidden: int = 384
    c_latent: int = 4
    codebook_size: int = 8192
    scale_factor: float = 0.3764


class ResBlock(nn.Module):
    """gamma-gated depthwise + channelwise block
    (modeling_paella_vq.py:112-145).  Depthwise conv uses replication padding."""

    c: int
    c_hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gammas = self.param("gammas", nn.initializers.zeros, (6,))
        g = [gammas[i] for i in range(6)]

        def ln(h, name):
            # elementwise_affine=False LayerNorm, eps 1e-6
            h32 = h.astype(jnp.float32)
            mean = jnp.mean(h32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
            return ((h32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(h.dtype)

        x_temp = ln(x, "norm1") * (1 + g[0]) + g[1]
        # ReplicationPad2d(1) == edge padding
        pad = jnp.pad(x_temp, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        dw = nn.Conv(self.c, (3, 3), padding="VALID", feature_group_count=self.c,
                     name="depthwise_1", dtype=self.dtype)(pad)
        x = x + dw * g[2]
        x_temp = ln(x, "norm2") * (1 + g[3]) + g[4]
        h = nn.Dense(self.c_hidden, name="channelwise_0", dtype=self.dtype)(x_temp)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.c, name="channelwise_2", dtype=self.dtype)(h)
        return x + h * g[5]


class BatchNorm2DInference(nn.Module):
    """BatchNorm2d applied with stored running statistics (the reference
    model is inference-only, modeling_paella_vq.py:11,169)."""

    channels: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # running statistics live in the params tree: the model is
        # inference-only (reference modeling_paella_vq.py:11), so they are
        # frozen constants, not trainable state.
        scale = self.param("weight", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.channels,))
        var = self.param("running_var", nn.initializers.ones, (self.channels,))
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias


class PaellaVQModule(nn.Module):
    config: PaellaVQConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        c_levels = [cfg.c_hidden // (2 ** i) for i in reversed(range(cfg.levels))]
        self._c_levels = c_levels
        # Encoder: in_block = Sequential(PixelUnshuffle(2), Conv 1x1)
        self.in_block_1 = nn.Conv(c_levels[0], (1, 1), name="in_block_1",
                                  dtype=self.dtype)
        down = []
        idx = 0
        self._down_order = []
        for i in range(cfg.levels):
            if i > 0:
                down.append((f"down_blocks_{idx}", "conv",
                             nn.Conv(c_levels[i], (4, 4), strides=(2, 2), padding=1,
                                     name=f"down_blocks_{idx}", dtype=self.dtype)))
                idx += 1
            down.append((f"down_blocks_{idx}", "res",
                         ResBlock(c_levels[i], c_levels[i] * 4,
                                  name=f"down_blocks_{idx}", dtype=self.dtype)))
            idx += 1
        # trailing Sequential(Conv 1x1 no bias, BatchNorm)
        self.down_tail_conv = nn.Conv(cfg.c_latent, (1, 1), use_bias=False,
                                      name=f"down_blocks_{idx}_0", dtype=self.dtype)
        self.down_tail_bn = BatchNorm2DInference(cfg.c_latent,
                                                 name=f"down_blocks_{idx}_1")
        self.down_ops = down

        self.vquantizer = VectorQuantizer(cfg.codebook_size, cfg.c_latent,
                                          metric="l2",
                                          embedding_param_name="codebook")

        # Decoder
        up = []
        idx = 0
        up.append((f"up_blocks_{idx}_0", "conv1x1",
                   nn.Conv(c_levels[-1], (1, 1), name=f"up_blocks_{idx}_0",
                           dtype=self.dtype)))
        idx += 1
        for i in range(cfg.levels):
            for j in range(cfg.bottleneck_blocks if i == 0 else 1):
                c = c_levels[cfg.levels - 1 - i]
                up.append((f"up_blocks_{idx}", "res",
                           ResBlock(c, c * 4, name=f"up_blocks_{idx}",
                                    dtype=self.dtype)))
                idx += 1
            if i < cfg.levels - 1:
                # torch ConvTranspose2d(k=4, s=2, p=1) == flax ConvTranspose with
                # transpose_kernel=True and padding K-1-p=2 (verified numerically)
                up.append((f"up_blocks_{idx}", "convT",
                           nn.ConvTranspose(c_levels[cfg.levels - 2 - i], (4, 4),
                                            strides=(2, 2), padding=((2, 2), (2, 2)),
                                            transpose_kernel=True,
                                            name=f"up_blocks_{idx}",
                                            dtype=self.dtype)))
                idx += 1
        self.up_ops = up
        self.out_block_0 = nn.Conv(3 * 4, (1, 1), name="out_block_0", dtype=self.dtype)

    def _encode_latent(self, pixel_values):
        b, h, w, c = pixel_values.shape
        # PixelUnshuffle(2) in NHWC with torch channel order (C, u, v)
        x = pixel_values.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c * 4)
        x = self.in_block_1(x)
        for _, _, op in self.down_ops:
            x = op(x)
        x = self.down_tail_conv(x)
        x = self.down_tail_bn(x)
        return x

    def _decode_latent(self, x):
        for _, _, op in self.up_ops:
            x = op(x)
        x = self.out_block_0(x)
        b, h, w, c = x.shape
        # PixelShuffle(2)
        x = x.reshape(b, h, w, 3, 2, 2)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * 2, w * 2, 3)
        return x

    def encode(self, pixel_values, return_loss: bool = False):
        x = self._encode_latent(pixel_values)
        z_q, indices, loss = self.vquantizer(x, return_loss)
        z_q = z_q / self.config.scale_factor
        return z_q, indices, loss

    def decode(self, x):
        x = x * self.config.scale_factor
        return self._decode_latent(x)

    def decode_code(self, codebook_indices):
        # NOTE: the reference does NOT rescale in decode_code
        # (modeling_paella_vq.py:211-215)
        x = self.vquantizer.get_codebook_entry(codebook_indices)
        return self._decode_latent(x)

    def get_code(self, pixel_values):
        return self.vquantizer.get_code(self._encode_latent(pixel_values))

    def get_soft_code(self, pixel_values, temp: float = 1.0, stochastic: bool = False,
                      key=None):
        return self.vquantizer.get_soft_code(self._encode_latent(pixel_values),
                                             temp, stochastic, key)

    def __call__(self, pixel_values, return_loss: bool = False):
        z_q, indices, loss = self.encode(pixel_values, return_loss)
        recon = self.decode(z_q)
        return recon, z_q, indices, loss


class PaellaVQModel(_VQWrapperMixin, ModelMixin):
    config_class = PaellaVQConfig
    _class_name = "PaellaVQModel"

    def build_module(self):
        return PaellaVQModule(self.config, dtype=self.dtype)

    def example_inputs(self):
        return (jnp.zeros((1, 64, 64, 3), dtype=self.dtype),)

    def load_torch_weights(self, state_dict, dtype=jnp.float32, strict: bool = True):
        # torch Sequential numeric indices map mechanically via the default
        # ".N" -> "_N" rule in core/convert.py; only drop BN bookkeeping.
        filtered = {k: v for k, v in state_dict.items()
                    if not k.endswith("num_batches_tracked")}
        return super().load_torch_weights(filtered, dtype=dtype, strict=strict)
