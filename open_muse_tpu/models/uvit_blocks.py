"""v1 U-ViT building blocks (NHWC linen).

Reference parity: the reusable blocks in muse/modeling_transformer.py —
AttentionBlock2D :248-299, Norm2D :302-311, ResBlock (skip + AdaLN) :328-377,
DownsampleBlock/UpsampleBlock :425-627, and the "vanilla" VQGAN-style
variants :380-422, :630-742.  The reference keeps these around as the
generic U-ViT toolbox (the v2 model embeds its own specialized copies in
modeling_transformer_v2.py); we expose them for custom architectures.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import AdaLNModulation, Attention, GlobalResponseNorm, Norm

__all__ = [
    "Norm2D",
    "AttentionBlock2D",
    "ResBlock",
    "DownsampleBlock",
    "UpsampleBlock",
    "ResnetBlockVanilla",
    "DownsampleBlockVanilla",
    "UpsampleBlockVanilla",
]


class Norm2D(nn.Module):
    # modeling_transformer.py:302-311 (NHWC: no permutes needed)
    dim: int
    norm_type: str = "layernorm"
    eps: float = 1e-5
    use_bias: bool = False
    elementwise_affine: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Norm(self.dim, self.norm_type, eps=self.eps, use_bias=self.use_bias,
                    elementwise_affine=self.elementwise_affine, name="norm",
                    dtype=self.dtype)(x)


class AttentionBlock2D(nn.Module):
    """self + cross attention over a flattened NHWC map
    (modeling_transformer.py:248-299)."""

    hidden_size: int
    num_heads: int
    encoder_hidden_size: int
    norm_type: str = "layernorm"
    eps: float = 1e-6
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states):
        b, h, w, c = x.shape
        hidden = x.reshape(b, h * w, c)
        if self.encoder_hidden_size != self.hidden_size:
            encoder_hidden_states = nn.Dense(
                self.hidden_size, use_bias=self.use_bias, name="kv_mapper",
                dtype=self.dtype)(jax.nn.silu(encoder_hidden_states))
        norm = lambda name: Norm(self.hidden_size, self.norm_type, eps=self.eps,
                                 use_bias=self.use_bias, name=name, dtype=self.dtype)
        residual = hidden
        hidden = norm("attn_layer_norm")(hidden)
        hidden = Attention(self.hidden_size, self.num_heads, use_bias=self.use_bias,
                           name="attention", dtype=self.dtype)(
            hidden, encoder_hidden_states)
        hidden = hidden + residual
        residual = hidden
        hidden = norm("crossattn_layer_norm")(hidden)
        hidden = Attention(self.hidden_size, self.num_heads, use_bias=self.use_bias,
                           name="crossattention", dtype=self.dtype)(
            hidden, encoder_hidden_states)
        hidden = hidden + residual
        return hidden.reshape(b, h, w, c)


class ResBlock(nn.Module):
    """depthwise + GRN channel-MLP with optional skip concat and AdaLN
    (modeling_transformer.py:328-377)."""

    in_channels: int
    skip_channels: int = 0
    kernel_size: int = 3
    norm_type: str = "layernorm"
    cond_embed_dim: Optional[int] = None
    res_ffn_factor: int = 4
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_skip=None, cond_embeds=None):
        x_res = x
        h = x if x_skip is None else jnp.concatenate([x, x_skip], axis=-1)
        h = nn.Conv(self.in_channels, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2,
                    feature_group_count=self.in_channels, use_bias=self.use_bias,
                    name="depthwise", dtype=self.dtype)(h)
        h = Norm2D(self.in_channels, self.norm_type, eps=1e-6,
                   use_bias=self.use_bias, name="norm", dtype=self.dtype)(h)
        inner = int(self.in_channels * self.res_ffn_factor)
        h = nn.Dense(inner, use_bias=self.use_bias, name="channelwise_0",
                     dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        h = GlobalResponseNorm(inner, name="channelwise_2")(h)
        h = nn.Dense(self.in_channels, use_bias=self.use_bias, name="channelwise_4",
                     dtype=self.dtype)(h)
        h = h + x_res
        if cond_embeds is not None and self.cond_embed_dim is not None:
            h = AdaLNModulation(self.cond_embed_dim, self.in_channels,
                                use_bias=self.use_bias, name="adaLN_modulation",
                                dtype=self.dtype)(h, cond_embeds)
        return h


class DownsampleBlock(nn.Module):
    # modeling_transformer.py:425-525
    input_channels: int
    output_channels: Optional[int] = None
    skip_channels: int = 0
    num_res_blocks: int = 4
    num_heads: Optional[int] = None
    encoder_hidden_size: Optional[int] = None
    cond_embed_dim: Optional[int] = None
    add_downsample: bool = True
    has_attention: bool = False
    norm_type: str = "layernorm"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_skip=None, cond_embeds=None, encoder_hidden_states=None):
        channels = self.output_channels or self.input_channels
        if self.add_downsample:
            x = Norm2D(self.input_channels, self.norm_type, eps=1e-6,
                       use_bias=self.use_bias, name="downsample_0",
                       dtype=self.dtype)(x)
            x = nn.Conv(channels, (2, 2), strides=(2, 2), padding="VALID",
                        use_bias=self.use_bias, name="downsample_1",
                        dtype=self.dtype)(x)
        output_states = ()
        for i in range(self.num_res_blocks):
            x = ResBlock(channels, skip_channels=self.skip_channels,
                         norm_type=self.norm_type, cond_embed_dim=self.cond_embed_dim,
                         use_bias=self.use_bias, name=f"res_blocks_{i}",
                         dtype=self.dtype)(x, x_skip, cond_embeds)
            if self.has_attention:
                x = AttentionBlock2D(channels, self.num_heads,
                                     self.encoder_hidden_size or channels,
                                     norm_type=self.norm_type, use_bias=self.use_bias,
                                     name=f"attention_blocks_{i}",
                                     dtype=self.dtype)(x, encoder_hidden_states)
            output_states += (x,)
        return x, output_states


class UpsampleBlock(nn.Module):
    # modeling_transformer.py:528-627
    input_channels: int
    output_channels: Optional[int] = None
    skip_channels: int = 0
    num_res_blocks: int = 4
    num_heads: Optional[int] = None
    encoder_hidden_size: Optional[int] = None
    cond_embed_dim: Optional[int] = None
    add_upsample: bool = True
    has_attention: bool = False
    norm_type: str = "layernorm"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_skip=None, cond_embeds=None, encoder_hidden_states=None):
        for i in range(self.num_res_blocks):
            skip = x_skip[0] if (i == 0 and x_skip is not None) else None
            x = ResBlock(self.input_channels,
                         skip_channels=self.skip_channels if i == 0 else 0,
                         norm_type=self.norm_type, cond_embed_dim=self.cond_embed_dim,
                         use_bias=self.use_bias, name=f"res_blocks_{i}",
                         dtype=self.dtype)(x, skip, cond_embeds)
            if self.has_attention:
                x = AttentionBlock2D(self.input_channels, self.num_heads,
                                     self.encoder_hidden_size or self.input_channels,
                                     norm_type=self.norm_type, use_bias=self.use_bias,
                                     name=f"attention_blocks_{i}",
                                     dtype=self.dtype)(x, encoder_hidden_states)
        if self.add_upsample:
            channels = self.output_channels or self.input_channels
            x = Norm2D(self.input_channels, self.norm_type, eps=1e-6,
                       use_bias=self.use_bias, name="upsample_0", dtype=self.dtype)(x)
            x = nn.ConvTranspose(channels, (2, 2), strides=(2, 2), padding="VALID",
                                 use_bias=self.use_bias, name="upsample_1",
                                 dtype=self.dtype)(x)
        return x


class ResnetBlockVanilla(nn.Module):
    # modeling_transformer.py:380-422 (VQGAN-style GroupNorm res block)
    in_channels: int
    out_channels: Optional[int] = None
    use_conv_shortcut: bool = False
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.in_channels
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1",
                         dtype=self.dtype)(x)
        h = jax.nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, use_bias=self.use_bias, name="conv1",
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2",
                         dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, use_bias=self.use_bias, name="conv2",
                    dtype=self.dtype)(h)
        if self.in_channels != out_ch:
            name = "conv_shortcut" if self.use_conv_shortcut else "nin_shortcut"
            k = 3 if self.use_conv_shortcut else 1
            residual = nn.Conv(out_ch, (k, k), padding=k // 2,
                               use_bias=self.use_bias, name=name,
                               dtype=self.dtype)(residual)
        return residual + h


class DownsampleBlockVanilla(nn.Module):
    # modeling_transformer.py:630-682
    input_channels: int
    output_channels: int
    num_res_blocks: int = 4
    add_downsample: bool = True
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        output_states = ()
        for i in range(self.num_res_blocks):
            in_ch = self.input_channels if i == 0 else self.output_channels
            x = ResnetBlockVanilla(in_ch, self.output_channels,
                                   use_bias=self.use_bias, name=f"res_blocks_{i}",
                                   dtype=self.dtype)(x)
            output_states += (x,)
        if self.add_downsample:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = nn.Conv(self.output_channels, (3, 3), strides=(2, 2),
                        padding="VALID", use_bias=self.use_bias,
                        name="downsample_conv", dtype=self.dtype)(x)
            output_states += (x,)
        return x, output_states


class UpsampleBlockVanilla(nn.Module):
    # modeling_transformer.py:685-742 (skip-stack consuming, nearest upsample)
    input_channels: int
    output_channels: int
    skip_channels: int
    num_res_blocks: int = 4
    add_upsample: bool = True
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_skip: Tuple):
        skips = list(x_skip)
        for i in range(self.num_res_blocks):
            res = skips.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlockVanilla(x.shape[-1], self.output_channels,
                                   use_bias=self.use_bias, name=f"res_blocks_{i}",
                                   dtype=self.dtype)(x)
        if self.add_upsample:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            x = nn.Conv(self.output_channels, (3, 3), padding=1,
                        name="upsample_conv", dtype=self.dtype)(x)
        return x
