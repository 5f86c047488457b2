"""v1 U-ViT building blocks: shape contracts."""

import numpy as np
import jax
import jax.numpy as jnp

from open_muse_tpu.models import uvit_blocks as B


def _init_apply(module, *args):
    params = module.init(jax.random.PRNGKey(0), *args)["params"]
    return module.apply({"params": params}, *args)


def test_attention_block_2d():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 64).astype(np.float32))
    ehs = jnp.asarray(np.random.RandomState(1).randn(2, 5, 48).astype(np.float32))
    out = _init_apply(B.AttentionBlock2D(64, 4, 48), x, ehs)
    assert out.shape == (2, 8, 8, 64)


def test_res_block_with_skip_and_cond():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 8, 32).astype(np.float32))
    # skip channels must be a multiple of in_channels (the depthwise conv
    # groups over in_channels, same constraint as the reference's
    # Conv2d(in+skip, in, groups=in), modeling_transformer.py:344-351)
    skip = jnp.asarray(rs.randn(1, 8, 8, 32).astype(np.float32))
    cond = jnp.asarray(rs.randn(1, 24).astype(np.float32))
    out = _init_apply(B.ResBlock(32, skip_channels=32, cond_embed_dim=24),
                      x, skip, cond)
    assert out.shape == (1, 8, 8, 32)


def test_down_up_roundtrip():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 16, 16, 32).astype(np.float32))
    ehs = jnp.asarray(rs.randn(1, 5, 32).astype(np.float32))
    down = B.DownsampleBlock(32, 64, num_res_blocks=2, num_heads=4,
                             has_attention=True, encoder_hidden_size=32)
    params = down.init(jax.random.PRNGKey(0), x, None, None, ehs)["params"]
    y, states = down.apply({"params": params}, x, None, None, ehs)
    assert y.shape == (1, 8, 8, 64)
    assert len(states) == 2

    up = B.UpsampleBlock(64, 32, num_res_blocks=2)
    params = up.init(jax.random.PRNGKey(1), y)["params"]
    z = up.apply({"params": params}, y)
    assert z.shape == (1, 16, 16, 32)


def test_vanilla_down_up():
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(1, 16, 16, 32).astype(np.float32))
    down = B.DownsampleBlockVanilla(32, 64, num_res_blocks=2)
    params = down.init(jax.random.PRNGKey(0), x)["params"]
    y, states = down.apply({"params": params}, x)
    assert y.shape == (1, 8, 8, 64)
    assert len(states) == 3  # 2 res + 1 downsample

    up = B.UpsampleBlockVanilla(64, 64, skip_channels=64, num_res_blocks=2,
                                add_upsample=True)
    skips = (states[-1], states[-1])  # same-resolution skips for the unit test
    params = up.init(jax.random.PRNGKey(1), y, skips)["params"]
    z = up.apply({"params": params}, y, skips)
    assert z.shape == (1, 16, 16, 64)
