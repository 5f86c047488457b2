"""Fused attention-sublayer Pallas kernel (ops/pallas/attn_sublayer):
kernel-level parity vs the pure-XLA expression, full-model fused-vs-unfused
parity (forward, hoisted decode, gradients), and param-tree identity.

Runs in interpreter mode on the CPU CI mesh (the kernels' real code path,
MUSE_TPU_PALLAS_INTERPRET=1).  Reference workload: the trunk sublayers of
muse/modeling_transformer_v2.py:757-792.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.ops.pallas import attn_sublayer as A

# head_dim must be 64 for the kernel (research config); tiny everything else
FUSED_TINY = dict(
    hidden_size=128, cond_embed_dim=32, micro_cond_encode_dim=8,
    micro_cond_embed_dim=40, encoder_hidden_size=48, vocab_size=68,
    mask_token_id=67, codebook_size=64, in_channels=32,
    block_out_channels=(32,), num_res_blocks=1, block_num_heads=2,
    num_hidden_layers=2, num_attention_heads=2, intermediate_size=256)


@pytest.fixture(autouse=True)
def _interpret_kernels(monkeypatch):
    monkeypatch.setenv("MUSE_TPU_PALLAS_INTERPRET", "1")


def _rand(rs, *shape):
    return jnp.asarray(rs.randn(*shape), jnp.float32)


def test_self_sublayer_matches_xla_ref():
    rs = np.random.RandomState(0)
    b, s, d, h = 3, 64, 256, 4
    x, res = _rand(rs, b, s, d), _rand(rs, b, s, d)
    ls = _rand(rs, d) * 0.1 + 1.0
    ad = _rand(rs, b, 2 * d) * 0.1
    wqkv = _rand(rs, d, 3 * d) / np.sqrt(d)
    wout = _rand(rs, d, d) / np.sqrt(d)
    o, r = A.attn_sublayer_self(x, res, ls, ad, wqkv, wout, num_heads=h)
    o2, r2 = A._xla_ref_self(x, res, ls, ad, wqkv, wout, h, 1e-6)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o2), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(r2))


def test_cross_sublayer_matches_xla_ref_with_kv_padding():
    rs = np.random.RandomState(1)
    b, s, d, h, lk = 2, 32, 128, 2, 77  # 77 pads to 128, masked columns
    x, res = _rand(rs, b, s, d), _rand(rs, b, s, d)
    ls = _rand(rs, d) * 0.1 + 1.0
    ad = _rand(rs, b, 2 * d) * 0.1
    wq = _rand(rs, d, d) / np.sqrt(d)
    wout = _rand(rs, d, d) / np.sqrt(d)
    kv = _rand(rs, b, lk, 2 * d)
    o, r = A.attn_sublayer_cross(x, res, ls, ad, wq, wout, kv, num_heads=h)
    kvp = jnp.pad(kv, ((0, 0), (0, 128 - lk), (0, 0)))
    o2, r2 = A._xla_ref_cross(x, res, ls, ad, wq, wout, kvp, h, 1e-6, lk)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o2), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(r2))


def test_none_residual_first_layer():
    rs = np.random.RandomState(2)
    b, s, d, h = 2, 16, 128, 2
    x = _rand(rs, b, s, d)
    ls, ad = _rand(rs, d), _rand(rs, b, 2 * d)
    wqkv = _rand(rs, d, 3 * d) / np.sqrt(d)
    wout = _rand(rs, d, d) / np.sqrt(d)
    o, r = A.attn_sublayer_self(x, None, ls, ad, wqkv, wout, num_heads=h)
    o2, r2 = A._xla_ref_self(x, jnp.zeros_like(x), ls, ad, wqkv, wout, h, 1e-6)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o2), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(x))
    assert np.array_equal(np.asarray(r), np.asarray(r2))


def test_shape_gate():
    ok = A.sublayer_shapes_supported
    assert ok(256, 1024, 16)          # the research trunk
    assert ok(256, 768, 12)           # head_dim 64, even heads, 128-aligned
    assert not ok(256, 1024, 8)       # head_dim 128
    assert not ok(1024, 1024, 16)     # f8-block sequences too large
    assert not ok(30, 1024, 16)       # seq not a multiple of 8


def _model_inputs(rs, batch=2, seq=16):
    ids = jnp.asarray(rs.randint(0, 68, size=(batch, seq)))
    ehs = _rand(rs, batch, 7, 48)
    cond = _rand(rs, batch, 32)
    micro = jnp.asarray([[512, 512, 0, 0, 6.0]] * batch, jnp.float32)
    return ids, ehs, cond, micro


def test_model_forward_and_tree_parity(monkeypatch):
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

    model = MaskGiTUViT_v2(**FUSED_TINY)
    rs = np.random.RandomState(3)
    ids, ehs, cond, micro = _model_inputs(rs)

    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_SUBLAYER", "0")
    params = model.init_params(jax.random.PRNGKey(0))
    base = model(ids, ehs, cond, micro)
    t_base = jax.tree_util.tree_structure(params)

    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_SUBLAYER", "1")
    t_fused = jax.tree_util.tree_structure(
        model.init_params(jax.random.PRNGKey(0)))
    assert t_base == t_fused
    fused = model(ids, ehs, cond, micro)
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused), atol=1e-4)


def test_model_decode_parity(monkeypatch):
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

    model = MaskGiTUViT_v2(**FUSED_TINY)
    rs = np.random.RandomState(4)
    _, ehs, cond, micro = _model_inputs(rs)
    model.init_params(jax.random.PRNGKey(0))

    empty_ehs = _rand(np.random.RandomState(9), 2, 7, 48)
    empty_cond = _rand(np.random.RandomState(10), 2, 32)

    def gen():
        return model.generate2(encoder_hidden_states=ehs, cond_embeds=cond,
                               micro_conds=micro, timesteps=3,
                               guidance_scale=2.0, empty_embeds=empty_ehs,
                               empty_cond_embeds=empty_cond,
                               key=jax.random.PRNGKey(11))

    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_SUBLAYER", "0")
    base = gen()
    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_SUBLAYER", "1")
    fused = gen()
    assert np.array_equal(np.asarray(base), np.asarray(fused))


def test_model_grad_parity(monkeypatch):
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

    model = MaskGiTUViT_v2(**FUSED_TINY)
    rs = np.random.RandomState(5)
    ids, ehs, cond, micro = _model_inputs(rs)
    model.init_params(jax.random.PRNGKey(0))
    labels = jnp.asarray(rs.randint(0, 64, size=(2, 16)))

    def lossf(p):
        _, loss = model.apply(ids, ehs, cond, micro, labels=labels, params=p)
        return loss

    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_SUBLAYER", "0")
    g0 = jax.grad(lossf)(model.params)
    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_SUBLAYER", "1")
    g1 = jax.grad(lossf)(model.params)
    err = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)))
    assert err < 1e-4
