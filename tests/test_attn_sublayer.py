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
    assert ok(1024, 1024, 16)         # seq-1024 full-res trunk via staging
    assert ok(512, 1024, 16)          # the advisor round-4 overflow shape
    assert not ok(30, 1024, 16)       # seq not a multiple of 8
    # fp32 doubles the footprint: the seq-1024 trunk fits in bf16 only
    # (measured on-chip: at itemsize=2 budgets, fp32 d=1024 backwards
    # overflow scoped VMEM by 4.7 MB instead of falling back)
    assert not ok(1024, 1024, 16, itemsize=4)
    assert ok(256, 1024, 16, itemsize=4)


def test_stage_picks():
    # round-4-measured shapes keep the all-heads single stage at the 32 MB
    # limit (bit-identical kernel config)
    sp, lim = A._pick_stage(
        lambda p: A._self_vmem_bytes(256, 1024, 16, p), 16)
    assert (sp, lim) == (8, A.VMEM_LIMIT)
    # the seq-1024 trunk stages down to one head pair at the large limit
    sp, lim = A._pick_stage(
        lambda p: A._self_vmem_bytes(1024, 1024, 16, p), 16)
    assert sp >= 1 and lim == A.VMEM_LIMIT_LARGE


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

# ---------------------------------------------------------------------------
# Round-5 fused Pallas backward (use_pallas_attn_bwd): kernel-level grad
# parity vs the plain-XLA-expression VJP, with BOTH output cotangents live
# (the prenorm residual feeds the next sublayer, so g_res is never zero in
# the real trunk), masked cross kv (77 -> 128 pad), and the env kill-switch.
# ---------------------------------------------------------------------------


def _self_args(rs, b=2, s=32, d=128, h=2):
    x, res = _rand(rs, b, s, d), _rand(rs, b, s, d)
    ls = _rand(rs, d) * 0.1 + 1.0
    ad = _rand(rs, b, 2 * d) * 0.1
    wqkv = _rand(rs, d, 3 * d) / np.sqrt(d)
    wout = _rand(rs, d, d) / np.sqrt(d)
    return x, res, ls, ad, wqkv, wout, h


def test_self_bwd_kernel_grad_parity(monkeypatch):
    rs = np.random.RandomState(20)
    x, res, ls, ad, wqkv, wout, h = _self_args(rs)

    def loss(x, res, ls, ad, wqkv, wout):
        o, r = A.attn_sublayer_self(x, res, ls, ad, wqkv, wout, num_heads=h)
        # both outputs live, differently weighted (g_res != g_out)
        return jnp.sum(jnp.sin(o)) + 0.5 * jnp.sum(jnp.cos(r))

    def loss_ref(x, res, ls, ad, wqkv, wout):
        o, r = A._xla_ref_self(x, res, ls, ad, wqkv, wout, h, 1e-6)
        return jnp.sum(jnp.sin(o)) + 0.5 * jnp.sum(jnp.cos(r))

    args = (x, res, ls, ad, wqkv, wout)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_BWD", "1")
    g_pal = jax.grad(loss, argnums=tuple(range(6)))(*args)
    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_BWD", "0")
    g_xla = jax.grad(loss, argnums=tuple(range(6)))(*args)
    for gp, gx, gr in zip(g_pal, g_xla, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4)


def test_cross_bwd_kernel_grad_parity_masked_kv(monkeypatch):
    rs = np.random.RandomState(21)
    b, s, d, h, lk = 2, 32, 128, 2, 77   # pads to 128: masked softmax columns
    x, res = _rand(rs, b, s, d), _rand(rs, b, s, d)
    ls = _rand(rs, d) * 0.1 + 1.0
    ad = _rand(rs, b, 2 * d) * 0.1
    wq = _rand(rs, d, d) / np.sqrt(d)
    wout = _rand(rs, d, d) / np.sqrt(d)
    kv = _rand(rs, b, lk, 2 * d)

    def loss(x, res, ls, ad, wq, wout, kv):
        o, r = A.attn_sublayer_cross(x, res, ls, ad, wq, wout, kv,
                                     num_heads=h)
        return jnp.sum(jnp.sin(o)) + 0.5 * jnp.sum(jnp.cos(r))

    def loss_ref(x, res, ls, ad, wq, wout, kv):
        kvp = jnp.pad(kv, ((0, 0), (0, 128 - lk), (0, 0)))
        o, r = A._xla_ref_cross(x, res, ls, ad, wq, wout, kvp, h, 1e-6, lk)
        return jnp.sum(jnp.sin(o)) + 0.5 * jnp.sum(jnp.cos(r))

    args = (x, res, ls, ad, wq, wout, kv)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_BWD", "1")
    g_pal = jax.grad(loss, argnums=tuple(range(7)))(*args)
    monkeypatch.setenv("MUSE_TPU_PALLAS_ATTN_BWD", "0")
    g_xla = jax.grad(loss, argnums=tuple(range(7)))(*args)
    for gp, gx, gr in zip(g_pal, g_xla, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4)


def test_bwd_vmem_gate():
    # the research trunk (seq 256) fits at the default limit
    pick = A._bwd_stage(256, 1024, 16,
                        lambda sp: A._self_bwd_vmem_bytes(256, 1024, 16, sp))
    assert pick and pick[1] == A.VMEM_LIMIT
    # seq 512 / hidden 1024: all-heads probs scratch alone is 25 MB — the
    # large limit admits it (round 5; was an XLA fallback)
    pick = A._bwd_stage(512, 1024, 16,
                        lambda sp: A._self_bwd_vmem_bytes(512, 1024, 16, sp))
    assert pick and pick[1] == A.VMEM_LIMIT_LARGE
    # seq-1024: double-buffered grads alone overflow even the large limit ->
    # XLA VJP fallback (the fwd kernel still runs — serving path)
    assert A._bwd_stage(
        1024, 1024, 16,
        lambda sp: A._self_bwd_vmem_bytes(1024, 1024, 16, sp)) is None


def _force_single_pair_stage(monkeypatch, bytes_fn, num_heads):
    """Shrink both scoped limits so _pick_stage lands on stage_pairs=1 —
    drives the staged-softmax loop at CI-sized shapes."""
    lim = int(bytes_fn(1) / A._VMEM_HEADROOM) + 1
    monkeypatch.setattr(A, "VMEM_LIMIT", lim)
    monkeypatch.setattr(A, "VMEM_LIMIT_LARGE", lim)
    assert A._pick_stage(bytes_fn, num_heads) == (1, lim)


def test_staged_self_fwd_and_bwd_parity(monkeypatch):
    """stage_pairs=1 must be bit-equivalent to the all-heads stage: the
    softmax is per-row, so staging only reorders whole-row computations."""
    rs = np.random.RandomState(22)
    b, s, d, h = 2, 64, 256, 4
    x, res, ls, ad, wqkv, wout, _ = _self_args(rs, b=b, s=s, d=d, h=h)
    _force_single_pair_stage(
        monkeypatch, lambda sp: A._self_vmem_bytes(s, d, h, sp), h)

    o, r = A.attn_sublayer_self(x, res, ls, ad, wqkv, wout, num_heads=h)
    o2, r2 = A._xla_ref_self(x, res, ls, ad, wqkv, wout, h, 1e-6)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o2), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(r2))

    # staged backward (bwd bytes_fn differs; re-gate on it)
    _force_single_pair_stage(
        monkeypatch, lambda sp: A._self_bwd_vmem_bytes(s, d, h, sp), h)

    def loss(*args):
        o, r = A.attn_sublayer_self(*args, num_heads=h)
        return jnp.sum(jnp.sin(o)) + 0.5 * jnp.sum(jnp.cos(r))

    def loss_ref(*args):
        o, r = A._xla_ref_self(*args, h, 1e-6)
        return jnp.sum(jnp.sin(o)) + 0.5 * jnp.sum(jnp.cos(r))

    args = (x, res, ls, ad, wqkv, wout)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_pal = jax.grad(loss, argnums=tuple(range(6)))(*args)
    for gp, gr in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=3e-4, atol=3e-4)


def test_staged_cross_fwd_parity_masked_kv(monkeypatch):
    rs = np.random.RandomState(23)
    b, s, d, h, lk = 2, 32, 256, 4, 77
    x, res = _rand(rs, b, s, d), _rand(rs, b, s, d)
    ls = _rand(rs, d) * 0.1 + 1.0
    ad = _rand(rs, b, 2 * d) * 0.1
    wq = _rand(rs, d, d) / np.sqrt(d)
    wout = _rand(rs, d, d) / np.sqrt(d)
    kv = _rand(rs, b, lk, 2 * d)
    _force_single_pair_stage(
        monkeypatch, lambda sp: A._cross_vmem_bytes(s, d, h, 128, sp), h)

    o, r = A.attn_sublayer_cross(x, res, ls, ad, wq, wout, kv, num_heads=h)
    kvp = jnp.pad(kv, ((0, 0), (0, 128 - lk), (0, 0)))
    o2, r2 = A._xla_ref_cross(x, res, ls, ad, wq, wout, kvp, h, 1e-6, lk)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o2), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(r2))
