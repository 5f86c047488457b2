"""Pallas kernels, verified in interpreter mode on CPU against XLA refs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.ops.pallas.vq_argmin import vq_argmin
from open_muse_tpu.ops.pallas.fused_norm import (fused_residual_layernorm,
                                                 fused_residual_rmsnorm)
from open_muse_tpu.ops.pallas.flash_attention import flash_attention
from open_muse_tpu.ops.vq import compute_distances
from open_muse_tpu.ops.layers import dot_product_attention


@pytest.mark.parametrize("n,c,k", [(1000, 256, 8192), (256, 8, 2048), (2048, 16, 1024)])
def test_vq_argmin_matches_xla(n, c, k):
    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.randn(n, c).astype(np.float32))
    cb = jnp.asarray(rs.randn(k, c).astype(np.float32))
    ref = jnp.argmin(compute_distances(z, cb), axis=1)
    got = vq_argmin(z, cb, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_rmsnorm_matches_reference_semantics():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 64, 128).astype(np.float32))
    res = jnp.asarray(rs.randn(2, 64, 128).astype(np.float32))
    scale = jnp.asarray(rs.rand(128).astype(np.float32))
    out, resid = fused_residual_rmsnorm(x, res, scale, interpret=True)
    added = np.asarray(x + res)
    np.testing.assert_allclose(np.asarray(resid), added, atol=1e-6)
    var = (added.astype(np.float64) ** 2).mean(-1, keepdims=True)
    expected = added / np.sqrt(var + 1e-6) * np.asarray(scale)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4, rtol=1e-4)


def test_fused_layernorm_matches():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(3, 40, 128).astype(np.float32))
    scale = jnp.asarray(rs.rand(128).astype(np.float32))
    bias = jnp.asarray(rs.rand(128).astype(np.float32))
    out, resid = fused_residual_layernorm(x, None, scale, bias, interpret=True)
    xn = np.asarray(x, dtype=np.float64)
    mean = xn.mean(-1, keepdims=True)
    var = ((xn - mean) ** 2).mean(-1, keepdims=True)
    expected = (xn - mean) / np.sqrt(var + 1e-5) * np.asarray(scale) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(resid), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("tq,tk", [(256, 256), (256, 77), (100, 77)])
def test_flash_attention_matches_xla(tq, tk):
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(2, tq, 4, 64).astype(np.float32))
    k = jnp.asarray(rs.randn(2, tk, 4, 64).astype(np.float32))
    v = jnp.asarray(rs.randn(2, tk, 4, 64).astype(np.float32))
    ref = dot_product_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_fused_categorical_exact_with_explicit_noise():
    """With explicit gumbel noise the streaming kernel must match
    argmax(logits + g) and softmax-gather confidence EXACTLY (the on-chip
    PRNG path is TPU-only and validated on hardware)."""
    import jax

    from open_muse_tpu.ops.pallas.fused_sample import fused_categorical

    rs = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(rs.randn(4, 100, 512).astype(np.float32) * 3)
    g = jax.random.gumbel(key, logits.shape, jnp.float32)
    ids, sel = fused_categorical(0, logits, interpret=True, gumbel=g)
    ref_ids = jnp.argmax(logits + g, -1)
    assert (np.asarray(ids) == np.asarray(ref_ids)).all()
    ref_sel = jnp.take_along_axis(jax.nn.softmax(logits, -1),
                                  ref_ids[..., None], -1)[..., 0]
    np.testing.assert_allclose(np.asarray(sel), np.asarray(ref_sel),
                               atol=1e-6, rtol=1e-5)


def test_fused_categorical_row_padding():
    import jax

    from open_muse_tpu.ops.pallas.fused_sample import fused_categorical

    rs = np.random.RandomState(1)
    key = jax.random.PRNGKey(1)
    logits = jnp.asarray(rs.randn(3, 7, 512).astype(np.float32))
    g = jax.random.gumbel(key, logits.shape, jnp.float32)
    ids, sel = fused_categorical(0, logits, interpret=True, gumbel=g)
    assert ids.shape == (3, 7) and sel.shape == (3, 7)
    assert (np.asarray(ids) == np.asarray(jnp.argmax(logits + g, -1))).all()


def test_fused_categorical_non_divisible_vocab():
    """Vocabs that are not a multiple of block_v (e.g. codebook 3072) and
    not lane-aligned (e.g. 1000) must work via ceil-div v-blocks with
    in-kernel column masking — not raise at trace time (ADVICE r2)."""
    import jax

    from open_muse_tpu.ops.pallas.fused_sample import fused_categorical

    for vocab in (3072, 1000):
        rs = np.random.RandomState(vocab)
        logits = jnp.asarray(rs.randn(2, 9, vocab).astype(np.float32) * 2)
        g = jax.random.gumbel(jax.random.PRNGKey(vocab), logits.shape,
                              jnp.float32)
        ids, sel = fused_categorical(0, logits, interpret=True, gumbel=g)
        ref_ids = jnp.argmax(logits + g, -1)
        assert (np.asarray(ids) == np.asarray(ref_ids)).all(), vocab
        ref_sel = jnp.take_along_axis(jax.nn.softmax(logits, -1),
                                      ref_ids[..., None], -1)[..., 0]
        np.testing.assert_allclose(np.asarray(sel), np.asarray(ref_sel),
                                   atol=1e-6, rtol=1e-5)


def test_fused_categorical_cfg_exact_with_explicit_noise():
    """The CFG-fused kernel must equal crop->f32->combine->gumbel-argmax->
    softmax-gather exactly when given explicit noise (incl. the non-divisible
    8256-wide raw vocab and bf16 inputs)."""
    import jax

    from open_muse_tpu.ops.pallas.fused_sample import fused_categorical_cfg

    rs = np.random.RandomState(0)
    B, S, VRAW, VLIM = 3, 50, 8256, 8192
    logits = jnp.asarray(rs.randn(2 * B, S, VRAW).astype(np.float32) * 2
                         ).astype(jnp.bfloat16)
    g = 7.5
    noise = jax.random.gumbel(jax.random.PRNGKey(0), (B, S, VRAW), jnp.float32)
    ids, sel = fused_categorical_cfg(0, logits, g, VLIM, interpret=True,
                                     gumbel=noise)
    lf = logits.astype(jnp.float32)[..., :VLIM]
    comb = lf[B:] + g * (lf[:B] - lf[B:])
    ref_ids = jnp.argmax(comb + noise[..., :VLIM], -1)
    assert (np.asarray(ids) == np.asarray(ref_ids)).all()
    ref_sel = jnp.take_along_axis(jax.nn.softmax(comb, -1),
                                  ref_ids[..., None], -1)[..., 0]
    np.testing.assert_allclose(np.asarray(sel), np.asarray(ref_sel),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("m,k,n", [(512, 2816, 1024), (100, 512, 128),
                                   (1025, 256, 256)])
def test_glu_down_matmul_matches_xla(m, k, n):
    """Fused GLU + down-projection kernel vs the plain XLA expression
    (round-3 verdict item 2; erf via A&S 7.1.26, max abs err 1.5e-7)."""
    import jax
    import jax.numpy as jnp

    from open_muse_tpu.ops.pallas.glu_matmul import glu_down_matmul

    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(m, k), jnp.float32)
    b = jnp.asarray(rs.randn(m, k), jnp.float32)
    wo = jnp.asarray(rs.randn(k, n) * 0.02, jnp.float32)
    ref = (jax.nn.gelu(a, approximate=False) * b) @ wo
    got = glu_down_matmul(a, b, wo, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_glu_down_matmul_bad_shapes():
    import jax.numpy as jnp

    from open_muse_tpu.ops.pallas.glu_matmul import glu_down_matmul

    a = jnp.zeros((8, 200), jnp.float32)  # K=200 % block_k(128) != 0
    wo = jnp.zeros((200, 128), jnp.float32)
    with pytest.raises(ValueError):
        glu_down_matmul(a, a, wo, interpret=True)
    wo_badn = jnp.zeros((128, 100), jnp.float32)  # N not a lane multiple
    a2 = jnp.zeros((8, 128), jnp.float32)
    with pytest.raises(ValueError):
        glu_down_matmul(a2, a2, wo_badn, interpret=True)


def test_glu_ffn_module_kernel_path_matches_xla(monkeypatch):
    """GLUFeedForward with MUSE_TPU_PALLAS_GLU routes through the kernel and
    matches the XLA path (CPU backend never opts in; force via monkeypatch)."""
    import jax
    import jax.numpy as jnp

    from open_muse_tpu.models import transformer_v2 as tv2
    from open_muse_tpu.ops.pallas import glu_matmul

    cfg = tv2.MaskGiTUViT_v2Config(hidden_size=128, intermediate_size=256,
                                   num_attention_heads=4, num_hidden_layers=1)
    mod = tv2.GLUFeedForward(cfg)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 128), jnp.float32)
    cond = jnp.asarray(rs.randn(2, 128), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, cond)
    ref, _ = mod.apply(params, x, cond)

    monkeypatch.setenv("MUSE_TPU_PALLAS_GLU", "1")
    monkeypatch.setattr(glu_matmul, "use_pallas_glu", lambda: True)
    real_kernel = glu_matmul.glu_down_matmul
    monkeypatch.setattr(
        glu_matmul, "glu_down_matmul",
        lambda a, b, wo, **kw: real_kernel(a, b, wo, interpret=True))
    got, _ = mod.apply(params, x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_glu_down_matmul_grad_matches_xla():
    """custom_vjp backward matches jax.grad of the plain XLA expression."""
    import jax
    import jax.numpy as jnp

    from open_muse_tpu.ops.pallas.glu_matmul import glu_down_matmul

    rs = np.random.RandomState(1)
    a = jnp.asarray(rs.randn(64, 256), jnp.float32)
    b = jnp.asarray(rs.randn(64, 256), jnp.float32)
    wo = jnp.asarray(rs.randn(256, 128) * 0.05, jnp.float32)

    def loss_ref(a, b, wo):
        return jnp.sum(jnp.sin((jax.nn.gelu(a, approximate=False) * b) @ wo))

    def loss_kernel(a, b, wo):
        return jnp.sum(jnp.sin(glu_down_matmul(a, b, wo, interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(a, b, wo)
    g_got = jax.grad(loss_kernel, argnums=(0, 1, 2))(a, b, wo)
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_glu_down_bwd_kernel_pads_and_matches(monkeypatch):
    """Round-5 fused Pallas backward: non-multiple M pads internally; the
    kernel grads match the plain-XLA-expression grads bit-for-tolerance,
    and MUSE_TPU_PALLAS_GLU_BWD=0 restores the XLA path."""
    import jax
    import jax.numpy as jnp

    from open_muse_tpu.ops.pallas.glu_matmul import glu_down_matmul

    rs = np.random.RandomState(7)
    m, k, n = 100, 256, 128  # m % BWD_BLOCK_M != 0 -> pad path
    a = jnp.asarray(rs.randn(m, k), jnp.float32)
    b = jnp.asarray(rs.randn(m, k), jnp.float32)
    wo = jnp.asarray(rs.randn(k, n) * 0.05, jnp.float32)

    def loss(a, b, wo):
        return jnp.sum(jnp.cos(glu_down_matmul(a, b, wo, interpret=True)))

    def loss_ref(a, b, wo):
        return jnp.sum(jnp.cos((jax.nn.gelu(a, approximate=False) * b) @ wo))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(a, b, wo)

    monkeypatch.setenv("MUSE_TPU_PALLAS_GLU_BWD", "1")
    g_pallas = jax.grad(loss, argnums=(0, 1, 2))(a, b, wo)
    monkeypatch.setenv("MUSE_TPU_PALLAS_GLU_BWD", "0")
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(a, b, wo)
    for gp, gx, gr in zip(g_pallas, g_xla, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4)
