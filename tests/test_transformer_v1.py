"""MaskGitTransformer (v1): shapes, decode-loop invariants, torch parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.models.transformer_v1 import MaskGitTransformer

TINY = dict(
    vocab_size=58,  # 56 codebook + 1 class + 1 mask
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    codebook_size=56,
    num_vq_tokens=16,
    max_position_embeddings=17,
    hidden_dropout=0.0,
    attention_dropout=0.0,
)

TINY_XATTN = dict(
    TINY,
    add_cross_attention=True,
    project_encoder_hidden_states=True,
    encoder_hidden_size=48,
)


def test_forward_shape():
    model = MaskGitTransformer(**TINY)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 58, size=(2, 16)))
    logits = model(ids)
    assert logits.shape == (2, 16, 58)


def test_forward_with_labels_loss():
    model = MaskGitTransformer(**TINY)
    rs = np.random.RandomState(1)
    ids = jnp.asarray(rs.randint(0, 58, size=(2, 16)))
    labels = rs.randint(0, 56, size=(2, 16))
    labels[:, :8] = -100
    logits, loss = model(ids, labels=jnp.asarray(labels))
    assert logits.shape == (2, 16, 58)
    assert np.isfinite(float(loss))


def test_generate2_class_conditional():
    model = MaskGitTransformer(**TINY, num_classes=1)
    class_ids = jnp.asarray([0, 0])
    out = model.generate2(class_ids=class_ids, timesteps=4, key=jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == (2, 16)
    assert (out >= 0).all() and (out < 56).all()  # no mask tokens survive


def test_generate_lucidrains_style():
    model = MaskGitTransformer(**TINY, num_classes=1)
    out = np.asarray(model.generate(class_ids=jnp.asarray([0]), timesteps=4,
                                    key=jax.random.PRNGKey(1)))
    assert out.shape == (1, 16)
    assert (out >= 0).all() and (out < 56).all()


def test_generate2_cross_attention_cfg():
    model = MaskGitTransformer(**TINY_XATTN)
    ehs = jnp.asarray(np.random.RandomState(2).randn(2, 5, 48).astype(np.float32))
    out = np.asarray(model.generate2(encoder_hidden_states=ehs, timesteps=3,
                                     guidance_scale=2.0, key=jax.random.PRNGKey(2)))
    assert out.shape == (2, 16)
    assert (out < 56).all()


@pytest.fixture(scope="module")
def reference_pair():
    torch = pytest.importorskip("torch")
    from tests.conftest import has_reference, import_reference_muse

    if not has_reference():
        pytest.skip("reference unavailable")
    import_reference_muse()
    from muse import MaskGitTransformer as RefT

    torch.manual_seed(0)
    ref = RefT(**TINY)
    ref.eval()
    model = MaskGitTransformer(config=dict(TINY), _defer_init=True)
    model.load_torch_weights({k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, model


def test_torch_forward_parity(reference_pair):
    import torch

    ref, model = reference_pair
    ids = np.random.RandomState(3).randint(0, 58, size=(2, 16))
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(ids)).numpy()
    logits = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(logits, ref_logits, atol=2e-4, rtol=1e-3)


def test_torch_forward_parity_cross_attention():
    torch = pytest.importorskip("torch")
    from tests.conftest import has_reference, import_reference_muse

    if not has_reference():
        pytest.skip("reference unavailable")
    import_reference_muse()
    from muse import MaskGitTransformer as RefT

    torch.manual_seed(1)
    ref = RefT(**TINY_XATTN)
    ref.eval()
    model = MaskGitTransformer(config=dict(TINY_XATTN), _defer_init=True)
    missing, unexpected = model.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()})

    rs = np.random.RandomState(4)
    ids = rs.randint(0, 58, size=(2, 16))
    ehs = rs.randn(2, 5, 48).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(ids),
                         encoder_hidden_states=torch.from_numpy(ehs)).numpy()
    logits = np.asarray(model(jnp.asarray(ids), jnp.asarray(ehs)))
    np.testing.assert_allclose(logits, ref_logits, atol=2e-4, rtol=1e-3)


def test_decode_step_context_hoisting_is_identity(monkeypatch):
    """v1 decode-loop hoisting (text projections + cross-attn kv as loop
    constants) must be a bitwise identity vs per-step recompute."""
    import numpy as np

    m = MaskGitTransformer(**TINY_XATTN)
    rs = np.random.RandomState(7)
    B = 2
    ids = jnp.asarray(rs.randint(0, m.config.codebook_size,
                                 (B, m.config.num_vq_tokens)), jnp.int32)
    ehs = jnp.asarray(rs.randn(B, 8, m.config.encoder_hidden_size), jnp.float32)

    plain = m.module.apply({"params": m.params}, ids, ehs)
    ctx = m.module.apply({"params": m.params}, ids, ehs, return_step_ctx=True)
    hoisted = m.module.apply({"params": m.params}, ids, ehs, step_ctx=ctx)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(hoisted))

    kw = dict(encoder_hidden_states=ehs, timesteps=3, guidance_scale=2.0,
              key=jax.random.PRNGKey(0))
    g2_ctx = m.generate2(**kw)
    g1_ctx = m.generate(**kw)
    monkeypatch.setenv("MUSE_TPU_DECODE_CTX", "0")
    m._jit_cache = {}
    np.testing.assert_array_equal(np.asarray(g2_ctx), np.asarray(m.generate2(**kw)))
    np.testing.assert_array_equal(np.asarray(g1_ctx), np.asarray(m.generate(**kw)))
    m._jit_cache = {}
