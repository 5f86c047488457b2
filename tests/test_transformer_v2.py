"""MaskGiTUViT_v2: shapes, decode invariants, torch parity (incl. 512px
force_down_up_sample variant and ConvTranspose conversion)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

TINY = dict(
    hidden_size=64,
    cond_embed_dim=32,
    micro_cond_encode_dim=8,
    micro_cond_embed_dim=40,  # 8 * 5 micro conds
    encoder_hidden_size=48,
    vocab_size=68,
    mask_token_id=67,
    codebook_size=64,
    in_channels=32,
    block_out_channels=(32,),
    num_res_blocks=1,
    block_num_heads=2,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=96,
)

TINY_DOWN = dict(TINY, force_down_up_sample=True)


def _inputs(rs, batch=2, seq=16, cfg=TINY):
    ids = rs.randint(0, 68, size=(batch, seq))
    ehs = rs.randn(batch, 7, cfg["encoder_hidden_size"]).astype(np.float32)
    cond = rs.randn(batch, cfg["cond_embed_dim"]).astype(np.float32)
    micro = np.asarray([[512, 512, 0, 0, 6.0]] * batch, dtype=np.float32)
    return ids, ehs, cond, micro


def test_forward_shape():
    model = MaskGiTUViT_v2(**TINY)
    ids, ehs, cond, micro = _inputs(np.random.RandomState(0))
    logits = model(jnp.asarray(ids), jnp.asarray(ehs), jnp.asarray(cond),
                   jnp.asarray(micro))
    assert logits.shape == (2, 16, 64)


def test_forward_down_up_sample_shape():
    model = MaskGiTUViT_v2(**TINY_DOWN)
    ids, ehs, cond, micro = _inputs(np.random.RandomState(1), seq=64)
    logits = model(jnp.asarray(ids), jnp.asarray(ehs), jnp.asarray(cond),
                   jnp.asarray(micro))
    assert logits.shape == (2, 64, 64)


def test_loss_and_weighted_loss():
    model = MaskGiTUViT_v2(**TINY)
    rs = np.random.RandomState(2)
    ids, ehs, cond, micro = _inputs(rs)
    labels = rs.randint(0, 64, size=(2, 16))
    labels[:, :4] = -100
    logits, loss = model(jnp.asarray(ids), jnp.asarray(ehs), jnp.asarray(cond),
                         jnp.asarray(micro), labels=jnp.asarray(labels))
    assert np.isfinite(float(loss))
    lw = jnp.asarray(rs.rand(2, 16).astype(np.float32))
    logits, wloss = model(jnp.asarray(ids), jnp.asarray(ehs), jnp.asarray(cond),
                          jnp.asarray(micro), labels=jnp.asarray(labels),
                          loss_weight=lw)
    assert np.isfinite(float(wloss))


def test_generate2_cfg_and_intermediate():
    model = MaskGiTUViT_v2(**TINY)
    rs = np.random.RandomState(3)
    _, ehs, cond, micro = _inputs(rs)
    empty = rs.randn(1, 7, 48).astype(np.float32)
    empty_cond = rs.randn(1, 32).astype(np.float32)
    out = model.generate2(jnp.asarray(ehs), jnp.asarray(cond), jnp.asarray(micro),
                          empty_embeds=jnp.asarray(empty),
                          empty_cond_embeds=jnp.asarray(empty_cond),
                          timesteps=4, guidance_scale=2.0, temperature=(2, 0),
                          seq_len=16, key=jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == (2, 16)
    assert (out >= 0).all() and (out < 64).all()

    final, inter = model.generate2(
        jnp.asarray(ehs), jnp.asarray(cond), jnp.asarray(micro),
        empty_embeds=jnp.asarray(empty), empty_cond_embeds=jnp.asarray(empty_cond),
        timesteps=4, guidance_scale=2.0, seq_len=16, return_intermediate=True,
        key=jax.random.PRNGKey(0))
    assert np.asarray(inter).shape == (4, 2, 16)
    # intermediate frames are the RAW per-step samples, recorded before
    # already-known tokens are restored (reference
    # modeling_transformer_v2.py:447-450) — so inter[-1] need not equal
    # final at positions fixed in earlier steps.  With a single step every
    # position is still masked, so raw == final exactly:
    final1, inter1 = model.generate2(
        jnp.asarray(ehs), jnp.asarray(cond), jnp.asarray(micro),
        empty_embeds=jnp.asarray(empty), empty_cond_embeds=jnp.asarray(empty_cond),
        timesteps=1, guidance_scale=2.0, seq_len=16, return_intermediate=True,
        key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(final1), np.asarray(inter1)[-1])


def test_generate2_guidance_schedules():
    model = MaskGiTUViT_v2(**TINY)
    rs = np.random.RandomState(4)
    _, ehs, cond, micro = _inputs(rs, batch=1)
    empty = rs.randn(1, 7, 48).astype(np.float32)
    empty_cond = rs.randn(1, 32).astype(np.float32)
    for sched in ("linear", "cosine", None):
        out = model.generate2(jnp.asarray(ehs), jnp.asarray(cond), jnp.asarray(micro),
                              empty_embeds=jnp.asarray(empty),
                              empty_cond_embeds=jnp.asarray(empty_cond),
                              timesteps=3, guidance_scale=4.0,
                              guidance_schedule=sched, seq_len=16,
                              key=jax.random.PRNGKey(1))
        assert np.asarray(out).shape == (1, 16)


def test_generate2_inpainting_seed():
    """input_ids seeding: unmasked positions must survive decoding."""
    model = MaskGiTUViT_v2(**TINY)
    rs = np.random.RandomState(5)
    _, ehs, cond, micro = _inputs(rs, batch=1)
    seed_ids = np.full((1, 16), 67, dtype=np.int32)  # all masked
    seed_ids[0, :4] = [1, 2, 3, 4]  # keep these
    out = np.asarray(model.generate2(
        jnp.asarray(ehs), jnp.asarray(cond), jnp.asarray(micro),
        input_ids=jnp.asarray(seed_ids), timesteps=4, guidance_scale=0.0,
        seq_len=16, key=jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(out[0, :4], [1, 2, 3, 4])


@pytest.fixture(scope="module", params=["base", "down_up"])
def reference_pair(request):
    torch = pytest.importorskip("torch")
    from tests.conftest import has_reference, import_reference_muse

    if not has_reference():
        pytest.skip("reference unavailable")
    import_reference_muse()
    from muse import MaskGiTUViT

    cfg = TINY if request.param == "base" else TINY_DOWN
    torch.manual_seed(0)
    ref = MaskGiTUViT(**{k: (list(v) if isinstance(v, tuple) else v)
                         for k, v in cfg.items()})
    ref.eval()
    model = MaskGiTUViT_v2(config=dict(cfg), _defer_init=True)
    missing, unexpected = model.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, model, cfg, request.param


def test_torch_forward_parity(reference_pair):
    import torch

    ref, model, cfg, variant = reference_pair
    seq = 64 if variant == "down_up" else 16
    rs = np.random.RandomState(6)
    ids, ehs, cond, micro = _inputs(rs, batch=2, seq=seq, cfg=cfg)
    with torch.no_grad():
        ref_logits = ref(
            torch.from_numpy(ids),
            encoder_hidden_states=torch.from_numpy(ehs),
            cond_embeds=torch.from_numpy(cond),
            micro_conds=torch.from_numpy(micro),
        ).numpy()
    logits = np.asarray(model(jnp.asarray(ids), jnp.asarray(ehs), jnp.asarray(cond),
                              jnp.asarray(micro)))
    np.testing.assert_allclose(logits, ref_logits, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("cfg_dict", [TINY, TINY_DOWN])
def test_decode_step_context_hoisting_is_identity(cfg_dict, monkeypatch):
    """The decode-loop step context (hoisted cross-kv / AdaLN / encoder
    projections) must be a bitwise identity transform: same forward, same
    decoded ids as the per-step-recompute path (MUSE_TPU_DECODE_CTX=0)."""
    import jax

    m = MaskGiTUViT_v2(**cfg_dict)
    rs = np.random.RandomState(7)
    B, S = 2, 16
    ids = jnp.asarray(rs.randint(0, m.config.codebook_size, (B, S)), jnp.int32)
    ehs = jnp.asarray(rs.randn(B, 7, m.config.encoder_hidden_size), jnp.float32)
    conds = jnp.asarray(rs.randn(B, m.config.cond_embed_dim), jnp.float32)
    micros = jnp.asarray(np.tile([[512, 512, 0, 0, 6.0]], (B, 1)), jnp.float32)

    plain = m.module.apply({"params": m.params}, ids, ehs, conds, micros)
    ctx = m.module.apply({"params": m.params}, ids, ehs, conds, micros,
                         return_step_ctx=True)
    hoisted = m.module.apply({"params": m.params}, ids, ehs, conds, micros,
                             step_ctx=ctx)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(hoisted))

    kw = dict(empty_embeds=jnp.zeros((1, 7, m.config.encoder_hidden_size)),
              empty_cond_embeds=jnp.zeros((1, m.config.cond_embed_dim)),
              timesteps=3, guidance_scale=2.0, seq_len=16,
              key=jax.random.PRNGKey(1))
    out_ctx = m.generate2(ehs, conds, micros, **kw)
    monkeypatch.setenv("MUSE_TPU_DECODE_CTX", "0")
    m._jit_cache = {}
    out_plain = m.generate2(ehs, conds, micros, **kw)
    m._jit_cache = {}
    np.testing.assert_array_equal(np.asarray(out_ctx), np.asarray(out_plain))
