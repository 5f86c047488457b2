"""Real-checkpoint validation: reference-exported config.json +
pytorch_model.bin -> from_pretrained -> decode chain, verified against the
torch reference ON THE SAME WEIGHTS (VERDICT round 1: everything had only
been parity-tested against in-memory random torch modules; no checkpoint in
the published hub layout had ever been loaded).

The staged checkpoints come from scripts/stage_reference_checkpoint.py: the
reference's own models + save_pretrained, in the published
transformer/ + vae/ + text_encoder/ layout
(/root/reference/benchmark/muse_perf.py:242-270).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_PATH, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="torch reference unavailable")

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    from stage_reference_checkpoint import stage

    return stage(str(tmp_path_factory.mktemp("ref_ckpt")), size="small")


def _ref_muse():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import muse

    return muse


def test_vae_real_checkpoint_token_and_pixel_parity(staged):
    import torch

    from open_muse_tpu.models.taming_vqgan import VQGANModel

    muse = _ref_muse()
    ours = VQGANModel.from_pretrained(os.path.join(staged, "vae"))
    theirs = muse.VQGANModel.from_pretrained(os.path.join(staged, "vae"))
    theirs.eval()

    rs = np.random.RandomState(0)
    pixels = rs.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_codes = theirs.get_code(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
    codes = ours.get_code(jnp.asarray(pixels))
    np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())

    with torch.no_grad():
        ref_img = theirs.decode_code(ref_codes).numpy().transpose(0, 2, 3, 1)
    img = np.asarray(ours.decode_code(codes))
    np.testing.assert_allclose(img, ref_img, atol=2e-4)


def _transformer_pair(staged):
    import torch  # noqa: F401

    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

    muse = _ref_muse()
    ours = MaskGiTUViT_v2.from_pretrained(os.path.join(staged, "transformer"))
    theirs = muse.MaskGiTUViT.from_pretrained(os.path.join(staged, "transformer"))
    theirs.eval()
    return ours, theirs


def _conditioning(rs, batch, cfg):
    ehs = rs.randn(batch, 7, cfg.encoder_hidden_size).astype(np.float32)
    cond = rs.randn(batch, cfg.cond_embed_dim).astype(np.float32)
    micro = np.tile([[512, 512, 0, 0, 6.0]], (batch, 1)).astype(np.float32)
    return ehs, cond, micro


def test_transformer_real_checkpoint_logits_parity(staged):
    import torch

    ours, theirs = _transformer_pair(staged)
    cfg = ours.config
    rs = np.random.RandomState(1)
    ids = rs.randint(0, cfg.codebook_size, (2, 16)).astype(np.int32)
    ids[:, ::3] = cfg.mask_token_id
    ehs, cond, micro = _conditioning(rs, 2, cfg)

    with torch.no_grad():
        ref_logits = theirs(
            torch.from_numpy(ids).long(), torch.from_numpy(ehs),
            cond_embeds=torch.from_numpy(cond),
            micro_conds=torch.from_numpy(micro)).numpy()
    logits = np.asarray(ours.apply(
        jnp.asarray(ids), jnp.asarray(ehs), jnp.asarray(cond),
        jnp.asarray(micro)))
    np.testing.assert_allclose(logits, ref_logits, atol=5e-4)
    np.testing.assert_array_equal(logits.argmax(-1), ref_logits.argmax(-1))


def test_greedy_decode_token_agreement_on_real_weights(staged):
    """Full 12-step deterministic parallel decode, both frameworks fed the
    SAME evolving token state: per-step argmax token ids must agree exactly
    (the stochastic gumbel/multinomial parts of generate2 cannot bit-match
    across RNGs, so the deterministic subpath is the token-level contract)."""
    import torch

    ours, theirs = _transformer_pair(staged)
    cfg = ours.config
    rs = np.random.RandomState(2)
    ehs, cond, micro = _conditioning(rs, 1, cfg)
    empty_ehs = rs.randn(1, 7, cfg.encoder_hidden_size).astype(np.float32)
    empty_cond = rs.randn(1, cfg.cond_embed_dim).astype(np.float32)
    guidance = 8.0
    seq_len, timesteps = 16, 12

    ids = np.full((1, seq_len), cfg.mask_token_id, dtype=np.int64)
    for step in range(timesteps):
        cat_ids = np.concatenate([ids, ids])
        cat_ehs = np.concatenate([ehs, empty_ehs])
        cat_cond = np.concatenate([cond, empty_cond])
        cat_micro = np.concatenate([micro, micro])
        with torch.no_grad():
            ref = theirs(torch.from_numpy(cat_ids).long(),
                         torch.from_numpy(cat_ehs),
                         cond_embeds=torch.from_numpy(cat_cond),
                         micro_conds=torch.from_numpy(cat_micro)).numpy()
        got = np.asarray(ours.apply(
            jnp.asarray(cat_ids, dtype=jnp.int32), jnp.asarray(cat_ehs),
            jnp.asarray(cat_cond), jnp.asarray(cat_micro)))
        for logits in (ref, got):
            assert np.isfinite(logits).all()
        ref_g = ref[1:] + guidance * (ref[:1] - ref[1:])
        got_g = got[1:] + guidance * (got[:1] - got[1:])
        np.testing.assert_array_equal(got_g.argmax(-1), ref_g.argmax(-1))

        sampled = ref_g.argmax(-1)
        unknown = ids == cfg.mask_token_id
        sampled = np.where(unknown, sampled, ids)
        ratio = (step + 1) / timesteps
        mask_len = int(np.floor(seq_len * np.cos(ratio * np.pi / 2)))
        mask_len = max(1, min(int(unknown.sum()) - 1, mask_len))
        probs = np.exp(ref_g - ref_g.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        conf = np.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        conf = np.where(unknown, conf, np.inf)
        cutoff = np.sort(conf, axis=-1)[:, mask_len - 1:mask_len]
        ids = np.where(conf <= cutoff, cfg.mask_token_id, sampled)
        if not (ids == cfg.mask_token_id).any():
            break


def test_pipeline_loads_published_hub_layout(staged):
    """PipelineMuse.from_pretrained on the exact published directory layout:
    _class_name dispatch (MaskGiTUViT_v2 / VQGANModel), HF
    CLIPTextModelWithProjection ingestion, end-to-end text2image."""
    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    pipe = PipelineMuse.from_pretrained(staged)
    images = pipe("a photo of a cat", timesteps=2, guidance_scale=2.0,
                  key=jax.random.PRNGKey(0))
    assert len(images) == 1
    # default 256 tokens -> 16x16 latent, f2 small VAE -> 32px output
    assert images[0].size == (32, 32)


def test_calculate_fid_generation_smoke(staged, tmp_path):
    """scripts/calculate_fid.py drives the real-checkpoint pipeline for the
    COCO-caption generation half of the FID protocol (reference
    scripts/calculate_fid.py:107-220); scoring runs when cleanfid exists."""
    captions = tmp_path / "captions.txt"
    captions.write_text("a cat\na dog\na red car\na blue house\n")
    out = tmp_path / "fid_out"
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "calculate_fid.py"),
         "--model", staged, "--captions", str(captions),
         "--output-dir", str(out), "--num-images", "4",
         "--batch-size", "2", "--timesteps", "2"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu",
             "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    pngs = [f for f in os.listdir(out) if f.endswith((".png", ".jpg"))]
    assert len(pngs) == 4


@pytest.mark.slow
def test_full_research_config_real_checkpoint(tmp_path):
    """The ACTUAL research-run architecture (hidden 1024 / 22 layers /
    codebook 8192 + f16-8192 taming VQGAN): stage via the reference's
    save_pretrained, load with from_pretrained, forward-parity vs torch."""
    import torch

    from stage_reference_checkpoint import stage

    from open_muse_tpu.models.taming_vqgan import VQGANModel
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

    staged = stage(str(tmp_path / "full"), size="full")
    muse = _ref_muse()

    ours = MaskGiTUViT_v2.from_pretrained(os.path.join(staged, "transformer"))
    assert ours.config.hidden_size == 1024
    assert ours.config.num_hidden_layers == 22
    assert ours.config.codebook_size == 8192
    theirs = muse.MaskGiTUViT.from_pretrained(os.path.join(staged, "transformer"))
    theirs.eval()

    cfg = ours.config
    rs = np.random.RandomState(3)
    ids = rs.randint(0, cfg.codebook_size, (1, 256)).astype(np.int32)
    ids[:, ::2] = cfg.mask_token_id
    ehs, cond, micro = _conditioning(rs, 1, cfg)
    with torch.no_grad():
        ref_logits = theirs(
            torch.from_numpy(ids).long(), torch.from_numpy(ehs),
            cond_embeds=torch.from_numpy(cond),
            micro_conds=torch.from_numpy(micro)).numpy()
    logits = np.asarray(ours.apply(
        jnp.asarray(ids), jnp.asarray(ehs), jnp.asarray(cond),
        jnp.asarray(micro)))
    np.testing.assert_allclose(logits, ref_logits, atol=2e-3)
    agree = (logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    assert agree > 0.999, f"argmax agreement {agree}"

    vae = VQGANModel.from_pretrained(os.path.join(staged, "vae"))
    assert vae.config.num_embeddings == 8192
    ref_vae = muse.VQGANModel.from_pretrained(os.path.join(staged, "vae"))
    ref_vae.eval()
    pixels = rs.rand(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref_vae.get_code(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
    codes = vae.get_code(jnp.asarray(pixels))
    np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())
