"""In-repo inpainting validation fixtures (reference ships
inpainting_validation/ folders whose NAME is the prompt,
train_muse.py:1220-1262) driven end-to-end through the trainer's loader and
panel generator."""

import os

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "inpainting_validation")

UVIT_TINY = dict(hidden_size=64, cond_embed_dim=24, micro_cond_encode_dim=8,
                 micro_cond_embed_dim=40, encoder_hidden_size=32, vocab_size=68,
                 mask_token_id=67, codebook_size=64, in_channels=32,
                 block_out_channels=(32,), num_res_blocks=1, block_num_heads=2,
                 num_hidden_layers=2, num_attention_heads=4,
                 intermediate_size=96)
VQ_TINY = dict(resolution=64, hidden_channels=32, channel_mult=(1, 1, 2, 2, 4),
               num_res_blocks=1, z_channels=32, num_embeddings=64,
               quantized_embed_dim=32)


def test_fixture_assets_shipped():
    prompts = sorted(os.listdir(FIXTURES))
    assert len(prompts) >= 5
    for p in prompts:
        files = os.listdir(os.path.join(FIXTURES, p))
        assert any("mask" in f for f in files), p
        assert any("mask" not in f for f in files), p


def test_loader_reads_fixture_folders():
    from open_muse_tpu.training.train_muse import load_inpainting_validation_data

    entries = load_inpainting_validation_data(FIXTURES, image_size=64,
                                              latent_side=4)
    assert len(entries) >= 5
    prompts = {e["prompt"] for e in entries}
    assert "a bright jungle" in prompts
    for e in entries:
        assert e["image"].shape == (64, 64, 3)
        assert e["mask"].shape == (4, 4)
        assert e["mask"].any(), e["prompt"]  # masks mark a real region


def test_generate_inpainting_images_end_to_end(tmp_path):
    from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2
    from open_muse_tpu.training.train_muse import (
        generate_inpainting_images, load_inpainting_validation_data)

    model = MaskGiTUViT_v2(**UVIT_TINY)
    vq = MaskGitVQGAN(**VQ_TINY)

    entries = load_inpainting_validation_data(FIXTURES, image_size=64,
                                              latent_side=4)[:2]
    rs = np.random.RandomState(0)

    def encode_text(texts):
        return (jnp.asarray(rs.randn(len(texts), 7, 32), dtype=jnp.float32),
                jnp.asarray(rs.randn(len(texts), 24), dtype=jnp.float32))

    out = tmp_path / "inpaint.png"
    generate_inpainting_images(
        model, vq, entries, encode_text, mask_id=67,
        micro_conds=jnp.asarray([[64, 64, 0, 0, 6.0]], dtype=jnp.float32),
        empty_embeds=jnp.asarray(rs.randn(1, 7, 32), dtype=jnp.float32),
        empty_cond_embeds=jnp.asarray(rs.randn(1, 24), dtype=jnp.float32),
        out_path=str(out), key=jax.random.PRNGKey(0))
    assert out.is_file()
    from PIL import Image

    assert Image.open(out).size[0] >= 64
