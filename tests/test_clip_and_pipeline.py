"""CLIP text encoder parity vs HF torch + end-to-end pipeline smoke tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.models.clip_text import CLIPTextEncoder
from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN
from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2
from open_muse_tpu.models.transformer_v1 import MaskGitTransformer
from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse, PipelineMuseInpainting

CLIP_TINY = dict(
    vocab_size=100,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    max_position_embeddings=16,
    projection_dim=24,
)


class DummyTokenizer:
    model_max_length = 16

    def __call__(self, texts, padding=None, truncation=None, max_length=None,
                 return_tensors=None):
        rs = np.random.RandomState(sum(len(t) for t in texts) + 1)
        ids = rs.randint(1, 90, size=(len(texts), self.model_max_length))
        ids[:, -1] = 99  # eos = max id
        return {"input_ids": ids}


def test_clip_encoder_shapes():
    enc = CLIPTextEncoder(**CLIP_TINY)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 99, size=(2, 16)))
    hidden_states, last, text_embeds = enc.encode(ids)
    assert len(hidden_states) == 4  # embeddings + 3 layers
    assert last.shape == (2, 16, 32)
    assert text_embeds.shape == (2, 24)


def test_clip_torch_parity():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=16, projection_dim=24,
        hidden_act="quick_gelu", eos_token_id=99, bos_token_id=98,
    )
    torch.manual_seed(0)
    ref = CLIPTextModelWithProjection(hf_cfg)
    ref.eval()

    enc = CLIPTextEncoder(config=dict(CLIP_TINY), _defer_init=True)
    missing, unexpected = enc.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()}, strict=False)
    assert not missing, missing

    ids = np.random.RandomState(1).randint(1, 90, size=(2, 16))
    ids[:, -1] = 99
    with torch.no_grad():
        out = ref(torch.from_numpy(ids), output_hidden_states=True)
    hidden_states, last, text_embeds = enc.encode(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(hidden_states[-2]),
                               out.hidden_states[-2].numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(text_embeds),
                               out.text_embeds.numpy(), atol=3e-4, rtol=1e-3)


VAE_TINY = dict(
    resolution=32,
    hidden_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=1,
    z_channels=16,
    num_embeddings=64,
    quantized_embed_dim=16,
)

UVIT_TINY = dict(
    hidden_size=64,
    cond_embed_dim=24,  # == clip projection_dim
    micro_cond_encode_dim=8,
    micro_cond_embed_dim=40,
    encoder_hidden_size=32,  # == clip hidden_size
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


@pytest.fixture(scope="module")
def tiny_pipeline():
    vae = MaskGitVQGAN(**VAE_TINY)
    transformer = MaskGiTUViT_v2(**UVIT_TINY)
    text_encoder = CLIPTextEncoder(**CLIP_TINY)
    return PipelineMuse(vae=vae, transformer=transformer, text_encoder=text_encoder,
                        tokenizer=DummyTokenizer())


def test_pipeline_text2image(tiny_pipeline):
    images = tiny_pipeline("a photo of a cat", timesteps=3, guidance_scale=4.0,
                           transformer_seq_len=256, key=jax.random.PRNGKey(0))
    assert len(images) == 1
    assert images[0].size == (32, 32)


def test_pipeline_num_images_per_prompt(tiny_pipeline):
    images = tiny_pipeline(["a dog", "a cat"], timesteps=2, guidance_scale=2.0,
                           num_images_per_prompt=2, transformer_seq_len=256,
                           key=jax.random.PRNGKey(1))
    assert len(images) == 4


def test_pipeline_save_load_roundtrip(tiny_pipeline, tmp_path):
    tiny_pipeline.save_pretrained(str(tmp_path))
    loaded = PipelineMuse.from_pretrained(str(tmp_path))
    assert loaded.transformer.config == tiny_pipeline.transformer.config
    assert loaded.vae.config == tiny_pipeline.vae.config
    loaded.tokenizer = DummyTokenizer()
    images = loaded("roundtrip", timesteps=2, guidance_scale=0.0,
                    transformer_seq_len=256, key=jax.random.PRNGKey(2))
    assert images[0].size == (32, 32)


def test_pipeline_inpainting(tiny_pipeline):
    from PIL import Image

    pipe = PipelineMuseInpainting(
        vae=tiny_pipeline.vae, transformer=tiny_pipeline.transformer,
        text_encoder=tiny_pipeline.text_encoder, tokenizer=DummyTokenizer())
    img = Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8))
    mask = np.zeros((16, 16), dtype=bool)
    mask[:8] = True
    images = pipe(image=img, mask=mask, text="fill the top", timesteps=3,
                  guidance_scale=2.0, image_size=32, key=jax.random.PRNGKey(3))
    assert images[0].size == (32, 32)


def test_pipeline_negative_prompts(tiny_pipeline):
    """negative prompts route into CFG as the uncond branch
    (reference pipeline_muse.py:136-161, generate2 negative_embeds)."""
    images = tiny_pipeline("a dog", negative_text="blurry, low quality",
                           timesteps=2, guidance_scale=3.0,
                           transformer_seq_len=256, key=jax.random.PRNGKey(5))
    assert images[0].size == (32, 32)
    # explicit negative embeds instead of text
    rs = np.random.RandomState(9)
    images = tiny_pipeline(
        "a dog", negative_text=None,
        negative_prompt_embeds=rs.randn(1, 16, 32).astype(np.float32),
        negative_pooled_embeds=rs.randn(1, 24).astype(np.float32),
        timesteps=2, guidance_scale=3.0, transformer_seq_len=256,
        key=jax.random.PRNGKey(6))
    assert images[0].size == (32, 32)


def test_pipeline_return_intermediate(tiny_pipeline):
    images, intermediate = tiny_pipeline(
        "a cat", timesteps=3, guidance_scale=2.0, transformer_seq_len=256,
        return_intermediate=True, key=jax.random.PRNGKey(7))
    assert len(images) == 1
    assert len(intermediate) == 3
    assert intermediate[0][0].size == (32, 32)


def test_pipeline_compile_text2image_fused(tiny_pipeline):
    """The fused one-program pipeline matches the staged pipeline's contract:
    tokenized text in, decoded images out."""
    fused = tiny_pipeline.compile_text2image(batch_size=2, timesteps=3,
                                             guidance_scale=2.0, seq_len=256)
    ids = jnp.asarray(DummyTokenizer()(["a", "bb"])["input_ids"])
    micro = jnp.asarray([[512, 512, 0, 0, 6.0]] * 2, dtype=jnp.float32)
    images = fused(ids, micro, jax.random.PRNGKey(0))
    assert images.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(images)).all()


def test_pipeline_compile_text2image_fused_no_cfg(tiny_pipeline):
    """Distilled serving config: guidance_scale=0 must run the decode WITHOUT
    the CFG batch-double (regression: the fused path used to concatenate the
    empty-prompt batch unconditionally, doubling the scan carry and failing
    to trace — found by benchmark/muse_perf.py --distilled)."""
    fused = tiny_pipeline.compile_text2image(batch_size=1, timesteps=3,
                                             guidance_scale=0.0, seq_len=256)
    ids = jnp.asarray(DummyTokenizer()(["a"])["input_ids"])
    micro = jnp.asarray([[512, 512, 0, 0, 6.0]], dtype=jnp.float32)
    images = fused(ids, micro, jax.random.PRNGKey(0))
    assert images.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(images)).all()


def test_pipeline_class_conditional():
    vae = MaskGitVQGAN(**VAE_TINY)
    transformer = MaskGitTransformer(
        vocab_size=66, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, codebook_size=64, num_vq_tokens=256,
        max_position_embeddings=257, num_classes=1, hidden_dropout=0.0,
        attention_dropout=0.0)
    pipe = PipelineMuse(vae=vae, transformer=transformer, is_class_conditioned=True)
    images = pipe(class_ids=0, timesteps=2, key=jax.random.PRNGKey(4))
    assert images[0].size == (32, 32)
