"""End-to-end LEARNING test: a tiny model trained on colored squares must
generate the right color for each prompt.

This validates the entire vertical — VQ tokenize, masking, fused train step,
optimization, decode loop, VQ decode — not just shapes: if any piece is
mathematically wrong, the model can't learn the (prompt -> color) mapping.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.models.clip_text import CLIPTextEncoder, SimpleTokenizer
from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN
from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2
from open_muse_tpu.ops.sampling import cosine_schedule
from open_muse_tpu.training import trainer as T
from open_muse_tpu.training.optimizers import get_optimizer

COLORS = {
    "red": (0.9, 0.1, 0.1),
    "green": (0.1, 0.9, 0.1),
    "blue": (0.1, 0.1, 0.9),
}


def _train_vq(vq, rs, steps: int = 150):
    """Stage 1: train the tokenizer (recon + codebook losses, the
    train_vqgan objective) until colored squares reconstruct."""
    import optax
    from functools import partial

    tx = get_optimizer("adamw", 3e-3)
    opt_state = tx.init(vq.params)

    def loss_fn(params, pixels):
        recon, z_q, _, vq_loss = vq.module.apply({"params": params}, pixels, True)
        return jnp.mean(jnp.square(recon - pixels)) + vq_loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, pixels):
        loss, grads = jax.value_and_grad(loss_fn)(params, pixels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = vq.params
    for i in range(steps):
        colors = [list(COLORS)[j % 3] for j in range(i, i + 6)]
        pixels = []
        for c in colors:
            img = np.ones((16, 16, 3), np.float32) * np.asarray(COLORS[c])
            img += rs.randn(16, 16, 3).astype(np.float32) * 0.02
            pixels.append(np.clip(img, 0, 1))
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(np.stack(pixels)))
    vq.params = params
    vq._jit_cache.clear()
    return float(loss)


@pytest.mark.slow
def test_tiny_model_learns_prompt_to_color():
    rs = np.random.RandomState(0)
    vq = MaskGitVQGAN(resolution=16, hidden_channels=32, channel_mult=(1, 2),
                      num_res_blocks=1, z_channels=16, num_embeddings=64,
                      quantized_embed_dim=16)
    recon_loss = _train_vq(vq, rs)
    assert recon_loss < 0.05, f"VQ failed to learn reconstructions: {recon_loss}"
    # sanity: a red square must roundtrip red through the trained tokenizer
    red = jnp.asarray(np.ones((1, 16, 16, 3), np.float32)
                      * np.asarray(COLORS["red"]))
    recon = np.asarray(vq.decode_code(vq.get_code(red)))[0]
    assert np.argmax(recon.reshape(-1, 3).mean(0)) == 0
    text_encoder = CLIPTextEncoder(vocab_size=64, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   max_position_embeddings=8, projection_dim=24)
    tokenizer = SimpleTokenizer(64, 8)
    model = MaskGiTUViT_v2(
        hidden_size=64, cond_embed_dim=24, micro_cond_encode_dim=8,
        micro_cond_embed_dim=40, encoder_hidden_size=32, vocab_size=68,
        codebook_size=64, in_channels=32, block_out_channels=(32,),
        num_res_blocks=1, block_num_heads=2, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96)

    # dataset: 8x8-latent color squares with mild noise
    def batch_for(colors):
        pixels, texts = [], []
        for c in colors:
            img = np.ones((16, 16, 3), np.float32) * np.asarray(COLORS[c])
            img += rs.randn(16, 16, 3).astype(np.float32) * 0.02
            pixels.append(np.clip(img, 0, 1))
            texts.append(f"a {c} square")
        pixels = jnp.asarray(np.stack(pixels))
        tokens = vq.get_code(pixels)
        ids = jnp.asarray(tokenizer(texts)["input_ids"])
        hs, _, pooled = text_encoder.encode(ids)
        return {
            "image_tokens": tokens,
            "encoder_hidden_states": hs[-2],
            "cond_embeds": pooled,
            "micro_conds": jnp.asarray([[16, 16, 0, 0, 6.0]] * len(colors),
                                       dtype=jnp.float32),
        }

    tx = get_optimizer("adamw", 4e-3, max_grad_norm=1.0)
    state = T.create_train_state(model.params, tx)
    step_fn = T.make_uvit_train_step(model.module, tx, cosine_schedule,
                                     model.config.mask_token_id,
                                     codebook_size=64)
    key = jax.random.PRNGKey(0)
    names = list(COLORS)
    first_loss = last_loss = None
    for i in range(200):
        key, sub = jax.random.split(key)
        batch = batch_for([names[j % 3] for j in range(i, i + 6)])
        state, metrics = step_fn(state, batch, sub)
        if i == 0:
            first_loss = float(metrics["loss"])
        last_loss = float(metrics["loss"])
    assert last_loss < first_loss * 0.7, (first_loss, last_loss)

    # sample each color and check the dominant channel
    model.params = state.params
    for color, rgb in COLORS.items():
        ids = jnp.asarray(tokenizer([f"a {color} square"])["input_ids"])
        hs, _, pooled = text_encoder.encode(ids)
        tokens = model.generate2(
            hs[-2], pooled, jnp.asarray([[16, 16, 0, 0, 6.0]], dtype=jnp.float32),
            empty_embeds=hs[-2], empty_cond_embeds=pooled,
            timesteps=6, guidance_scale=0.0, temperature=(1.0, 0.0),
            seq_len=int(tokens_len(vq)), key=jax.random.PRNGKey(7))
        img = np.asarray(vq.decode_code(tokens))[0]
        mean_rgb = img.reshape(-1, 3).mean(0)
        expected = int(np.argmax(rgb))
        got = int(np.argmax(mean_rgb))
        assert got == expected, f"{color}: mean_rgb={mean_rgb}"


def tokens_len(vq):
    return (16 // vq.config.reduction_factor) ** 2
