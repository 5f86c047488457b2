"""Self-contained quality regression: train a tiny MUSE stack from scratch on
a synthetic prompt->image distribution, generate, and SCORE the result.

This closes the quality loop the reference closes with published
FID/CLIP/ISC curves (benchmark/model_quality.py:18-88, measured on 10k COCO
with hub checkpoints): with no network access to the openMUSE weights, the
measurable equivalent is a train-to-convergence regression — if any piece of
the vertical (VQ tokenize, masking, fused train step, decode loop, VQ decode,
scoring) is wrong, the trained model's FID against a held-out real set will
not beat the untrained model's, and its prompt->color accuracy will sit at
chance.

Metrics produced (all MEASURED, nothing replayed):
  fid_clipfeat_seeded  Fréchet distance over a fixed-seed CLIP tower's
                       features (deterministic regression metric; becomes
                       published CLIP-FID when real weights are supplied)
  color_accuracy       fraction of prompts whose generated image has the
                       prompted dominant channel (direct text-image agreement)
  clip_score_seeded    CLIP-score machinery end-to-end (seeded towers)

The colored-squares distribution matches tests/test_learning_e2e.py; that
test is the fast gate, this module is the measured-artifact producer
(benchmark/measure_quality.py writes benchmark/artifacts/quality_ours.csv).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

__all__ = ["run_quality_regression", "run_distill_regression", "COLORS",
           "color_accuracy", "make_square_images"]

COLORS = {
    "red": (0.9, 0.1, 0.1),
    "green": (0.1, 0.9, 0.1),
    "blue": (0.1, 0.1, 0.9),
}
RESOLUTION = 16


def make_square_images(colors: List[str], rs: np.random.RandomState,
                       noise: float = 0.02) -> np.ndarray:
    out = []
    for c in colors:
        img = np.ones((RESOLUTION, RESOLUTION, 3), np.float32) * np.asarray(
            COLORS[c], np.float32)
        img += rs.randn(RESOLUTION, RESOLUTION, 3).astype(np.float32) * noise
        out.append(np.clip(img, 0.0, 1.0))
    return np.stack(out)


def color_accuracy(images: List[np.ndarray], prompts: List[str]) -> float:
    """Fraction of images whose dominant channel matches the prompted color."""
    correct = 0
    for img, prompt in zip(images, prompts):
        color = next(c for c in COLORS if c in prompt)
        expected = int(np.argmax(COLORS[color]))
        got = int(np.argmax(np.asarray(img, np.float32).reshape(-1, 3).mean(0)))
        correct += int(got == expected)
    return correct / max(len(images), 1)


def _build_stack(seed: int):
    from ..models.clip_text import CLIPTextEncoder, SimpleTokenizer
    from ..models.maskgit_vqgan import MaskGitVQGAN
    from ..models.transformer_v2 import MaskGiTUViT_v2

    vq = MaskGitVQGAN(resolution=RESOLUTION, hidden_channels=32,
                      channel_mult=(1, 2), num_res_blocks=1, z_channels=16,
                      num_embeddings=64, quantized_embed_dim=16, seed=seed)
    text_encoder = CLIPTextEncoder(vocab_size=64, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   max_position_embeddings=8,
                                   projection_dim=24, seed=seed)
    tokenizer = SimpleTokenizer(64, 8)
    model = MaskGiTUViT_v2(
        hidden_size=64, cond_embed_dim=24, micro_cond_encode_dim=8,
        micro_cond_embed_dim=40, encoder_hidden_size=32, vocab_size=68,
        codebook_size=64, in_channels=32, block_out_channels=(32,),
        num_res_blocks=1, block_num_heads=2, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, seed=seed)
    return vq, text_encoder, tokenizer, model


def _train_vq(vq, rs, steps: int, lr: float = 3e-3) -> float:
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from ..training.optimizers import get_optimizer

    tx = get_optimizer("adamw", lr)
    opt_state = tx.init(vq.params)

    def loss_fn(params, pixels):
        recon, z_q, _, vq_loss = vq.module.apply({"params": params}, pixels,
                                                 True)
        return jnp.mean(jnp.square(recon - pixels)) + vq_loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, pixels):
        loss, grads = jax.value_and_grad(loss_fn)(params, pixels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, loss = vq.params, None
    names = list(COLORS)
    for i in range(steps):
        pixels = make_square_images([names[j % 3] for j in range(i, i + 6)], rs)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(pixels))
    vq.params = params
    vq._jit_cache.clear()
    return float(loss)


def _make_batch_fn(vq, text_encoder, tokenizer, rs):
    """batch_for(colors) -> trainer batch dict (colored-squares tokens +
    text encodings), shared by the regression and distillation recipes."""
    import jax.numpy as jnp

    def batch_for(colors):
        pixels = make_square_images(colors, rs)
        tokens = vq.get_code(jnp.asarray(pixels))
        texts = [f"a {c} square" for c in colors]
        ids = jnp.asarray(tokenizer(texts)["input_ids"])
        hs, _, pooled = text_encoder.encode(ids)
        return {
            "image_tokens": tokens,
            "encoder_hidden_states": hs[-2],
            "cond_embeds": pooled,
            "micro_conds": jnp.asarray(
                [[RESOLUTION, RESOLUTION, 0, 0, 6.0]] * len(colors),
                jnp.float32),
        }

    return batch_for


def _train_transformer(model, batch_for, train_steps: int, key, lr=4e-3):
    """Stage-2 masked-token training; returns (state, first_loss, last_loss)."""
    import jax

    from ..ops.sampling import cosine_schedule
    from ..training import trainer as T
    from ..training.optimizers import get_optimizer

    tx = get_optimizer("adamw", lr, max_grad_norm=1.0)
    state = T.create_train_state(model.params, tx)
    step_fn = T.make_uvit_train_step(model.module, tx, cosine_schedule,
                                     model.config.mask_token_id,
                                     codebook_size=64)
    names = list(COLORS)
    first_loss = last_loss = None
    for i in range(train_steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch_for(
            [names[j % 3] for j in range(i, i + 6)]), sub)
        if i == 0:
            first_loss = float(metrics["loss"])
        last_loss = float(metrics["loss"])
    return state, first_loss, last_loss


def _sample(model, vq, text_encoder, tokenizer, prompts, key,
            timesteps: int = 6, batch_size: int = 16) -> List[np.ndarray]:
    """Batched generation (fixed batch shapes -> one compiled program; the
    tail batch is padded and cropped) so n_eval >= 1000 runs are practical."""
    import jax
    import jax.numpy as jnp

    seq_len = (RESOLUTION // vq.config.reduction_factor) ** 2
    images: List[np.ndarray] = []
    for start in range(0, len(prompts), batch_size):
        chunk = prompts[start:start + batch_size]
        n = len(chunk)
        padded = chunk + [chunk[-1]] * (batch_size - n)
        ids = jnp.asarray(tokenizer(padded)["input_ids"])
        hs, _, pooled = text_encoder.encode(ids)
        micro = jnp.asarray([[RESOLUTION, RESOLUTION, 0, 0, 6.0]] * batch_size,
                            jnp.float32)
        tokens = model.generate2(
            hs[-2], pooled, micro,
            empty_embeds=hs[-2], empty_cond_embeds=pooled,
            timesteps=timesteps, guidance_scale=0.0, temperature=(1.0, 0.0),
            seq_len=seq_len, key=jax.random.fold_in(key, start))
        images.extend(np.asarray(vq.decode_code(tokens))[:n])
    return images


def run_quality_regression(train_steps: int = 200, vq_steps: int = 150,
                           n_eval: int = 30, seed: int = 0,
                           inception: bool = False,
                           log=print) -> Dict[str, float]:
    """Train tiny stack, generate, score.  Returns measured metrics."""
    import jax
    import jax.numpy as jnp

    from ..models.clip_text import CLIPTextEncoder, SimpleTokenizer
    from ..models.clip_vision import CLIPScorer, CLIPVisionEncoder
    from .clip_score import clip_score
    from .fid import CLIPFeatureExtractor, fid_between_image_sets

    rs = np.random.RandomState(seed)
    vq, text_encoder, tokenizer, model = _build_stack(seed)

    log("stage 1: training VQ tokenizer")
    recon_loss = _train_vq(vq, rs, vq_steps)
    log(f"  recon_loss={recon_loss:.4f}")

    names = list(COLORS)
    batch_for = _make_batch_fn(vq, text_encoder, tokenizer, rs)

    log("stage 2: training transformer")
    # deep-copy init weights BEFORE training: the fused step donates the
    # state buffers, and we sample the untrained baseline afterwards
    untrained_params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                              model.params)
    state, first_loss, last_loss = _train_transformer(
        model, batch_for, train_steps, jax.random.PRNGKey(seed))
    log(f"  loss {first_loss:.4f} -> {last_loss:.4f}")

    # held-out real set + prompts (balanced over colors)
    eval_colors = [names[i % 3] for i in range(n_eval)]
    prompts = [f"a {c} square" for c in eval_colors]
    real_images = list(make_square_images(eval_colors,
                                          np.random.RandomState(seed + 1)))

    log("stage 3: generating trained + untrained sets")
    gen_key = jax.random.PRNGKey(seed + 2)
    model.params = state.params
    model._jit_cache.clear()
    trained_images = _sample(model, vq, text_encoder, tokenizer, prompts,
                             gen_key)
    model.params = untrained_params
    model._jit_cache.clear()
    untrained_images = _sample(model, vq, text_encoder, tokenizer, prompts,
                               gen_key)
    model.params = state.params
    model._jit_cache.clear()

    log("stage 4: scoring (FID over seeded CLIP features + CLIP score)")
    extractor = CLIPFeatureExtractor.seeded(
        seed=1234, image_size=32, patch_size=8)
    fid_trained = fid_between_image_sets(real_images, trained_images,
                                         extractor)
    fid_untrained = fid_between_image_sets(real_images, untrained_images,
                                           extractor)
    acc_trained = color_accuracy(trained_images, prompts)
    acc_untrained = color_accuracy(untrained_images, prompts)

    scorer = CLIPScorer(
        CLIPVisionEncoder(hidden_size=64, intermediate_size=128,
                          num_hidden_layers=4, num_attention_heads=4,
                          image_size=32, patch_size=8, projection_dim=64,
                          seed=1234),
        CLIPTextEncoder(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        max_position_embeddings=8, projection_dim=64,
                        eos_token_id=63, seed=1234),
        SimpleTokenizer(64, 8))
    cs_trained = clip_score(scorer, trained_images, prompts)

    inception_metrics: Dict[str, float] = {}
    if inception:
        # same protocol through the InceptionV3 graph (seeded weights —
        # regression number; becomes published FID/ISC with real weights)
        log("stage 5: inception-graph scoring (seeded)")
        from .inception import InceptionFeatureExtractor
        from .inception_score import inception_score_from_logits

        inc = InceptionFeatureExtractor.seeded(seed=1234, batch_size=64)
        inception_metrics["fid_inception_seeded_trained"] = \
            fid_between_image_sets(real_images, trained_images, inc)
        inception_metrics["fid_inception_seeded_untrained"] = \
            fid_between_image_sets(real_images, untrained_images, inc)
        probs = inc.predict_proba(trained_images)
        isc_mean, isc_std = inception_score_from_logits(
            np.log(probs + 1e-20))
        inception_metrics["isc_seeded_trained"] = isc_mean
        inception_metrics["isc_seeded_trained_std"] = isc_std

    return {
        **inception_metrics,
        "vq_recon_loss": recon_loss,
        "train_loss_first": first_loss,
        "train_loss_last": last_loss,
        "fid_clipfeat_seeded_trained": fid_trained,
        "fid_clipfeat_seeded_untrained": fid_untrained,
        "color_accuracy_trained": acc_trained,
        "color_accuracy_untrained": acc_untrained,
        "clip_score_seeded_trained": cs_trained,
        "n_eval": float(n_eval),
        "train_steps": float(train_steps),
    }


def run_distill_regression(train_steps: int = 200, vq_steps: int = 150,
                           distill_steps: int = 120, n_eval: int = 30,
                           seed: int = 0, teacher_timesteps: int = 6,
                           step_ratio: int = 2, guidance_scale: float = 2.0,
                           distill_lr: float = 5e-4,
                           log=print) -> Dict[str, float]:
    """Measured step/guidance-distillation protocol (training/distill.py).

    Trains the tiny teacher, self-distills it (teacher_timesteps-step CFG
    trajectory folded into teacher_timesteps/step_ratio-step no-CFG student),
    then scores THREE decodes against the same held-out real set:

      teacher_full   teacher at teacher_timesteps (the quality target)
      teacher_k      teacher at the REDUCED step count (undistilled baseline
                     — what you'd get by just cutting steps)
      student_k      distilled student at the reduced count, no CFG

    The distillation claim is measured, not asserted: student_k should sit
    near teacher_full and at-or-above teacher_k at step_ratio x fewer model
    forwards (and no CFG batch-double on top when guidance_scale > 0).
    """
    import jax
    import jax.numpy as jnp

    from ..training import trainer as T
    from ..training.distill import make_distill_step
    from ..training.optimizers import get_optimizer
    from .fid import CLIPFeatureExtractor, fid_between_image_sets

    rs = np.random.RandomState(seed)
    vq, text_encoder, tokenizer, model = _build_stack(seed)

    log("stage 1: training VQ tokenizer")
    _train_vq(vq, rs, vq_steps)

    log("stage 2: training teacher")
    batch_for = _make_batch_fn(vq, text_encoder, tokenizer, rs)
    state, first_loss, last_loss = _train_transformer(
        model, batch_for, train_steps, jax.random.PRNGKey(seed))
    log(f"  teacher loss {first_loss:.4f} -> {last_loss:.4f}")
    teacher_params = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), state.params)

    log(f"stage 3: self-distilling {teacher_timesteps}-step cfg={guidance_scale} "
        f"teacher -> {teacher_timesteps // step_ratio}-step no-cfg student")
    names = list(COLORS)
    seq_len = (RESOLUTION // vq.config.reduction_factor) ** 2
    dtx = get_optimizer("adamw", distill_lr, max_grad_norm=1.0)
    dstate = T.create_train_state(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                               teacher_params), dtx)
    dstep = make_distill_step(
        model.module, dtx, mask_token_id=model.config.mask_token_id,
        teacher_timesteps=teacher_timesteps, step_ratio=step_ratio,
        guidance_scale=guidance_scale, temperature=(1.0, 0.0),
        seq_len=seq_len, ema_decay=None)
    empty_ids = jnp.asarray(tokenizer([""])["input_ids"])
    ehs_e, _, pooled_e = text_encoder.encode(empty_ids)
    key = jax.random.PRNGKey(seed + 3)
    dfirst = dlast = None
    for i in range(distill_steps):
        key, sub = jax.random.split(key)
        texts = [f"a {names[j % 3]} square" for j in range(i, i + 6)]
        ids = jnp.asarray(tokenizer(texts)["input_ids"])
        hs, _, pooled = text_encoder.encode(ids)
        batch = {"encoder_hidden_states": hs[-2], "cond_embeds": pooled,
                 "micro_conds": jnp.asarray(
                     [[RESOLUTION, RESOLUTION, 0, 0, 6.0]] * 6, jnp.float32),
                 "empty_embeds": ehs_e[-2], "empty_cond_embeds": pooled_e}
        dstate, metrics = dstep(dstate, teacher_params, batch, sub)
        if i == 0:
            dfirst = float(metrics["loss"])
        dlast = float(metrics["loss"])
    log(f"  distill loss {dfirst:.4f} -> {dlast:.4f}")

    log("stage 4: scoring teacher_full / teacher_k / student_k")
    eval_colors = [names[i % 3] for i in range(n_eval)]
    prompts = [f"a {c} square" for c in eval_colors]
    real_images = list(make_square_images(eval_colors,
                                          np.random.RandomState(seed + 1)))
    gen_key = jax.random.PRNGKey(seed + 2)
    k_steps = teacher_timesteps // step_ratio
    extractor = CLIPFeatureExtractor.seeded(
        seed=1234, image_size=32, patch_size=8)

    def score(params, timesteps, tag):
        model.params = params
        model._jit_cache.clear()
        images = _sample(model, vq, text_encoder, tokenizer, prompts,
                         gen_key, timesteps=timesteps)
        fid = fid_between_image_sets(real_images, images, extractor)
        acc = color_accuracy(images, prompts)
        log(f"  {tag}: steps={timesteps} fid={fid:.2f} acc={acc:.2f}")
        return fid, acc

    fid_tf, acc_tf = score(teacher_params, teacher_timesteps, "teacher_full")
    fid_tk, acc_tk = score(teacher_params, k_steps, "teacher_k")
    fid_sk, acc_sk = score(dstate.params, k_steps, "student_k")

    return {
        "teacher_timesteps": float(teacher_timesteps),
        "student_timesteps": float(k_steps),
        "guidance_scale": float(guidance_scale),
        "distill_loss_first": dfirst,
        "distill_loss_last": dlast,
        "fid_teacher_full": fid_tf, "color_accuracy_teacher_full": acc_tf,
        "fid_teacher_k": fid_tk, "color_accuracy_teacher_k": acc_tk,
        "fid_student_k": fid_sk, "color_accuracy_student_k": acc_sk,
        "n_eval": float(n_eval),
        "train_steps": float(train_steps),
        "distill_steps": float(distill_steps),
    }
