"""VQGAN tokenizer trainer CLI.

The reference left this as a one-line stub (training/train_vqgan.py:1); this
is a working implementation of the full taming-transformers recipe its
tokenizers were trained with (reference muse/modeling_taming_vqgan.py:512
lineage):

- reconstruction (L2 + L1) + VQ codebook/commitment losses with the
  straight-through estimator (ops/vq.py, return_loss=True)
- optional conv-feature perceptual term (ops/perceptual.py — LPIPS analog,
  seeded extractor offline, real VGG16 weights loadable)
- optional PatchGAN adversarial term (models/discriminator.py) with
  taming's adaptive generator weight ||grad(rec)||/||grad(gan)|| measured
  at the decoder's last conv kernel, hinge or vanilla loss, and a
  ``disc_start`` warmup gate

Both optional terms are config-gated (training.perceptual_weight,
training.disc_weight — 0 disables); the whole two-player step compiles to
ONE donated XLA program.

Run: python -m open_muse_tpu.training.train_vqgan config=configs/vqgan_gan.yaml
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..utils import logging as mlog
    from ..utils.config import flatten_config, load_config
    from ..utils.training_utils import AverageMeter, set_seed
    from . import trainer as T
    from .data import Text2ImageDataset
    from .lr_schedules import get_scheduler
    from .optimizers import get_optimizer
    from ..parallel.mesh import initialize_distributed
    from .train_muse import MetricsTracker, get_vq_model_class, save_image_grid

    # multi-host DCN bring-up (env-driven; no-op single-host)
    initialize_distributed()

    config = load_config(argv if argv is not None else sys.argv[1:])
    logger = mlog.get_logger(__name__)
    mlog.set_verbosity_for_process()
    is_main = jax.process_index() == 0
    key = set_seed(config.training.get("seed", 42))

    output_dir = config.experiment.output_dir
    os.makedirs(output_dir, exist_ok=True)
    tracker = MetricsTracker(output_dir, flatten_config(config), enabled=is_main)

    vq_class = get_vq_model_class(config.model.get("vq_model_type", "maskgit_vqgan"))
    vq_params_cfg = config.model.vq_model.get("params")
    model = vq_class(**(vq_params_cfg.to_dict() if vq_params_cfg is not None else {}))
    logger.info(f"vq params: {model.num_parameters() / 1e6:.1f}M")

    lr = config.optimizer.params.learning_rate
    schedule = get_scheduler(
        config.lr_scheduler.scheduler, base_lr=lr,
        num_warmup_steps=config.lr_scheduler.params.get("warmup_steps", 100),
        num_training_steps=config.training.max_train_steps)
    tx = get_optimizer(config.optimizer.get("name", "adamw"), schedule,
                       weight_decay=config.optimizer.params.get("weight_decay", 1e-4),
                       max_grad_norm=config.training.get("max_grad_norm"))
    state = T.create_train_state(model.params, tx)

    l1_weight = config.training.get("l1_weight", 1.0)
    l2_weight = config.training.get("l2_weight", 1.0)
    codebook_weight = config.training.get("codebook_weight", 1.0)
    perceptual_weight = config.training.get("perceptual_weight", 0.0)
    disc_weight = config.training.get("disc_weight", 0.0)
    disc_start = config.training.get("disc_start", 0)
    disc_loss_kind = config.training.get("disc_loss", "hinge")
    use_gan = disc_weight > 0.0

    perceptual_loss = None
    if perceptual_weight > 0.0:
        from ..ops.perceptual import make_perceptual_loss_fn

        perceptual_loss = make_perceptual_loss_fn(
            config.dataset.params.get("resolution", 256),
            seed=config.training.get("seed", 42))

    def _rec_terms(recon, pixels):
        l2 = jnp.mean(jnp.square(recon - pixels))
        l1 = jnp.mean(jnp.abs(recon - pixels))
        parts = {"l2": l2, "l1": l1}
        nll = l2_weight * l2 + l1_weight * l1
        if perceptual_loss is not None:
            p = perceptual_loss(recon, pixels)
            parts["perceptual"] = p
            nll = nll + perceptual_weight * p
        return nll, parts

    def loss_fn(params, pixels):
        recon, z_q, indices, vq_loss = model.module.apply(
            {"params": params}, pixels, True)
        nll, parts = _rec_terms(recon, pixels)
        loss = nll + codebook_weight * vq_loss
        return loss, {**parts, "vq_loss": vq_loss}

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, pixels):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, pixels)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **parts}
        return T.TrainState(step=state.step + 1, params=new_params,
                            opt_state=new_opt, ema_params=None), metrics

    disc_state = None
    if use_gan:
        from ..models.discriminator import (PatchDiscriminator,
                                            adaptive_disc_weight,
                                            generator_loss, hinge_d_loss,
                                            last_decoder_kernel_path,
                                            vanilla_d_loss)

        disc = PatchDiscriminator(
            base_channels=config.training.get("disc_channels", 64),
            n_layers=config.training.get("disc_layers", 3))
        res = config.dataset.params.get("resolution", 256)
        disc_params = disc.init(
            jax.random.PRNGKey(config.training.get("seed", 42) + 1),
            jnp.zeros((1, res, res, 3)))["params"]
        disc_tx = get_optimizer(
            config.optimizer.get("name", "adamw"), schedule,
            weight_decay=config.optimizer.params.get("weight_decay", 1e-4),
            max_grad_norm=config.training.get("max_grad_norm"))
        disc_state = T.create_train_state(disc_params, disc_tx)
        d_loss_fn = hinge_d_loss if disc_loss_kind == "hinge" else vanilla_d_loss
        last_path = last_decoder_kernel_path(model.params)
        if last_path is None:
            raise ValueError("could not locate decoder/conv_out kernel for "
                             "the adaptive disc weight")

        def _get(tree, path):
            for k in path:
                tree = tree[k]
            return tree

        def _set(tree, path, value):
            if not path:
                return value
            out = dict(tree)
            out[path[0]] = _set(tree[path[0]], path[1:], value)
            return out

        def gan_loss_fn(params, disc_params, pixels, d_w):
            recon, z_q, indices, vq_loss = model.module.apply(
                {"params": params}, pixels, True)
            nll, parts = _rec_terms(recon, pixels)
            logits_fake = disc.apply({"params": disc_params}, recon)
            g_loss = generator_loss(logits_fake, disc_loss_kind)
            loss = nll + codebook_weight * vq_loss + d_w * g_loss
            return loss, ({**parts, "vq_loss": vq_loss, "g_loss": g_loss},
                          recon)

        @partial(jax.jit, donate_argnums=(0, 1))
        def gan_train_step(state, disc_state, pixels):
            # taming's adopt_weight: adversarial terms off before disc_start
            disc_factor = jnp.where(state.step >= disc_start, 1.0, 0.0)

            # adaptive weight: both loss heads' grads w.r.t. the decoder's
            # last conv kernel via ONE extra forward + two thin vjp pulls
            kernel = _get(state.params, last_path)

            def heads(k):
                p2 = _set(state.params, last_path, k)
                recon, *_ = model.module.apply({"params": p2}, pixels, True)
                nll, _ = _rec_terms(recon, pixels)
                g = generator_loss(
                    disc.apply({"params": disc_state.params}, recon),
                    disc_loss_kind)
                return nll, g

            _, heads_vjp = jax.vjp(heads, kernel)
            (rec_grad,) = heads_vjp((jnp.float32(1.0), jnp.float32(0.0)))
            (gan_grad,) = heads_vjp((jnp.float32(0.0), jnp.float32(1.0)))
            d_w = adaptive_disc_weight(rec_grad, gan_grad, disc_weight)
            d_w = d_w * disc_factor

            (loss, (parts, recon)), grads = jax.value_and_grad(
                gan_loss_fn, has_aux=True)(state.params, disc_state.params,
                                           pixels, d_w)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = T.TrainState(step=state.step + 1, params=new_params,
                                     opt_state=new_opt, ema_params=None)

            # discriminator update on the SAME batch, generator detached
            recon = jax.lax.stop_gradient(recon)

            def disc_loss(dp):
                logits_real = disc.apply({"params": dp}, pixels)
                logits_fake = disc.apply({"params": dp}, recon)
                return (disc_factor * d_loss_fn(logits_real, logits_fake),
                        (jnp.mean(logits_real), jnp.mean(logits_fake)))

            (d_loss, (lr_mean, lf_mean)), d_grads = jax.value_and_grad(
                disc_loss, has_aux=True)(disc_state.params)
            d_updates, d_new_opt = disc_tx.update(
                d_grads, disc_state.opt_state, disc_state.params)
            new_disc = T.TrainState(
                step=disc_state.step + 1,
                params=optax.apply_updates(disc_state.params, d_updates),
                opt_state=d_new_opt, ema_params=None)
            metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                       "d_loss": d_loss, "d_weight": d_w,
                       "logits_real": lr_mean, "logits_fake": lf_mean,
                       **parts}
            return new_state, new_disc, metrics

    dataset = Text2ImageDataset(
        config.dataset.params.train_shards_path_or_url,
        batch_size=config.training.batch_size,
        resolution=config.dataset.params.get("resolution", 256),
        shuffle_buffer_size=config.dataset.params.get("shuffle_buffer_size", 1000),
        require_text=False, seed=config.training.get("seed", 42))

    max_steps = config.training.max_train_steps
    log_every = config.experiment.get("log_every", 50)
    save_every = config.experiment.get("save_every", 1000)
    generate_every = config.experiment.get("generate_every", 1000)

    global_step = 0
    batch_time = AverageMeter()
    data_iter = iter(dataset)
    end = time.time()
    cached = None
    while global_step < max_steps:
        try:
            batch = next(data_iter)
        except StopIteration:
            data_iter = iter(dataset)
            batch = next(data_iter)
        pixels = jnp.asarray(batch["pixel_values"])
        if use_gan:
            state, disc_state, metrics = gan_train_step(state, disc_state,
                                                        pixels)
        else:
            state, metrics = train_step(state, pixels)
        cached = pixels
        global_step += 1
        batch_time.update(time.time() - end)
        end = time.time()

        if global_step % log_every == 0 and is_main:
            m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
            tracker.log(m, global_step)
            logger.info(f"step {global_step}: loss={m['loss']:.4f} l2={m['l2']:.4f}")

        if global_step % generate_every == 0 and is_main and cached is not None:
            model.params = state.params
            recon, *_ = model(cached[:8])
            save_image_grid(np.asarray(jax.device_get(recon)),
                            os.path.join(output_dir, f"recon-{global_step}.png"))

        if global_step % save_every == 0:
            model.params = state.params
            T.save_checkpoint(output_dir, state, model=model,
                              checkpoints_total_limit=config.experiment.get(
                                  "checkpoints_total_limit"))
            if disc_state is not None:
                T.save_checkpoint(os.path.join(output_dir, "discriminator"),
                                  disc_state)

    model.params = state.params
    T.save_checkpoint(output_dir, state, model=model)
    if disc_state is not None:
        T.save_checkpoint(os.path.join(output_dir, "discriminator"),
                          disc_state)
    logger.info("training done")
    return state


if __name__ == "__main__":
    main()
