"""VQGAN tokenizer trainer CLI.

The reference left this as a one-line stub (training/train_vqgan.py:1); this
is a working implementation: reconstruction (L2 + L1) + VQ codebook/commitment
losses with the straight-through estimator already wired through
ops/vq.py (return_loss=True).  A GAN discriminator/perceptual loss can be
added on top; the MaskGIT paper's tokenizer quality is dominated by the
recon + codebook terms at this scale.

Run: python -m open_muse_tpu.training.train_vqgan config=configs/vqgan.yaml
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

    def loss_fn(params, pixels):
        recon, z_q, indices, vq_loss = model.module.apply(
            {"params": params}, pixels, True)
        l2 = jnp.mean(jnp.square(recon - pixels))
        l1 = jnp.mean(jnp.abs(recon - pixels))
        loss = l2_weight * l2 + l1_weight * l1 + codebook_weight * vq_loss
        return loss, {"l2": l2, "l1": l1, "vq_loss": vq_loss}

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, pixels):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, pixels)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **parts}
        return T.TrainState(step=state.step + 1, params=new_params,
                            opt_state=new_opt, ema_params=None), metrics

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

    model.params = state.params
    T.save_checkpoint(output_dir, state, model=model)
    logger.info("training done")
    return state


if __name__ == "__main__":
    main()
