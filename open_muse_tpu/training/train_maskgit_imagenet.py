"""Class-conditional ImageNet MaskGIT trainer CLI.

Reference parity: training/train_maskgit_imagenet.py:139-612 — class id token
prepended after shifting by codebook size (:387-393), cosine-schedule masking,
the same loop/eval/generate/save skeleton, generation panels with 16 fixed
ImageNet classes (:542-580).

Run: python -m open_muse_tpu.training.train_maskgit_imagenet config=....yaml
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# generation panel classes (reference train_maskgit_imagenet.py:542-555)
IMAGENET_CLASS_IDS = [1, 7, 282, 604, 724, 179, 751, 404, 850, 283, 128, 204,
                      760, 611, 539, 319]


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    from ..models.transformer_v1 import MaskGitTransformer
    from ..ops.sampling import get_mask_schedule
    from ..parallel.mesh import create_mesh, initialize_distributed
    from ..utils import logging as mlog
    from ..utils.config import flatten_config, load_config
    from ..utils.training_utils import AverageMeter, set_seed
    from . import trainer as T
    from .data import ClassificationDataset
    from .lr_schedules import get_scheduler
    from .optimizers import get_optimizer
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
    vq_pretrained = config.model.vq_model.get("pretrained")
    if vq_pretrained and os.path.isdir(vq_pretrained):
        vq_model = vq_class.from_pretrained(vq_pretrained)
    else:
        vq_params = config.model.vq_model.get("params")
        vq_model = vq_class(**(vq_params.to_dict() if vq_params is not None else {}))

    model = MaskGitTransformer(**config.model.transformer.to_dict())
    mask_id = model.config.mask_token_id
    codebook_size = model.config.codebook_size
    logger.info(f"transformer params: {model.num_parameters() / 1e6:.1f}M")

    lr = config.optimizer.params.learning_rate
    schedule = get_scheduler(
        config.lr_scheduler.scheduler, base_lr=lr,
        num_warmup_steps=config.lr_scheduler.params.get("warmup_steps", 500),
        num_training_steps=config.training.max_train_steps)
    tx = get_optimizer(config.optimizer.get("name", "adamw"), schedule,
                       weight_decay=config.optimizer.params.get("weight_decay", 0.01),
                       max_grad_norm=config.training.get("max_grad_norm"))
    mesh = create_mesh() if len(jax.devices()) > 1 else None
    state = T.create_train_state(model.params, tx, mesh=mesh,
                                 with_ema=config.training.get("use_ema", False))
    train_step = T.make_maskgit_train_step(
        model.module, tx, get_mask_schedule(config.training.get("mask_schedule", "cosine")),
        mask_id, codebook_size=codebook_size,
        min_masking_rate=config.training.get("min_masking_rate", 0.0),
        label_smoothing=config.training.get("label_smoothing", 0.0))

    global_step = 0
    resume = config.experiment.get("resume_from_checkpoint")
    if resume:
        path = T.find_latest_checkpoint(output_dir) if resume == "latest" else resume
        if path:
            state = T.load_checkpoint(path, state)
            global_step = int(jax.device_get(state.step))
            logger.info(f"resumed from {path} at step {global_step}")

    dataset = ClassificationDataset(
        config.dataset.params.train_shards_path_or_url,
        batch_size=config.training.batch_size,
        resolution=config.dataset.params.get("resolution", 256),
        shuffle_buffer_size=config.dataset.params.get("shuffle_buffer_size", 1000),
        seed=config.training.get("seed", 42))

    max_steps = config.training.max_train_steps
    log_every = config.experiment.get("log_every", 50)
    save_every = config.experiment.get("save_every", 1000)
    generate_every = config.experiment.get("generate_every", 1000)

    batch_time = AverageMeter()
    data_iter = iter(dataset)
    end = time.time()
    while global_step < max_steps:
        try:
            batch = next(data_iter)
        except StopIteration:
            data_iter = iter(dataset)
            batch = next(data_iter)

        tokens = vq_model.get_code(jnp.asarray(batch["pixel_values"]))
        model_batch = {"image_tokens": tokens,
                       "class_ids": jnp.asarray(batch["class_ids"])}
        key, step_key = jrandom.split(key)
        state, metrics = train_step(state, model_batch, step_key)
        global_step += 1
        batch_time.update(time.time() - end)
        end = time.time()

        if global_step % log_every == 0 and is_main:
            m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
            m["samples/sec/host"] = config.training.batch_size / max(batch_time.avg, 1e-9)
            tracker.log(m, global_step)
            logger.info(f"step {global_step}: loss={m['loss']:.4f}")

        if global_step % generate_every == 0 and is_main:
            model.params = state.ema_params if state.ema_params is not None else state.params
            n_classes = model.config.num_classes or 1
            class_ids = jnp.asarray(
                [c % n_classes for c in IMAGENET_CLASS_IDS[:8]], dtype=jnp.int32)
            gen = model.generate2(class_ids=class_ids, timesteps=8,
                                  key=jrandom.fold_in(key, 1))
            images = vq_model.decode_code(gen)
            save_image_grid(np.asarray(jax.device_get(images)),
                            os.path.join(output_dir, f"samples-{global_step}.png"))

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
