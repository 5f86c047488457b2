"""Text2image trainer CLI (the reference's training/train_muse.py, TPU-native).

Run:  python -m open_muse_tpu.training.train_muse config=configs/xxx.yaml a.b=1

Flow (reference train_muse.py:248-939): config merge -> models (text encoder /
VQ skipped entirely in pre_encode mode, :329-356) -> optimizer + lr schedule +
EMA -> dataset -> resume -> loop { encode frozen VQ+text, mask, fused train
step, log, eval, generate, checkpoint }.

TPU specifics: GSPMD mesh replaces accelerate DDP; the masking + forward +
backward + update + EMA is ONE donated jitted program; metrics stream to a
JSONL tracker (wandb attaches automatically when available); process-0 gating
replaces accelerate is_main_process.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def get_vq_model_class(model_type: str):
    # reference train_muse.py:112-123
    from ..models.maskgit_vqgan import MaskGitVQGAN
    from ..models.movq import MOVQ
    from ..models.paella_vq import PaellaVQModel
    from ..models.taming_vqgan import VQGANModel

    return {
        "vqgan": VQGANModel,
        "maskgit_vqgan": MaskGitVQGAN,
        "movq": MOVQ,
        "paella_vq": PaellaVQModel,
    }[model_type]


class MetricsTracker:
    """JSONL metrics log + optional wandb (reference logs through
    accelerate->wandb, train_muse.py:291-312)."""

    def __init__(self, output_dir: str, config=None, enabled: bool = True):
        self.enabled = enabled
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._wandb = None
        if enabled:
            os.makedirs(output_dir, exist_ok=True)
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=(config or {}).get("project", "muse-tpu"),
                           config=config)
            except Exception:
                self._wandb = None

    def log(self, values: dict, step: int):
        if not self.enabled:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, **{k: float(v) if hasattr(v, "__float__")
                                                 else v for k, v in values.items()}}) + "\n")
        if self._wandb is not None:
            self._wandb.log(values, step=step)


def save_image_grid(images, path: str):
    """NHWC float images -> one PNG grid (replaces wandb image panels)."""
    from PIL import Image

    images = np.clip(np.asarray(images, dtype=np.float32), 0, 1)
    n, h, w, c = images.shape
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), dtype=np.float32)
    for i, img in enumerate(images):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


def load_inpainting_validation_data(directory: str, image_size: int,
                                    latent_side: int):
    """Folders of image+mask where the folder NAME is the prompt
    (reference train_muse.py:1220-1262)."""
    from PIL import Image

    entries = []
    for prompt_dir in sorted(os.listdir(directory)):
        full = os.path.join(directory, prompt_dir)
        if not os.path.isdir(full):
            continue
        files = os.listdir(full)
        img_file = next((f for f in files if "mask" not in f.lower()
                         and f.lower().endswith((".png", ".jpg", ".jpeg"))), None)
        mask_file = next((f for f in files if "mask" in f.lower()), None)
        if not img_file or not mask_file:
            continue
        image = Image.open(os.path.join(full, img_file)).convert("RGB") \
            .resize((image_size, image_size))
        mask = Image.open(os.path.join(full, mask_file)).convert("L") \
            .resize((latent_side, latent_side))
        entries.append({
            "prompt": prompt_dir.replace("_", " "),
            "image": np.asarray(image, dtype=np.float32) / 255.0,
            "mask": np.asarray(mask) > 127,
        })
    return entries


def generate_inpainting_images(model, vq_model, entries, encode_text, mask_id,
                               micro_conds, empty_embeds, empty_cond_embeds,
                               out_path, key):
    """In-training inpainting panels (reference train_muse.py:1120-1215)."""
    import jax
    import jax.numpy as jnp

    panels = []
    for i, entry in enumerate(entries):
        pixels = jnp.asarray(entry["image"])[None]
        _, tokens = vq_model.encode(pixels)
        mask = jnp.asarray(entry["mask"].reshape(1, -1))
        tokens = jnp.where(mask, mask_id, tokens)
        ehs, pooled = encode_text([entry["prompt"]])
        gen = model.generate2(
            ehs, pooled, micro_conds, empty_embeds=empty_embeds,
            empty_cond_embeds=empty_cond_embeds, input_ids=tokens,
            timesteps=8, guidance_scale=8.0, seq_len=int(tokens.shape[1]),
            key=jax.random.fold_in(key, i))
        panels.append(np.asarray(jax.device_get(vq_model.decode_code(gen)))[0])
    if panels and out_path is not None:
        save_image_grid(np.stack(panels), out_path)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..models.clip_text import CLIPTextEncoder
    from ..models.transformer_v2 import MaskGiTUViT_v2
    from ..ops.sampling import get_mask_schedule
    from ..parallel.mesh import (create_mesh, initialize_distributed,
                                 local_batch_slice, put_batch)
    from ..utils import logging as mlog
    from ..utils.config import flatten_config, load_config
    from ..utils.training_utils import AverageMeter, set_seed
    from . import trainer as T
    from .data import Text2ImageDataset, WebdatasetSelect
    from .lr_schedules import get_scheduler
    from .optimizers import get_optimizer

    # multi-host DCN bring-up BEFORE any jax device query (env-driven; no-op
    # single-host) — the analog of accelerate's torchrun rendezvous
    initialize_distributed()

    config = load_config(argv if argv is not None else sys.argv[1:])
    logger = mlog.get_logger(__name__)
    mlog.set_verbosity_for_process()
    is_main = jax.process_index() == 0
    if jax.process_count() > 1:
        logger.info(f"multihost: process {jax.process_index()} of "
                    f"{jax.process_count()}, {jax.local_device_count()} local "
                    f"/ {jax.device_count()} global devices")

    seed = config.training.get("seed", 42)
    rng_key = set_seed(seed)

    output_dir = config.experiment.output_dir
    os.makedirs(output_dir, exist_ok=True)
    if is_main:
        with open(os.path.join(output_dir, "config.yaml"), "w") as f:
            import yaml

            yaml.safe_dump(config.to_dict(), f)
    tracker = MetricsTracker(output_dir, flatten_config(config), enabled=is_main)

    # -- models ---------------------------------------------------------------
    pre_encode = config.training.get("pre_encode", False)
    text_encoder = vq_model = None
    tokenizer = None
    if not pre_encode:
        te_cfg = config.model.get("text_encoder")
        te_path = te_cfg.get("pretrained") if te_cfg is not None else None
        # clip (default) vs t5 towers (reference config text_encoder.type,
        # e.g. configs/cc12m_uvit.yaml uses t5-v1_1-large-enc)
        te_type = (te_cfg.get("type", "clip") if te_cfg is not None else "clip")
        if te_type == "t5":
            from ..models.t5_text import T5TextEncoder as _TextCls
        else:
            _TextCls = CLIPTextEncoder
        if te_path and os.path.isdir(te_path):
            text_encoder = _TextCls.from_pretrained(te_path)
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(te_path)
            except Exception:
                tokenizer = None
        elif te_cfg is not None and te_cfg.get("params") is not None:
            # fresh text tower for offline/smoke runs
            text_encoder = _TextCls(**te_cfg.params.to_dict())
        if text_encoder is not None and tokenizer is None:
            from ..models.clip_text import SimpleTokenizer

            tokenizer = SimpleTokenizer(
                vocab_size=text_encoder.config.vocab_size,
                model_max_length=text_encoder.config.max_position_embeddings)
        vq_class = get_vq_model_class(config.model.get("vq_model_type", "maskgit_vqgan"))
        vq_pretrained = config.model.vq_model.get("pretrained")
        if vq_pretrained and os.path.isdir(vq_pretrained):
            vq_model = vq_class.from_pretrained(vq_pretrained)
        else:
            vq_params = config.model.vq_model.get("params")
            vq_model = vq_class(**(vq_params.to_dict() if vq_params is not None else {}))

    tcfg = config.model.transformer.to_dict()
    dtype = jnp.bfloat16 if config.training.get("mixed_precision") == "bf16" else jnp.float32
    # architecture dispatch (reference train_muse.py:358: 'transformer' = v1
    # MaskGitTransformer, 'uvit' = MaskGiTUViT_v2; we default to the v2
    # flagship rather than the reference's v1 default)
    architecture = config.model.get("architecture", "uvit")
    is_v1 = architecture == "transformer"
    if is_v1:
        from ..models.transformer_v1 import MaskGitTransformer

        model = MaskGitTransformer(**tcfg, dtype=dtype)
    else:
        # gradient_checkpointing: false | true (full remat) | 'dots'
        # (save matmul outputs, recompute only elementwise)
        gc = config.model.get("gradient_checkpointing", False)
        model = MaskGiTUViT_v2(
            **tcfg, dtype=dtype, remat=gc if isinstance(gc, str) else bool(gc))
    mask_id = model.config.mask_token_id
    logger.info(f"transformer params: {model.num_parameters() / 1e6:.1f}M")

    # -- optimizer / schedule / mesh -------------------------------------------
    opt_cfg = config.optimizer.params
    lr = opt_cfg.learning_rate
    if opt_cfg.get("scale_lr", False):
        lr = lr * config.training.batch_size * jax.process_count()
    schedule = get_scheduler(
        config.lr_scheduler.scheduler, base_lr=lr,
        num_warmup_steps=config.lr_scheduler.params.get("warmup_steps", 500),
        num_training_steps=config.training.get("max_train_steps", 1000000))
    accum = config.training.get("gradient_accumulation_steps", 1)
    tx = get_optimizer(
        config.optimizer.get("name", "adamw"), schedule,
        beta1=opt_cfg.get("beta1", 0.9), beta2=opt_cfg.get("beta2", 0.999),
        weight_decay=opt_cfg.get("weight_decay", 0.01),
        epsilon=opt_cfg.get("epsilon", 1e-8),
        max_grad_norm=config.training.get("max_grad_norm"))
    if accum > 1:
        import optax

        tx = optax.MultiSteps(tx, accum)

    # GSPMD mesh over ALL devices (replaces accelerate DDP); batches are
    # dp/fsdp-sharded below via put_batch, params/opt-state via partition rules
    mesh = create_mesh(fsdp=config.training.get("fsdp", 1),
                       tp=config.training.get("tp", 1))
    n_batch_shards = mesh.shape["dp"] * mesh.shape["fsdp"]
    if config.training.batch_size % n_batch_shards:
        raise ValueError(
            f"training.batch_size={config.training.batch_size} must be "
            f"divisible by dp*fsdp={n_batch_shards} (global batch is sharded "
            f"over those mesh axes)")
    state = T.create_train_state(model.params, tx, mesh=mesh,
                                 with_ema=config.training.get("use_ema", False))

    mask_schedule = get_mask_schedule(config.training.get("mask_schedule", "cosine"))
    if is_v1:
        train_step = T.make_v1_text2image_train_step(
            model.module, tx, mask_schedule, mask_id,
            codebook_size=model.config.codebook_size,
            min_masking_rate=config.training.get("min_masking_rate", 0.0),
            label_smoothing=config.training.get("label_smoothing", 0.0),
            cond_dropout_prob=config.training.get("cond_dropout_prob", 0.0),
            ema_decay=0.9999 if config.training.get("use_ema", False) else None,
            max_grad_norm=None)
        eval_step = None  # v1 eval = loss trends + sample panels
    else:
        train_step = T.make_uvit_train_step(
            model.module, tx, mask_schedule, mask_id,
            codebook_size=model.config.codebook_size,
            min_masking_rate=config.training.get("min_masking_rate", 0.0),
            noise_type=config.training.get("noise_type", "mask"),
            predict_all_tokens=config.training.get("predict_all_tokens", False),
            mask_contiguous_region_prob=config.training.get("mask_contiguous_region_prob"),
            label_smoothing=config.training.get("label_smoothing", 0.0),
            cond_dropout_prob=config.training.get("cond_dropout_prob", 0.0),
            max_grad_norm=None,  # clipping lives in the optimizer chain above
            with_diagnostics=bool(config.experiment.get("log_entropy_buckets", False)),
            with_param_grad_norms=bool(config.experiment.get("log_grad_norm_every")),
            use_soft_targets=bool(config.training.get("use_soft_code_target", False)))
        eval_step = T.make_uvit_eval_step(
            model.module, mask_schedule, mask_id,
            eval_mask_ratios=tuple(config.training.get("eval_mask_ratios",
                                                       (0.1, 0.3, 0.5, 0.7, 0.9))),
            label_smoothing=config.training.get("label_smoothing", 0.0))
    grad_norm_names = T.grad_norm_param_names(state.params)

    # -- resume -----------------------------------------------------------------
    global_step = 0
    resume = config.experiment.get("resume_from_checkpoint")
    if resume:
        path = (T.find_latest_checkpoint(output_dir) if resume == "latest" else resume)
        if path:
            state = T.load_checkpoint(path, state)
            global_step = int(jax.device_get(state.step))
            logger.info(f"resumed from {path} at step {global_step}")

    # -- frozen encoders (jitted once) -------------------------------------------
    empty_embeds = empty_cond_embeds = None
    if text_encoder is not None and tokenizer is not None:
        empty_ids = jnp.asarray(tokenizer([""], padding="max_length", truncation=True,
                                          max_length=tokenizer.model_max_length,
                                          return_tensors="np")["input_ids"])
        hs, _, pooled = text_encoder.encode(empty_ids)
        # CLIP: penultimate hidden state + pooled; T5: final state, no pooled
        empty_embeds = hs[-2] if len(hs) >= 2 else hs[-1]
        empty_cond_embeds = pooled
        if pooled is None and not is_v1:
            empty_cond_embeds = jnp.zeros(
                (1, model.config.cond_embed_dim), dtype=jnp.float32)

    warned_missing_pooled = []

    def prepare_batch(batch, key, place=True):
        """pixels/text -> tokens/embeds (reference prepare_inputs_and_labels,
        train_muse.py:612-683; masking happens inside the train step).  The
        returned dict is placed on the mesh with the batch dim sharded over
        ('dp','fsdp') — GSPMD inserts the grad all-reduce."""
        out = {}
        if pre_encode:
            # pre-encoded shard dialects (reference training/data.py:561-573
            # renames checkpoint-named .pth members; scripts/pre_encode.py
            # writes vq_f16/vq_f8 + clip_penultimate/clip_pooled .npy members)
            def first_of(*names):
                for n in names:
                    if n in batch:
                        return batch[n]
                return None

            vq_key = config.training.get("pre_encode_vq", "f16")
            tokens = first_of("image_tokens", "image_input_ids",
                              f"vq_{vq_key}.npy", "vq_f16.npy", "vq_f8.npy")
            ehs = first_of("encoder_hidden_states", "clip_penultimate.npy")
            if tokens is None or ehs is None:
                raise KeyError(
                    f"pre-encoded batch lacks image tokens / text embeds; "
                    f"members present: {sorted(batch)}")
            out["image_tokens"] = jnp.asarray(np.asarray(tokens), dtype=jnp.int32)
            out["encoder_hidden_states"] = jnp.asarray(
                np.asarray(ehs, dtype=np.float32))
            pooled = first_of("cond_embeds", "clip_pooled.npy")
            if pooled is None:
                # reference pre-encoded recipes train without pooled cond
                # embeds (train_muse.py:689-690); the v2 model still takes
                # the input, so feed zeros and say so once
                if not warned_missing_pooled:
                    warned_missing_pooled.append(True)
                    logger.warning("pre-encoded shards carry no pooled text "
                                   "embedding; feeding zero cond_embeds")
                pooled = np.zeros(
                    (out["image_tokens"].shape[0], model.config.cond_embed_dim),
                    dtype=np.float32)
            out["cond_embeds"] = jnp.asarray(np.asarray(pooled, dtype=np.float32))
        else:
            pixels = jnp.asarray(batch["pixel_values"])
            if config.training.get("use_soft_code_target", False):
                # soft VQ targets (reference train_muse.py:622-628)
                soft_targets, tokens = vq_model.get_soft_code(
                    pixels, temp=config.training.get("soft_code_temp", 1.0),
                    stochastic=config.training.get("use_stochastic_code", False),
                    key=key)
                out["soft_targets"] = soft_targets
                out["image_tokens"] = tokens
            else:
                out["image_tokens"] = vq_model.get_code(pixels)
            ids = jnp.asarray(tokenizer(batch["input_text"], padding="max_length",
                                        truncation=True,
                                        max_length=tokenizer.model_max_length,
                                        return_tensors="np")["input_ids"])
            hs, _, pooled = text_encoder.encode(ids)
            out["encoder_hidden_states"] = hs[-2] if len(hs) >= 2 else hs[-1]
            if pooled is None and not is_v1:
                # T5 has no pooled output; models trained with it set
                # add_cond_embeds false and the zeros input is ignored
                pooled = jnp.zeros((ids.shape[0], model.config.cond_embed_dim),
                                   dtype=jnp.float32)
            out["cond_embeds"] = pooled
        if is_v1:
            # v1 conditions through cross-attention alone: no pooled/micro
            out.pop("cond_embeds", None)
            return put_batch(out, mesh) if place else out
        n = len(out["image_tokens"])
        aes = batch.get("aesthetic_scores")
        micro = np.concatenate([
            batch.get("orig_sizes", np.full((n, 2), 512.0)),
            batch.get("crop_coords", np.zeros((n, 2))),
            np.full((n, 1), 6.0) if aes is None
            else np.asarray(aes, dtype=np.float32).reshape(n, 1),
        ], axis=1)
        out["micro_conds"] = jnp.asarray(micro, dtype=jnp.float32)
        if empty_embeds is not None:
            out["empty_embeds"] = empty_embeds
            out["empty_cond_embeds"] = empty_cond_embeds
        return put_batch(out, mesh) if place else out

    # -- data ---------------------------------------------------------------------
    ds_params = config.dataset.params
    select = None
    if config.dataset.get("quality_filter"):
        select = WebdatasetSelect(**config.dataset.quality_filter.to_dict())
    # accelerate split_batches=True semantics (reference train_muse.py:266):
    # config batch_size is the GLOBAL batch; each host loads its slice and
    # put_batch assembles the global dp-sharded array
    sl = local_batch_slice(config.training.batch_size)
    local_batch_size = sl.stop - sl.start
    dataset = Text2ImageDataset(
        ds_params.train_shards_path_or_url,
        batch_size=local_batch_size,
        resolution=ds_params.get("resolution", 256),
        shuffle_buffer_size=ds_params.get("shuffle_buffer_size", 1000),
        pre_encode=pre_encode, select=select, seed=seed,
        dataset_map=ds_params.get("dataset_map"),
        vae_checkpoint=ds_params.get("vae_checkpoint"),
        text_encoder_checkpoint=ds_params.get("text_encoder_checkpoint"),
        center_crop=config.dataset.get("preprocessing", {}) and
        config.dataset.preprocessing.get("center_crop", False))

    eval_dataset = None
    eval_shards = ds_params.get("eval_shards_path_or_url")
    if eval_shards:
        eval_dataset = Text2ImageDataset(
            eval_shards, batch_size=local_batch_size,
            resolution=ds_params.get("resolution", 256),
            shuffle_buffer_size=64, pre_encode=pre_encode, resample=False,
            seed=seed + 7, center_crop=True)

    # -- loop -----------------------------------------------------------------------
    import jax.random as jrandom

    max_steps = config.training.max_train_steps
    log_every = config.experiment.get("log_every", 50)
    save_every = config.experiment.get("save_every", 1000)
    generate_every = config.experiment.get("generate_every", 1000)
    eval_every = config.experiment.get("eval_every")
    log_grad_norm_every = config.experiment.get("log_grad_norm_every")
    overfit = config.training.get("overfit_one_batch", False)

    # jax.profiler trace window (reference had no profiler integration,
    # SURVEY.md §5.1; experiment.profile_steps: [start, stop])
    profile_steps = config.experiment.get("profile_steps")

    batch_time, data_time = AverageMeter(), AverageMeter()
    key = rng_key
    end = time.time()
    data_iter = iter(dataset)
    cached_batch = None
    logger.info("starting training loop")
    while global_step < max_steps:
        if overfit and cached_batch is not None:
            batch = cached_batch
        else:
            try:
                batch = next(data_iter)
            except StopIteration:
                data_iter = iter(dataset)
                batch = next(data_iter)
            cached_batch = batch
        data_time.update(time.time() - end)

        if profile_steps and global_step + 1 == int(profile_steps[0]):
            jax.profiler.start_trace(os.path.join(output_dir, "profile"))

        key, step_key, prep_key = jrandom.split(key, 3)
        model_batch = prepare_batch(batch, prep_key)
        state, metrics = train_step(state, model_batch, step_key)
        global_step += 1
        batch_time.update(time.time() - end)
        end = time.time()

        if profile_steps and global_step == int(profile_steps[1]):
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            logger.info(f"wrote profiler trace to {output_dir}/profile")

        if global_step % log_every == 0 and is_main:
            m = {}
            for k, v in metrics.items():
                if k == "param_grad_norms":
                    continue  # logged on its own cadence below
                v = jax.device_get(v)
                if k == "token_prob_deciles_by_bucket":
                    m[k] = [[round(float(x), 4) for x in row]
                            for row in np.asarray(v)]
                elif hasattr(v, "ndim") and v.ndim > 0:
                    m[k] = [round(float(x), 4) for x in np.asarray(v)]
                else:
                    m[k] = float(v)
            m.update({
                "lr": float(schedule(jnp.asarray(global_step))),
                "samples/sec/host": local_batch_size / max(batch_time.avg, 1e-9),
                "data_time": data_time.avg,
                "batch_time": batch_time.avg,
            })
            tracker.log(m, global_step)
            logger.info(f"step {global_step}: loss={m['loss']:.4f} "
                        f"({m['samples/sec/host']:.1f} samples/s)")

        if log_grad_norm_every and global_step % log_grad_norm_every == 0 \
                and "param_grad_norms" in metrics and is_main:
            # reference logs every parameter's grad norm
            # (train_muse.py:1309-1314)
            norms = np.asarray(jax.device_get(metrics["param_grad_norms"]))
            tracker.log({f"grad_norm/{n}": float(v)
                         for n, v in zip(grad_norm_names, norms)}, global_step)

        # NOTE: eval + generation run on EVERY process — the jitted calls
        # contain collectives, so gating them on is_main would deadlock a
        # multi-host pod (VERDICT weak #2); only host I/O is process-0-only.
        if eval_every and eval_dataset is not None and eval_step is not None \
                and global_step % eval_every == 0:
            # Buffer host-local eval batches first, then agree on a COMMON
            # count across hosts (min) before making any collective call —
            # uneven eval-shard splits would otherwise deadlock the pod
            # (some processes calling put_batch/eval_step more times than
            # others).  Single-host: min over one value is a no-op.
            max_eval = config.experiment.get("max_eval_batches", 8)
            buffered = []
            for eval_batch in eval_dataset:
                buffered.append(eval_batch)
                if len(buffered) >= max_eval:
                    break
            n_eval = len(buffered)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                counts = multihost_utils.process_allgather(
                    np.asarray(n_eval, dtype=np.int32))
                n_eval = int(np.min(counts))
            losses = []
            for i in range(n_eval):
                eb = prepare_batch(buffered[i], jrandom.fold_in(key, 999 + i))
                losses.append(float(jax.device_get(
                    eval_step(state.params, eb, jrandom.fold_in(key, i)))))
            if losses and is_main:
                tracker.log({"eval_loss": float(np.mean(losses))}, global_step)
                logger.info(f"step {global_step}: eval_loss={np.mean(losses):.4f}")

        if global_step % generate_every == 0 and vq_model is not None:
            model.params = state.ema_params if state.ema_params is not None else state.params
            # host-local (unsharded) inputs: the frozen encoders run per-host;
            # every process generates, process 0 writes the PNG
            n_gen = min(4, local_batch_size)

            def take(v, n=n_gen):
                return v[:n] if hasattr(v, "__getitem__") else v

            gen_batch = prepare_batch({k: take(v) for k, v in batch.items()},
                                      jrandom.fold_in(key, 3), place=False)
            if is_v1:
                tokens = model.generate2(
                    encoder_hidden_states=gen_batch["encoder_hidden_states"],
                    timesteps=12, guidance_scale=8.0,
                    key=jrandom.fold_in(key, 1))
            else:
                tokens = model.generate2(
                    gen_batch["encoder_hidden_states"], gen_batch["cond_embeds"],
                    gen_batch["micro_conds"],
                    empty_embeds=empty_embeds, empty_cond_embeds=empty_cond_embeds,
                    timesteps=12, guidance_scale=8.0,
                    seq_len=int(gen_batch["image_tokens"].shape[1]),
                    key=jrandom.fold_in(key, 1))
            images = vq_model.decode_code(tokens)
            if is_main:
                save_image_grid(np.asarray(jax.device_get(images)),
                                os.path.join(output_dir, f"samples-{global_step}.png"))

            inpaint_dir = config.experiment.get("inpainting_validation_dir")
            if inpaint_dir and text_encoder is not None and not is_v1:
                latent_side = int(gen_batch["image_tokens"].shape[1] ** 0.5)
                entries = load_inpainting_validation_data(
                    inpaint_dir, config.dataset.params.get("resolution", 256),
                    latent_side)

                def encode_text(texts):
                    ids = jnp.asarray(tokenizer(texts, padding="max_length",
                                                truncation=True,
                                                max_length=tokenizer.model_max_length,
                                                return_tensors="np")["input_ids"])
                    hs, _, pooled = text_encoder.encode(ids)
                    return hs[-2], pooled

                generate_inpainting_images(
                    model, vq_model, entries, encode_text, mask_id,
                    gen_batch["micro_conds"][:1], empty_embeds,
                    empty_cond_embeds,
                    os.path.join(output_dir, f"inpainting-{global_step}.png")
                    if is_main else None,
                    jrandom.fold_in(key, 2))

        if global_step % save_every == 0:
            model.params = state.params
            T.save_checkpoint(
                output_dir, state, model=model,
                checkpoints_total_limit=config.experiment.get("checkpoints_total_limit"))

    model.params = state.params
    T.save_checkpoint(output_dir, state, model=model)
    logger.info("training done")
    return state


if __name__ == "__main__":
    main()
