"""Step + guidance distillation for MaskGIT decoding (beyond-parity).

The reference decodes in 12-18 steps with classifier-free guidance — every
step is TWO forwards (cond + uncond batch-doubled,
/root/reference/muse/modeling_transformer_v2.py:422-448).  This module trains
a student that folds both costs away:

* **step distillation** (progressive, two-steps-to-one in the spirit of
  Salimans & Ho '22 adapted to masked-token decoding): the student learns to
  predict, from the teacher's carry-in state at step ``t``, the tokens the
  teacher commits over the next ``step_ratio`` steps — so a K = N/step_ratio
  step decode lands where the teacher's N-step decode does.  MaskGIT's cosine
  schedule makes the state spaces line up exactly: the student's carry-in at
  its step k has mask ratio cosine(k/K) = cosine(step_ratio*k/N), the
  teacher's carry-in at step step_ratio*k (see
  models/transformer_v2.py::decode_schedules — one shared implementation).
* **guidance distillation**: the teacher trajectory is generated WITH CFG;
  the student forward is condition-only.  The student therefore bakes the
  guided distribution into its weights and decodes without the 2x
  batch-double — compounding with the step reduction (12-step CFG teacher
  -> 6-step no-CFG student is ~4x fewer model FLOPs).

No real images are consumed: distillation is self-supervised from prompts
(the teacher generates its own targets), so any caption source works —
including the reference's validation prompt files.

The teacher runs inside the SAME jitted program as the student update (one
XLA program per distill step; trajectory states are int32 so no gradient
flows into the teacher).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..ops import sampling
from .trainer import TrainState, _ema_decay

__all__ = ["make_distill_step", "distilled_generate", "main"]


def make_distill_step(
    student_module,
    tx,
    *,
    mask_token_id: int,
    teacher_module=None,
    teacher_timesteps: int = 12,
    step_ratio: int = 2,
    temperature: Any = 1.0,
    guidance_scale: float = 0.0,
    guidance_schedule: Optional[str] = None,
    noise_schedule=sampling.cosine_schedule,
    seq_len: int = 256,
    label_smoothing: float = 0.0,
    ema_decay: Optional[float] = 0.9999,
    max_grad_norm: Optional[float] = None,
    soft_weight: float = 0.0,
) -> Callable:
    """Build the jitted distillation step.

    ``soft_weight > 0`` adds a distribution-matching guidance-distillation
    term: KL(teacher_cfg || student) at the sampled trajectory state, where
    the target is the teacher's CFG-COMBINED logits (one extra teacher
    forward per step).  The hard two-step CE carries the step folding; the
    soft term carries the full guided distribution rather than one sample
    of it.  total = hard_CE + soft_weight * KL.

    Returned callable: ``distill_step(state, teacher_params, batch, key) ->
    (state, metrics)``.  ``teacher_params`` is a jit ARGUMENT (not a closure)
    so the weights are never baked into the HLO (remote-compile size limit,
    STATUS.md).  batch dict: encoder_hidden_states (B,T,D), cond_embeds
    (B,D'), micro_conds (B,5); plus empty_embeds (1,T,D) and
    empty_cond_embeds (1,D') when ``guidance_scale > 0``.

    Self-distillation is the default: pass the (pretrained) student's own
    params as ``teacher_params`` and leave ``teacher_module=None`` — but give
    the student state its OWN buffers (deep-copy one side): the step donates
    the student state while the teacher arrays stay live across steps.
    """
    from ..models.transformer_v2 import decode_schedules, parallel_decode_loop

    if teacher_timesteps % step_ratio != 0:
        raise ValueError(
            f"teacher_timesteps ({teacher_timesteps}) must be a multiple of "
            f"step_ratio ({step_ratio})")
    n_pairs = teacher_timesteps // step_ratio
    teacher_module = teacher_module or student_module
    teacher_cfg = teacher_module.config
    use_cfg = guidance_scale > 0

    # static per-step schedules, shared implementation with generate2
    temps, gscales, ratios = decode_schedules(
        teacher_timesteps, temperature, guidance_scale, guidance_schedule,
        noise_schedule)

    def loss_fn(params, state_in, target, soft_logits, ehs, cond, micro):
        # CE only at positions the student must fill (still-masked at t);
        # target values are what the teacher committed by t+step_ratio-1
        labels = jnp.where(state_in == mask_token_id, target, -100)
        logits, loss = student_module.apply(
            {"params": params}, state_in, ehs, cond, micro,
            labels=labels, label_smoothing=label_smoothing)
        soft_kl = jnp.zeros((), jnp.float32)
        if soft_logits is not None:
            # KL(teacher_cfg || student) over the codebook at masked positions
            logp_s = jax.nn.log_softmax(
                logits[..., : teacher_cfg.codebook_size].astype(jnp.float32))
            p_t = jax.nn.softmax(soft_logits)
            kl = jnp.sum(p_t * (jax.nn.log_softmax(soft_logits) - logp_s), -1)
            mask = (state_in == mask_token_id).astype(jnp.float32)
            soft_kl = jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            loss = loss + soft_weight * soft_kl
        return loss, soft_kl

    @partial(jax.jit, donate_argnums=(0,))
    def distill_step(state: TrainState, teacher_params, batch: Dict[str, Any],
                     key):
        ehs = batch["encoder_hidden_states"]
        cond = batch["cond_embeds"]
        micro = batch["micro_conds"]
        batch_size = ehs.shape[0]

        # ---- teacher trajectory (int32 outputs: no gradient path) ----
        if use_cfg:
            t_ehs = jnp.concatenate(
                [ehs, jnp.broadcast_to(batch["empty_embeds"], ehs.shape)], 0)
            t_cond = jnp.concatenate(
                [cond, jnp.broadcast_to(batch["empty_cond_embeds"],
                                        cond.shape)], 0)
            t_micro = jnp.concatenate([micro, micro], 0)
        else:
            t_ehs, t_cond, t_micro = ehs, cond, micro
        key, traj_key, t_key = jax.random.split(key, 3)
        input_ids = jnp.full((batch_size, seq_len), mask_token_id, jnp.int32)
        _, states, sampled = parallel_decode_loop(
            teacher_module.apply, teacher_cfg, teacher_params, input_ids,
            t_ehs, t_cond, t_micro, traj_key, temps, gscales, ratios,
            use_cfg=use_cfg, seq_len=seq_len, timesteps=teacher_timesteps,
            return_trajectory=True)

        # ---- per-example (state, target) pair at a random aligned step ----
        pair = jax.random.randint(t_key, (batch_size,), 0, n_pairs)
        t_in = pair * step_ratio                       # teacher carry-in index
        t_out = t_in + step_ratio - 1                  # committed grid index
        state_in = jnp.take_along_axis(states, t_in[None, :, None], axis=0)[0]
        target = jnp.take_along_axis(sampled, t_out[None, :, None], axis=0)[0]

        # ---- optional soft target: the teacher's CFG-combined distribution
        # at state_in (per-example guidance scale from the schedule at t) ----
        soft_logits = None
        if soft_weight > 0.0:
            t_input = (jnp.concatenate([state_in, state_in], 0) if use_cfg
                       else state_in)
            raw = teacher_module.apply({"params": teacher_params}, t_input,
                                       t_ehs, t_cond, t_micro)
            t_logits = raw[..., : teacher_cfg.codebook_size].astype(jnp.float32)
            if use_cfg:
                c_logits, u_logits = jnp.split(t_logits, 2, axis=0)
                gs = gscales[t_in][:, None, None]
                t_logits = u_logits + gs * (c_logits - u_logits)
            soft_logits = jax.lax.stop_gradient(t_logits)

        # ---- student update (condition-only forward: guidance distilled) ----
        (loss, soft_kl), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state_in, target, soft_logits, ehs, cond, micro)
        grad_norm = optax.global_norm(grads)
        if max_grad_norm is not None:
            scale = jnp.minimum(1.0, max_grad_norm / (grad_norm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None and ema_decay is not None:
            decay = _ema_decay(state.step, decay=ema_decay)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e - (1 - decay) * (e - p), new_ema, new_params)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "avg_masked_frac": jnp.mean(
                (state_in == mask_token_id).astype(jnp.float32)),
            "avg_pair_step": jnp.mean(t_in.astype(jnp.float32)),
        }
        if soft_weight > 0.0:
            metrics["soft_kl"] = soft_kl
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state, ema_params=new_ema), metrics

    return distill_step


def distilled_generate(model, encoder_hidden_states, cond_embeds, micro_conds,
                       *, teacher_timesteps: int = 12, step_ratio: int = 2,
                       temperature: Any = 1.0, seq_len: int = 256, key=None,
                       **kwargs):
    """Decode with a distilled student: N/step_ratio steps, NO CFG double.

    Thin convenience over ``generate2`` that derives the student's step count
    from the teacher schedule it was distilled against."""
    return model.generate2(
        encoder_hidden_states, cond_embeds, micro_conds,
        timesteps=teacher_timesteps // step_ratio, guidance_scale=0.0,
        temperature=temperature, seq_len=seq_len, key=key, **kwargs)


def _encode_prompts(text_encoder, tokenizer, prompts, chunk: int = 256):
    """Encode prompts (chunked: large caption files shouldn't build one huge
    text-encoder batch).  CLIP convention: penultimate hidden state + pooled
    (train_muse.py)."""
    ehs_parts, pooled_parts = [], []
    for start in range(0, len(prompts), chunk):
        ids = jnp.asarray(tokenizer(prompts[start:start + chunk],
                                    padding="max_length", truncation=True,
                                    max_length=tokenizer.model_max_length,
                                    return_tensors="np")["input_ids"])
        hs, _, pooled = text_encoder.encode(ids)
        ehs_parts.append(hs[-2] if len(hs) >= 2 else hs[-1])
        pooled_parts.append(pooled)
    return jnp.concatenate(ehs_parts, 0), jnp.concatenate(pooled_parts, 0)


def main(argv=None):
    """CLI: distill a pretrained MaskGiTUViT_v2 from a prompt file.

    Run: python -m open_muse_tpu.training.distill config=configs/distill.yaml
    """
    from ..models.clip_text import CLIPTextEncoder
    from ..models.transformer_v2 import MaskGiTUViT_v2
    from ..parallel.mesh import initialize_distributed
    from ..utils import logging as mlog
    from ..utils.config import flatten_config, load_config
    from ..utils.training_utils import set_seed
    from . import trainer as T
    from .lr_schedules import get_scheduler
    from .optimizers import get_optimizer
    from .train_muse import MetricsTracker

    initialize_distributed()
    config = load_config(argv if argv is not None else sys.argv[1:])
    logger = mlog.get_logger(__name__)
    mlog.set_verbosity_for_process()
    is_main = jax.process_index() == 0
    key = set_seed(config.training.get("seed", 42))

    output_dir = config.experiment.output_dir
    os.makedirs(output_dir, exist_ok=True)
    tracker = MetricsTracker(output_dir, flatten_config(config), enabled=is_main)

    dcfg = config.distill
    teacher_path = dcfg.teacher_checkpoint
    model = MaskGiTUViT_v2.from_pretrained(teacher_path)
    teacher_params = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), model.params)
    logger.info(f"student(=teacher init) params: "
                f"{model.num_parameters() / 1e6:.1f}M")

    te_cfg = config.model.text_encoder
    if te_cfg.get("pretrained"):
        text_encoder = CLIPTextEncoder.from_pretrained(te_cfg.pretrained)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(te_cfg.pretrained)
        except (ImportError, OSError, EnvironmentError, ValueError,
                KeyError) as e:
            # KeyError: AutoTokenizer resolves the dir's config.json to
            # CLIPTextConfig but finds no tokenizer entry for it (the staged
            # checkpoint carries weights only)
            # same loud fallback as PipelineMuse.from_pretrained: a staged
            # checkpoint dir carries weights but not tokenizer files, and
            # offline there is nothing to download.  Distillation is
            # self-supervised from prompts, so a deterministic hash
            # tokenizer still yields a valid (if semantically weaker)
            # conditioning signal — warn, never silently degrade.
            from ..models.clip_text import SimpleTokenizer
            logger.warning(
                f"no tokenizer files at {te_cfg.pretrained} ({e}); falling "
                "back to SimpleTokenizer — prompts hash-tokenized")
            tokenizer = SimpleTokenizer(
                vocab_size=text_encoder.config.vocab_size,
                model_max_length=text_encoder.config.max_position_embeddings)
    else:
        from ..models.clip_text import SimpleTokenizer
        text_encoder = CLIPTextEncoder(**te_cfg.params.to_dict())
        tokenizer = SimpleTokenizer(
            vocab_size=text_encoder.config.vocab_size,
            model_max_length=text_encoder.config.max_position_embeddings)

    with open(dcfg.prompts_file) as f:
        prompts = [line.strip() for line in f if line.strip()]
    logger.info(f"{len(prompts)} distillation prompts from {dcfg.prompts_file}")

    empty_embeds, empty_cond = _encode_prompts(text_encoder, tokenizer, [""])
    resolution = int(dcfg.get("resolution", 256))
    seq_len = int(dcfg.get("seq_len", (resolution // 16) ** 2))
    batch_size = int(config.training.batch_size)
    micro = jnp.asarray([[resolution, resolution, 0, 0, 6.0]] * batch_size,
                        jnp.float32)

    opt_cfg = config.optimizer.params
    schedule = get_scheduler(
        config.lr_scheduler.scheduler, base_lr=opt_cfg.learning_rate,
        num_warmup_steps=config.lr_scheduler.params.get("warmup_steps", 100),
        num_training_steps=config.training.max_train_steps)
    tx = get_optimizer(
        config.optimizer.get("name", "adamw"), schedule,
        beta1=opt_cfg.get("beta1", 0.9), beta2=opt_cfg.get("beta2", 0.999),
        weight_decay=opt_cfg.get("weight_decay", 0.01),
        epsilon=opt_cfg.get("epsilon", 1e-8))
    state = T.create_train_state(model.params, tx,
                                 with_ema=dcfg.get("use_ema", True))

    distill_step = make_distill_step(
        model.module, tx, mask_token_id=model.config.mask_token_id,
        teacher_timesteps=int(dcfg.get("teacher_timesteps", 12)),
        step_ratio=int(dcfg.get("step_ratio", 2)),
        temperature=dcfg.get("temperature", 1.0),
        guidance_scale=float(dcfg.get("guidance_scale", 8.0)),
        guidance_schedule=dcfg.get("guidance_schedule"),
        seq_len=seq_len,
        label_smoothing=float(config.training.get("label_smoothing", 0.0)),
        max_grad_norm=config.training.get("max_grad_norm"),
        soft_weight=float(dcfg.get("soft_weight", 0.0)))

    max_steps = int(config.training.max_train_steps)
    ckpt_every = int(config.experiment.get("save_every", 1000))
    log_every = int(config.experiment.get("log_every", 50))
    rs = np.random.RandomState(config.training.get("seed", 42))
    # the prompt list is fixed: encode every unique prompt ONCE and index
    # per step (text encoding would otherwise serialize with the distill
    # step 20k times over the same handful of strings)
    all_ehs, all_pooled = _encode_prompts(text_encoder, tokenizer, prompts)
    t0 = time.time()
    for step_i in range(max_steps):
        idx = rs.randint(0, len(prompts), size=batch_size)
        batch = {"encoder_hidden_states": all_ehs[idx],
                 "cond_embeds": all_pooled[idx],
                 "micro_conds": micro, "empty_embeds": empty_embeds,
                 "empty_cond_embeds": empty_cond}
        key, sub = jax.random.split(key)
        state, metrics = distill_step(state, teacher_params, batch, sub)
        if (step_i + 1) % log_every == 0 and is_main:
            m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
            m["steps_per_sec"] = (step_i + 1) / (time.time() - t0)
            tracker.log(m, step_i + 1)
            logger.info(f"step {step_i + 1}: loss={m['loss']:.4f} "
                        f"({m['steps_per_sec']:.2f} it/s)")
        if (step_i + 1) % ckpt_every == 0 or step_i + 1 == max_steps:
            T.save_checkpoint(output_dir, state, model=model)
    logger.info("distillation done")
    return state


if __name__ == "__main__":
    main()
