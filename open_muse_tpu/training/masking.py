"""Masking strategies for masked-token training (outside the model, so
strategies swap without touching modeling code — reference design note
README.md:139-141, implementation training/train_muse.py:145-226).

All strategies are fully vectorized/traceable (the reference's
contiguous-rectangle branch loops in Python per sample,
train_muse.py:180-199 — here it's one fused program).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["get_loss_weight", "mask_or_random_replace_tokens"]


def get_loss_weight(t, mask, min_val: float = 0.3):
    # reference train_muse.py:145-146
    return 1 - (1 - mask) * ((1 - t) * (1 - min_val))[:, None]


def mask_or_random_replace_tokens(
    key,
    image_tokens,
    mask_id: int,
    mask_schedule,
    *,
    min_masking_rate: float = 0.0,
    noise_type: str = "mask",             # "mask" | "random_replace"
    codebook_size: Optional[int] = None,  # needed for random_replace
    predict_all_tokens: bool = False,
    mask_contiguous_region_prob: Optional[float] = None,
    eval_mask_ratios=None,                # fixed ratios instead of sampling
    is_train: bool = True,
):
    """Returns (input_ids, labels, loss_weight, mask_prob).

    Reference: train_muse.py:149-226.  Timesteps are sampled per image, run
    through the mask schedule, clipped at ``min_masking_rate``; masked
    positions get ``mask_id`` (or random codebook tokens for
    ``random_replace``); labels are -100 outside the mask unless
    ``predict_all_tokens``.
    """
    batch_size, seq_len = image_tokens.shape
    key, t_key, mask_key, strat_key, noise_key = jax.random.split(key, 5)

    if not is_train and eval_mask_ratios is not None:
        ratios = jnp.asarray(eval_mask_ratios, dtype=jnp.float32)
        idx = jax.random.randint(t_key, (batch_size,), 0, len(ratios))
        mask_prob = ratios[idx]
    else:
        timesteps = jax.random.uniform(t_key, (batch_size,))
        mask_prob = mask_schedule(timesteps)
        mask_prob = jnp.clip(mask_prob, min=min_masking_rate)

    num_token_masked = jnp.clip(jnp.round(seq_len * mask_prob), min=1).astype(jnp.int32)

    # random-position mask: rank of a uniform permutation < num_masked
    # (reference batch_randperm trick, train_muse.py:173-174)
    randperm = jnp.argsort(
        jax.random.uniform(mask_key, (batch_size, seq_len)), axis=-1)
    rank = jnp.argsort(randperm, axis=-1)
    random_mask = rank < num_token_masked[:, None]

    if mask_contiguous_region_prob:
        # vectorized contiguous-rectangle masking (reference loops per sample,
        # train_muse.py:176-202)
        res = int(seq_len ** 0.5)
        kh, kw, ksh, ksw, kchoice = jax.random.split(strat_key, 5)
        n = num_token_masked
        lo = jnp.ceil(n / res).astype(jnp.int32)
        hi = jnp.minimum(res, n).astype(jnp.int32)
        u = jax.random.uniform(kh, (batch_size,))
        h = (lo + jnp.floor(u * (hi - lo + 1))).astype(jnp.int32)
        h = jnp.clip(h, 1, res)
        w = jnp.ceil(n / h).astype(jnp.int32)
        w = jnp.clip(w, 1, res)
        sh = jnp.floor(jax.random.uniform(ksh, (batch_size,)) * (res - h + 1)).astype(jnp.int32)
        sw = jnp.floor(jax.random.uniform(ksw, (batch_size,)) * (res - w + 1)).astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (batch_size, res, res), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (batch_size, res, res), 2)
        rect = ((rows >= sh[:, None, None]) & (rows < (sh + h)[:, None, None])
                & (cols >= sw[:, None, None]) & (cols < (sw + w)[:, None, None]))
        rect = rect.reshape(batch_size, seq_len)
        use_rect = jax.random.uniform(kchoice, ()) < mask_contiguous_region_prob
        mask = jnp.where(use_rect, rect, random_mask)
    else:
        mask = random_mask

    if noise_type == "mask":
        input_ids = jnp.where(mask, mask_id, image_tokens)
    elif noise_type == "random_replace":
        if codebook_size is None:
            raise ValueError("random_replace needs codebook_size")
        random_tokens = jax.random.randint(noise_key, image_tokens.shape, 0,
                                           codebook_size)
        input_ids = jnp.where(mask, random_tokens, image_tokens)
    else:
        raise ValueError(f"noise_type {noise_type} not supported")

    if predict_all_tokens or noise_type == "random_replace":
        labels = image_tokens
        loss_weight = get_loss_weight(mask_prob, mask.astype(jnp.float32))
    else:
        labels = jnp.where(mask, image_tokens, -100)
        loss_weight = None

    return input_ids, labels, loss_weight, mask_prob
