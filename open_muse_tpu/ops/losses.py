"""Loss functions for masked-token training.

Reference parity: ``F.cross_entropy(..., ignore_index=-100, label_smoothing)``
(muse/modeling_transformer.py:1277-1280, modeling_transformer_v2.py:305-317)
and ``soft_target_cross_entropy`` (training/train_muse.py:126-142).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy_loss", "weighted_cross_entropy_loss", "soft_target_cross_entropy"]

IGNORE_INDEX = -100


def _per_token_ce(logits, labels, label_smoothing: float = 0.0):
    """Per-token CE with torch label-smoothing semantics; labels == -100 are
    zeroed and excluded by callers via the returned valid mask."""
    vocab = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(log_probs, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.where(valid, nll, 0.0), valid


def cross_entropy_loss(logits, labels, label_smoothing: float = 0.0):
    """Mean CE over non-ignored tokens (torch ``reduction='mean'`` with
    ``ignore_index=-100``)."""
    nll, valid = _per_token_ce(logits.reshape(-1, logits.shape[-1]),
                               labels.reshape(-1), label_smoothing)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def weighted_cross_entropy_loss(logits, labels, loss_weight, label_smoothing: float = 0.0):
    """Reference v2 loss weighting (modeling_transformer_v2.py:305-317):
    per-token CE * weight, normalized by the weight sum, then batch mean.

    Note the reference flattens across the batch before the sum, so this is a
    single global weighted mean."""
    nll, _ = _per_token_ce(logits.reshape(-1, logits.shape[-1]),
                           labels.reshape(-1), label_smoothing)
    w = loss_weight.reshape(-1).astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.sum(w)


def soft_target_cross_entropy(logits, targets, soft_targets, drop_first: bool = True):
    """Soft-target CE for soft VQ codes (training/train_muse.py:126-142).

    drop_first reproduces the reference's unconditional `[:, 1:]` slice (it
    assumes a class-id token even in the text2image trainer); pass False when
    there is no class token."""
    if drop_first:
        # soft_targets come from the VQ and carry no class token
        logits = logits[:, 1:]
        targets = targets[:, 1:]
    logits = logits[..., : soft_targets.shape[-1]]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    padding_mask = targets == IGNORE_INDEX
    loss = jnp.sum(-soft_targets * log_probs, axis=-1)
    loss = jnp.where(padding_mask, 0.0, loss)
    num_active = padding_mask.size - jnp.sum(padding_mask)
    return jnp.sum(loss) / num_active
