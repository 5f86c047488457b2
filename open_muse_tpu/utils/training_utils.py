"""Training diagnostics and determinism helpers.

Reference parity: muse/training_utils.py:27-57 (set_seed /
enable_full_determinism) and :299-455 (entropy / cross-entropy / token
probability distributions bucketed by percent-masked).  All metric functions
are pure jnp and jittable (the reference computes them on torch tensors).
"""

from __future__ import annotations

import os
import random

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "set_seed",
    "enable_full_determinism",
    "pixel_entropy_per_percent_masked_bucket",
    "image_entropy_per_percent_masked_bucket",
    "cross_entropy_per_percent_masked_bucket",
    "token_probability_distributions_per_percent_masked_bucket",
    "average_by_buckets",
    "input_ids_to_masked_buckets",
]

TOTAL_BUCKETS = 10


def set_seed(seed: int):
    """Seed python/numpy; JAX randomness is already explicit via keys
    (reference training_utils.py:47-57 also seeds torch/cuda)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def enable_full_determinism(seed: int):
    """TPU analog of the reference's CUDA determinism knobs
    (training_utils.py:27-44): XLA on TPU is deterministic given fixed seeds
    and static shapes; we additionally pin the GPU-style env flags for
    portability when running on other backends."""
    key = set_seed(seed)
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops=true"
    os.environ["TF_DETERMINISTIC_OPS"] = "1"
    return key


def input_ids_to_masked_buckets(input_ids, mask_id, total_buckets: int = TOTAL_BUCKETS):
    """Decile bucket of the masked percentage (training_utils.py:418-453)."""
    assert total_buckets == 10
    masked_percent = jnp.sum(input_ids == mask_id, axis=-1) / input_ids.shape[-1]
    # bucket b covers (b/10, (b+1)/10]; ceil(p*10)-1 clipped reproduces the
    # reference's chained-comparison mapping
    buckets = jnp.ceil(masked_percent * 10).astype(jnp.int32) - 1
    return jnp.clip(buckets, 0, total_buckets - 1)


def average_by_buckets(values, masked_buckets, total_buckets: int = TOTAL_BUCKETS):
    """Scatter-mean by bucket, empty buckets -> 0 (training_utils.py:400-415)."""
    numerator = jnp.zeros(total_buckets, dtype=jnp.float32).at[masked_buckets].add(
        values.astype(jnp.float32))
    counts = jnp.zeros(total_buckets, dtype=jnp.int32).at[masked_buckets].add(1)
    denominator = jnp.maximum(counts, 1)
    return numerator / denominator


def pixel_entropy_per_percent_masked_bucket(logits, input_ids, mask_id):
    """Mean per-masked-pixel predictive entropy, bucketed
    (training_utils.py:299-320)."""
    masked = input_ids == mask_id
    num_masked = jnp.sum(masked, axis=-1)
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    entropy = -jnp.sum(jnp.exp(log_probs) * log_probs, axis=-1)
    entropy = jnp.where(masked, entropy, 0.0)
    per_image = jnp.sum(entropy, axis=-1) / jnp.maximum(num_masked, 1)
    buckets = input_ids_to_masked_buckets(input_ids, mask_id)
    return average_by_buckets(per_image, buckets)


def image_entropy_per_percent_masked_bucket(logits, input_ids, mask_id):
    """Entropy of the masked-pixel-averaged distribution per image, bucketed
    (training_utils.py:324-343)."""
    masked = input_ids == mask_id
    num_masked = jnp.sum(masked, axis=-1, keepdims=True)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.where(masked[..., None], probs, 0.0)
    image_probs = jnp.sum(probs, axis=-2) / jnp.maximum(num_masked, 1)
    entropy = -jnp.sum(image_probs * jnp.log(jnp.maximum(image_probs, 1e-20)), axis=-1)
    buckets = input_ids_to_masked_buckets(input_ids, mask_id)
    return average_by_buckets(entropy, buckets)


def cross_entropy_per_percent_masked_bucket(logits, labels, input_ids, mask_id,
                                            output_size, label_smoothing: float = 0.0):
    """Per-image CE (summed over tokens, ignore -100), bucketed
    (training_utils.py:346-360; note the reference buckets the *flattened*
    per-token CE with per-image bucket ids — a shape bug that only works
    because scatter broadcasts; we use the per-image mean)."""
    from ..ops.losses import _per_token_ce

    nll, valid = _per_token_ce(logits, labels, label_smoothing)
    per_image = jnp.sum(nll, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)
    buckets = input_ids_to_masked_buckets(input_ids, mask_id)
    return average_by_buckets(per_image, buckets)


def token_prob_deciles_per_percent_masked_bucket(logits, input_ids, mask_id):
    """Jit-friendly summary of the reference's per-bucket token-probability
    histograms (train_muse.py:1355-1379): deciles (11 quantiles) of the
    model's max-token probability at masked positions, per masked-% bucket.
    Returns (TOTAL_BUCKETS, 11); buckets with no masked tokens are NaN."""
    probs = jax.nn.softmax(jnp.asarray(logits, dtype=jnp.float32), axis=-1)
    p_max = jnp.max(probs, axis=-1)                       # (B, S)
    masked = input_ids == mask_id
    buckets = input_ids_to_masked_buckets(input_ids, mask_id)  # (B,)
    qs = jnp.linspace(0.0, 1.0, 11)
    rows = []
    for b in range(TOTAL_BUCKETS):
        in_bucket = (buckets == b)[:, None] & masked
        vals = jnp.where(in_bucket, p_max, jnp.nan)
        rows.append(jnp.nanquantile(vals, qs))
    return jnp.stack(rows)


def token_probability_distributions_per_percent_masked_bucket(logits, input_ids,
                                                              mask_id):
    """Sampled per-bucket probability distributions as a pandas DataFrame
    (training_utils.py:363-397) for histogram logging."""
    import pandas as pd

    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits, dtype=jnp.float32), axis=-1))
    input_ids = np.asarray(input_ids)
    buckets = np.asarray(input_ids_to_masked_buckets(jnp.asarray(input_ids), mask_id))

    data = []
    for bucket_idx in range(TOTAL_BUCKETS):
        idxs = np.where(buckets == bucket_idx)[0]
        if idxs.size == 0:
            continue
        image_idx = idxs[0]
        masked_positions = np.where(input_ids[image_idx] == mask_id)[0]
        if masked_positions.size == 0:
            continue
        pixel_probs = probs[image_idx, masked_positions[0]]
        for p in pixel_probs:
            data.append({"bucket": bucket_idx, "masked_pixel_prob": float(p)})
    return pd.DataFrame(data)


class AverageMeter:
    """Running average (reference train_muse.py:229-246)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
