"""Mask schedules and parallel-decoding primitives (pure jnp).

Reference parity: muse/sampling.py:13-77.  All functions are shape-static and
traceable, so the whole MaskGIT decode loop (transformer_v2.generate) compiles
into a single XLA program.  Stateful torch generators map to explicit
``jax.random`` keys.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "log",
    "gumbel_noise",
    "gumbel_sample",
    "top_k",
    "mask_by_random_topk",
    "cosine_schedule",
    "linear_schedule",
    "pow_schedule",
    "sigmoid_schedule",
    "get_mask_schedule",
    "get_mask_chedule",
]


def log(t, eps: float = 1e-20):
    # reference muse/sampling.py:9 — log with clamp for numerical safety
    return jnp.log(jnp.clip(t, min=eps))


def gumbel_noise(key, shape, dtype=jnp.float32):
    """Gumbel(0,1) noise; reference draws uniform then -log(-log(u))
    (muse/sampling.py:13-15)."""
    return jax.random.gumbel(key, shape, dtype=dtype)


def gumbel_sample(key, t, temperature: float = 1.0, axis: int = -1):
    # reference muse/sampling.py:18-19
    t = t / jnp.maximum(temperature, 1e-10) + gumbel_noise(key, t.shape, t.dtype)
    return jnp.argmax(t, axis=axis)


def top_k(logits, thres: float = 0.9):
    """Keep the top ceil((1-thres)*V) logits, -inf elsewhere
    (muse/sampling.py:22-27).  Shape-static: uses jax.lax.top_k + threshold
    instead of scatter."""
    k = math.ceil((1 - thres) * logits.shape[-1])
    vals = jax.lax.top_k(logits, k)[0]
    kth = vals[..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def mask_by_random_topk(key, mask_len, probs, temperature=1.0):
    """Select the ``mask_len`` lowest-confidence positions per row.

    confidence = log(p) + T * gumbel; positions below the mask_len-th smallest
    confidence are re-masked (reference muse/sampling.py:30-35).

    Args:
      key: PRNG key.
      mask_len: (batch, 1) int number of positions to mask.
      probs: (batch, seq) selected-token probabilities.
      temperature: gumbel noise scale (can be a traced scalar).
    Returns:
      (batch, seq) bool mask.
    """
    confidence = log(probs) + temperature * gumbel_noise(key, probs.shape, probs.dtype)
    sorted_confidence = jnp.sort(confidence, axis=-1)
    cut_off = jnp.take_along_axis(sorted_confidence, mask_len.astype(jnp.int32), axis=-1)
    return confidence < cut_off


def cosine_schedule(t):
    # reference muse/sampling.py:38-39
    return jnp.cos(t * math.pi * 0.5)


def linear_schedule(t):
    # reference muse/sampling.py:42-45
    return jnp.clip(1 - t, 1e-6, 1.0)


def pow_schedule(t, method: str = "pow2"):
    # reference muse/sampling.py:48-52 (named ``pow`` there)
    exponent = float(method.replace("pow", ""))
    return jnp.clip(1.0 - t ** exponent, 1e-6, 1.0)


def sigmoid_schedule(t, start=-3, end=3, tau=1.0, clip_min=1e-6):
    # reference muse/sampling.py:55-64
    v_start = jax.nn.sigmoid(jnp.asarray(start / tau, dtype=jnp.float32))
    v_end = jax.nn.sigmoid(jnp.asarray(end / tau, dtype=jnp.float32))
    output = jax.nn.sigmoid((t * (end - start) + start) / tau)
    output = (v_end - output) / (v_end - v_start)
    return jnp.clip(output, clip_min, 1.0)


def get_mask_schedule(method: str, **schedule_kwargs):
    # reference muse/sampling.py:67-77
    if method == "cosine":
        return cosine_schedule
    if method == "linear":
        return linear_schedule
    if "pow" in method:
        return partial(pow_schedule, method=method)
    if method == "sigmoid":
        return partial(sigmoid_schedule, **schedule_kwargs)
    raise ValueError(f"Unknown schedule method: {method}")


# keep the reference's (typo'd) public name as an alias
get_mask_chedule = get_mask_schedule
