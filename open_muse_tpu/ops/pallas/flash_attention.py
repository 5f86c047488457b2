"""Attention kernel (Pallas TPU): on-chip softmax, O(seq) HBM traffic.

Parity target: xformers ``memory_efficient_attention`` (reference
modeling_transformer_v2.py:34-39, 881-889).  Sequence lengths in this model
family are small (<= 1024 image + 77 text tokens), so the whole K/V block for
one (batch, head) fits VMEM: the kernel streams Q tiles, computes fp32
logits + softmax + PV on-chip, and never materializes the (Q, K) matrix in
HBM.  For these shapes this is the full flash-attention benefit without the
online-softmax bookkeeping (which only pays when K/V exceed VMEM).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (Bq, D)
    k = k_ref[0].astype(jnp.float32)  # (S, D)
    v = v_ref[0].astype(jnp.float32)  # (S, D)
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    out = out / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(q, k, v, block_q: int = 256, interpret: bool = False):
    """(B, T, H, D) attention matching ops.layers.dot_product_attention."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    # fold batch and heads into one grid axis; move head dim out
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    block_q = min(block_q, tq)
    pad_q = (-tq) % block_q
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    grid = (b * h, qf.shape[1] // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    if pad_q:
        out = out[:, :tq]
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
