"""Attention kernel (Pallas TPU): on-chip fp32 softmax, O(seq) HBM traffic.

Parity target: xformers ``memory_efficient_attention`` (reference
modeling_transformer_v2.py:34-39, 881-889).  Sequence lengths in this model
family are small (<= 1024 image + 77 text tokens), so the whole K/V block for
a group of (batch, head) pairs fits VMEM: the kernel streams Q tiles, computes
fp32 logits + softmax + PV on-chip, and never materializes the (Q, K) logits
matrix in HBM (XLA's attention writes it out in fp32 — at 512px/bs8 that is
~16 MB per layer per step).

Shape-tuning (profiler, TPU v5e): head_dim is 64 and batch*heads is 24-256,
so one grid cell per (batch, head) — the round-1 design — spends more time in
per-cell overhead than in the ~10 us of MXU work per cell.  This version
processes a GROUP of (batch, head) pairs per grid cell (unrolled in-kernel
loop) and masks padded K/V columns in-kernel, so the 77-token text context
pads to the 128-lane boundary without a separate masked-softmax pass.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, tk: int):
    group = q_ref.shape[0]
    tk_padded = k_ref.shape[1]
    for g in range(group):  # static unroll: one (batch, head) pair per lap
        # operands stay bf16 INTO the MXU (native bf16 inputs, fp32
        # accumulate); an upfront fp32 cast would force 4x-slower fp32
        # MXU passes and 2x the VMEM
        q = q_ref[g]  # (Bq, D)
        k = k_ref[g]  # (Tk_pad, D)
        v = v_ref[g]  # (Tk_pad, D)
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
        if tk < tk_padded:  # mask padded K/V columns (e.g. 77-token text)
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < tk, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        # normalized weights go back to the input dtype for the PV matmul —
        # bit-matching the XLA path (ops/layers.dot_product_attention casts
        # softmax output to query dtype before PV)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q_ref.dtype)
        out = jnp.dot(w, v, preferred_element_type=jnp.float32)
        o_ref[g] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(q, k, v, block_q: int = 256, interpret: bool = False):
    """(B, T, H, D) attention matching ops.layers.dot_product_attention."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    bh = b * h
    scale = 1.0 / math.sqrt(d)
    # fold batch and heads into one axis; move head dim out
    qf = q.transpose(0, 2, 1, 3).reshape(bh, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(bh, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(bh, tk, d)
    # pad K/V length to the 128-lane boundary; kernel masks the tail
    pad_k = (-tk) % 128
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))
    block_q = min(block_q, tq)
    pad_q = (-tq) % block_q
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    # amortize per-cell overhead: several (batch, head) pairs per grid cell,
    # bounded so group * tk_padded keeps K/V + fp32 logits inside VMEM
    max_group = max(1, 2048 // kf.shape[1])
    group = next(g for g in (8, 4, 2, 1) if bh % g == 0 and g <= max_group)
    grid = (bh // group, qf.shape[1] // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, tk=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, kf.shape[1], d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, kf.shape[1], d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    if pad_q:
        out = out[:, :tq]
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
