"""Fused codebook nearest-neighbour search (Pallas TPU kernel).

The VQ hot spot (reference modeling_maskgit_vqgan.py:303-316 addmm trick;
BASELINE.json north-star) computes an (N, K) distance matrix then argmins it.
XLA materializes that matrix in HBM (N=B*H*W up to ~65k rows, K up to 16384:
a 4GB fp32 intermediate at batch 64).  This kernel streams codebook tiles
through VMEM and keeps only a running (min, argmin) per row — O(N) memory,
one MXU matmul per tile, distances never touch HBM.

Distance note: argmin_k ||z - e_k||^2 == argmin_k (||e_k||^2 - 2 z.e_k), so
the per-row ||z||^2 term is dropped entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vq_argmin"]


def _kernel(z_ref, cb_ref, e_sq_ref, idx_ref, *, block_k: int):
    """One grid step: z tile (TN, C) vs the full codebook (K, C) in VMEM."""
    z = z_ref[:].astype(jnp.float32)
    num_k = cb_ref.shape[0]
    tn = z.shape[0]

    def body(k, carry):
        best_val, best_idx = carry
        cb = cb_ref[pl.ds(k * block_k, block_k), :].astype(jnp.float32)
        e_sq = e_sq_ref[0, pl.ds(k * block_k, block_k)]
        # (TN, TK) partial distances on the MXU
        scores = e_sq[None, :] - 2.0 * jax.lax.dot_general(
            z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        local_val = jnp.min(scores, axis=1)
        local_idx = jnp.argmin(scores, axis=1).astype(jnp.int32) + k * block_k
        take = local_val < best_val  # strict: first minimum wins (torch parity)
        return (jnp.where(take, local_val, best_val),
                jnp.where(take, local_idx, best_idx))

    init = (jnp.full((tn,), jnp.inf, dtype=jnp.float32),
            jnp.zeros((tn,), dtype=jnp.int32))
    _, best_idx = jax.lax.fori_loop(0, num_k // block_k, body, init)
    idx_ref[:, :] = best_idx.reshape(idx_ref.shape)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def vq_argmin(flat_states, codebook, block_n: int = 512, block_k: int = 1024,
              interpret: bool = False):
    """argmin_k ||z_n - e_k||^2 for z (N, C), codebook (K, C) -> (N,) int32.

    Pads N up to block_n and K handling requires K % block_k == 0 (all
    reference codebooks are powers of two >= 1024).
    """
    n, c = flat_states.shape
    k = codebook.shape[0]
    block_k = min(block_k, k)
    if k % block_k:
        raise ValueError(f"K={k} must be divisible by block_k={block_k}")
    # int32 tiles are (8, 128): each grid step emits an (8, 128) index block
    block_n = 1024
    pad_n = (-n) % block_n
    z = jnp.pad(flat_states, ((0, pad_n), (0, 0))) if pad_n else flat_states
    e_sq = jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=1)[None, :]

    grid = (z.shape[0] // block_n,)
    idx = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0] * 8, 128), jnp.int32),
        interpret=interpret,
    )(z, codebook, e_sq)
    return idx.reshape(-1)[:n]
