"""Fused codebook nearest-neighbour search (Pallas TPU kernel).

The VQ hot spot (reference modeling_maskgit_vqgan.py:303-316 addmm trick;
BASELINE.json north-star) computes an (N, K) distance matrix then argmins it.
XLA materializes that matrix in HBM (N=B*H*W up to ~65k rows, K up to 16384:
a 4GB fp32 intermediate at batch 64).  This kernel makes K a grid dimension:
the Pallas pipeline streams codebook tiles HBM->VMEM (double-buffered DMA
overlapped with the MXU matmul) while a VMEM scratch holds only the running
(min, argmin) per row — O(N) memory, distances never touch HBM, and the whole
codebook never has to fit VMEM at once.

Distance note: argmin_k ||z - e_k||^2 == argmin_k (||e_k||^2 - 2 z.e_k), so
the per-row ||z||^2 term is dropped entirely.

Mesh composability (round-4): the search is row-parallel, so under an active
``parallel.kernel_mesh`` context the kernel runs inside ``jax.shard_map``
over the batch axes — each device searches only its local rows against the
replicated codebook, and the SPMD partitioner never sees (so never
all-gathers around) the opaque ``pallas_call``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ...parallel.kernel_mesh import current_kernel_mesh, mesh_shard_count

__all__ = ["vq_argmin"]

BLOCK_N = 1024  # rows per grid step; int32 output tiles are (8, 128)


def _kernel(z_ref, cb_ref, e_sq_ref, idx_ref, best_val, best_idx, *,
            block_k: int):
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_val[:, :] = jnp.full_like(best_val[:, :], jnp.inf)
        best_idx[:, :] = jnp.zeros_like(best_idx[:, :])

    z = z_ref[:].astype(jnp.float32)
    cb = cb_ref[:].astype(jnp.float32)
    scores = e_sq_ref[0][None, :] - 2.0 * jax.lax.dot_general(
        z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    local_val = jnp.min(scores, axis=1).reshape(best_val.shape)
    local_idx = (jnp.argmin(scores, axis=1).astype(jnp.int32)
                 + j * block_k).reshape(best_idx.shape)
    take = local_val < best_val[:, :]  # strict: earlier tile wins ties
    best_val[:, :] = jnp.where(take, local_val, best_val[:, :])
    best_idx[:, :] = jnp.where(take, local_idx, best_idx[:, :])

    @pl.when(j == num_j - 1)
    def _():
        idx_ref[:, :] = best_idx[:, :]


def vq_argmin(flat_states, codebook, block_k: int = 1024,
              interpret: bool = False):
    """argmin_k ||z_n - e_k||^2 for z (N, C), codebook (K, C) -> (N,) int32.

    Requires K % block_k == 0 (all reference codebooks are powers of two
    >= 1024); N pads to 1024 rows internally.  Under an active
    ``parallel.kernel_mesh`` the call shards rows over the mesh batch axes
    via ``shard_map`` (codebook replicated); results are identical to the
    unsharded kernel (the search is deterministic and row-independent).
    """
    km = current_kernel_mesh()
    if km is not None and mesh_shard_count(*km) > 1:
        mesh, axes = km
        nsh = mesh_shard_count(mesh, axes)
        n = flat_states.shape[0]
        pad = (-n) % nsh  # equal local row counts; local impl pads the rest
        z = jnp.pad(flat_states, ((0, pad), (0, 0))) if pad else flat_states
        out = jax.shard_map(
            functools.partial(_vq_argmin_local, block_k=block_k,
                              interpret=interpret),
            mesh=mesh, in_specs=(P(axes, None), P(None, None)),
            out_specs=P(axes), check_vma=False,
        )(z, codebook)
        return out[:n]
    return _vq_argmin_local(flat_states, codebook, block_k=block_k,
                            interpret=interpret)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def _vq_argmin_local(flat_states, codebook, block_k: int = 1024,
                     interpret: bool = False):
    n, c = flat_states.shape
    k = codebook.shape[0]
    block_k = min(block_k, k)
    if k % block_k:
        raise ValueError(f"K={k} must be divisible by block_k={block_k}")
    pad_n = (-n) % BLOCK_N
    z = jnp.pad(flat_states, ((0, pad_n), (0, 0))) if pad_n else flat_states
    e_sq = jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=1)[None, :]

    grid = (z.shape[0] // BLOCK_N, k // block_k)
    sub = BLOCK_N // 128
    idx = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0] * sub, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((sub, 128), jnp.float32),
            pltpu.VMEM((sub, 128), jnp.int32),
        ],
        interpret=interpret,
    )(z, codebook, e_sq)
    return idx.reshape(-1)[:n]
