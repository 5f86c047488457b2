"""Ambient mesh context that makes row-parallel Pallas kernels GSPMD-safe.

Problem (round-3 STATUS / round-4 verdict item 5): ``pallas_call`` is opaque
to the SPMD partitioner.  Invoked on a mesh-sharded operand inside ``jit``,
XLA all-gathers the operand onto every device, runs the kernel fully
replicated, and re-shards the result — silently forfeiting both the sharding
and the kernel win.  That is why the kernels were gated to single-device.

Fix: the hot decode-tail kernels (VQ nearest-neighbour argmin, fused
categorical sampling, fused CFG+sampling) are *row-parallel* — every output
row depends only on its own input row (plus the replicated codebook / scalar
seed).  Under ``jax.shard_map`` each device runs the kernel on its LOCAL rows
only: no collective is ever emitted for the kernel operands, and the sharded
program keeps the measured kernel wins (VQ argmin 10.7x, sampling 2.95x,
CFG-fuse e2e wins — STATUS.md).

Usage: serving/dryrun code wraps the sharded region in

    with kernel_mesh(mesh, axes=("dp", "fsdp")):
        ids = model.generate2(...)          # or vq/quantize calls

and the kernel entry points (ops/pallas/vq_argmin.py,
ops/pallas/fused_sample.py) consult ``current_kernel_mesh()`` and wrap their
``pallas_call`` in ``shard_map`` over the given batch axes.  Without the
context the kernels behave exactly as before (single-device pallas_call).

The reference has no analog: its CUDA kernels compose with DDP trivially
because DDP never shards activations (SURVEY.md §2.4); a TPU-first framework
has to make kernels and GSPMD compose explicitly.
"""

from __future__ import annotations

import contextlib
import contextvars
import math
from typing import Optional, Sequence, Tuple

from jax.sharding import Mesh

__all__ = ["kernel_mesh", "current_kernel_mesh", "mesh_shard_count",
           "pad_rows_to", "shard_index", "replicated_weight_mesh"]

_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "muse_tpu_kernel_mesh", default=None)


@contextlib.contextmanager
def kernel_mesh(mesh: Mesh, axes: Sequence[str] = ("dp", "fsdp")):
    """Activate ``mesh`` for Pallas kernels; rows shard over ``axes``.

    ``axes`` must name mesh axes (missing names are dropped so callers can
    pass the canonical ("dp", "fsdp") against any mesh).  Axes of size 1 are
    kept — shard_map over a trivial axis is a no-op partition-wise.
    """
    present = tuple(a for a in axes if a in mesh.shape)
    token = _CTX.set((mesh, present) if present else None)
    try:
        yield
    finally:
        _CTX.reset(token)


def current_kernel_mesh() -> Optional[Tuple[Mesh, Tuple[str, ...]]]:
    """(mesh, batch_axes) when inside ``kernel_mesh``, else None."""
    return _CTX.get()


def mesh_shard_count(mesh: Mesh, axes: Sequence[str]) -> int:
    return math.prod(mesh.shape[a] for a in axes)


def pad_rows_to(n: int, multiple: int) -> int:
    """Rows of padding needed so ``n`` divides into ``multiple``."""
    return (-n) % multiple


def replicated_weight_mesh() -> Optional[Tuple[Mesh, Tuple[str, ...]]]:
    """(mesh, batch_axes) from the active ``kernel_mesh`` — but only when the
    WEIGHT-consuming kernels (GLU down-matmul, fused attention sublayer) can
    treat their weight matrices as replicated.

    The row-parallel kernels (VQ argmin, sampling) shard rows and carry no
    weights, so any batch sharding works.  The weight kernels additionally
    hold a full (D, 3D)-sized matrix per shard, which is only free of
    boundary collectives when no mesh axis shards the weights: every axis
    the partition rules use for parameters (``fsdp``/``tp`` —
    parallel/sharding.DEFAULT_RULES) must be trivial, and the kernel batch
    axes must cover all remaining parallelism.  In practice that is dp-only
    serving (replicated params, batch over ``dp``) — the standard
    low-latency multi-chip replica layout.  On fsdp/tp meshes these kernels
    stay on the XLA path, where GSPMD manages the weight collectives.
    """
    km = current_kernel_mesh()
    if km is None:
        return None
    mesh, axes = km
    if mesh_shard_count(mesh, axes) <= 1:
        return None
    if any(mesh.shape.get(a, 1) > 1 for a in ("fsdp", "tp")):
        return None
    if mesh_shard_count(mesh, axes) != mesh.size:
        return None
    return mesh, axes


def shard_index(mesh: Mesh, axes: Sequence[str]):
    """Linear index of the current shard over ``axes`` (inside shard_map).

    Used to decorrelate per-shard on-chip PRNG streams: each shard offsets
    its seed by this index so no two shards replay the same noise at the
    same local row-block (ops/pallas/fused_sample.py).
    """
    import jax
    import jax.numpy as jnp

    idx = jnp.int32(0)
    for a in axes:
        idx = idx * jnp.int32(mesh.shape[a]) + jax.lax.axis_index(a)
    return idx
