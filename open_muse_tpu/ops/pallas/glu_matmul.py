"""Fused GLU-activation + down-projection matmul (Pallas TPU kernel).

Target (round-3 verdict item 2): the 512px/bs8 per-op profile shows the
trunk FFN down-projection ``(gelu(a) * b) @ wo`` running at ~60% of MXU peak
(198 vs 120 us ideal) — XLA fuses the erf-GELU + multiply as a *producer*
into the matmul and the VPU transcendental work throttles the MXU feed
(arithmetic: ~45-78 us of erf/mul VPU time per layer, serialized into the
operand stream).  An explicit materialization barrier makes it WORSE
(measured 387.6 vs 381.9 ms end-to-end — the epilogue placement costs more
than the clean matmul saves; see STATUS.md).

This kernel computes ``out = (gelu(a) * b) @ wo`` with K as the inner grid
dimension: per (m, k) cell it GELU-multiplies one (bm, bk) tile pair on the
VPU and feeds the MXU accumulator, so Mosaic's software pipeline overlaps
cell i+1's VPU work and DMA with cell i's matmul instead of serializing them
inside one XLA fusion.  The (bm, N) f32 accumulator lives in VMEM scratch;
the GLU product never touches HBM (same as XLA's fusion) and ``a``/``b`` are
each read exactly once.

Workload: the GLU FFN of MaskGiTUViT_v2 (reference
modeling_transformer_v2.py:926-951) at research shapes
(K=intermediate 2816, N=hidden 1024, M=cfg_batch*seq).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["glu_down_matmul", "use_pallas_glu", "use_pallas_glu_bwd"]

# tuned on v5e at the research FFN (K=2816, N=1024, M=4096): 617 us/FFN vs
# XLA's 674-703 across runs in the 22-layer chain harness; bm=512/bk=256 and
# bm=2048/bk=128 measured worse (see STATUS.md round-3)
BLOCK_M = 1024
BLOCK_K = 128
# backward blocks: the bwd kernel runs TWO (bm, bk, N) matmuls per cell
# (dh and the dwo accumulation), so K blocks are wider to amortize the
# per-cell g/wo traffic
BWD_BLOCK_M = 512
BWD_BLOCK_K = 256


def use_pallas_glu() -> bool:
    """Default ON for single-device TPU; on a multi-device TPU ON only
    inside a dp-only ``parallel.kernel_mesh`` (replicated_weight_mesh) —
    the GLU rows are row-parallel, so under ``shard_map`` each device runs
    the kernel on its local rows with the replicated ``wo`` and the sharded
    program keeps the kernel win.  On fsdp/tp meshes the weights are
    sharded and the kernel stays OFF (pallas_call is opaque to the SPMD
    partitioner: XLA would all-gather the operands and run the kernel
    replicated — a silent perf regression).  MUSE_TPU_PALLAS_GLU=0/1
    overrides either way.
    """
    env = os.environ.get("MUSE_TPU_PALLAS_GLU")
    if env is not None:
        return env == "1"
    try:
        # TPU only: the kernel lowers through Mosaic (pltpu memory spaces);
        # a GPU backend would crash in pallas_call rather than fall back
        if jax.default_backend() != "tpu":
            return False
        if jax.device_count() == 1:
            return True
        from ...parallel.kernel_mesh import replicated_weight_mesh

        return replicated_weight_mesh() is not None
    except Exception:
        return False


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 in f32) — Mosaic
    has no erf/erfc lowering, but exp is native VPU."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(a_ref, b_ref, wo_ref, out_ref, acc, *, out_dtype):
    k = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc[:, :])

    # erf-GELU in f32 (matches jax.nn.gelu(approximate=False) to ~1.5e-7 --
    # far below the bf16 rounding of the operands)
    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    hidden = 0.5 * a * (1.0 + _erf(a * 0.7071067811865476)) * b
    acc[:, :] += jax.lax.dot_general(
        hidden.astype(wo_ref.dtype), wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == num_k - 1)
    def _():
        out_ref[:, :] = acc[:, :].astype(out_dtype)


def _primal(a, b, wo, block_m, block_k, interpret):
    m, kdim = a.shape
    n = wo.shape[1]
    pad_m = (-m) % block_m
    if pad_m:
        a = jnp.pad(a, ((0, pad_m), (0, 0)))
        b = jnp.pad(b, ((0, pad_m), (0, 0)))

    grid = (a.shape[0] // block_m, kdim // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, n), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a.shape[0], n), a.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, n), jnp.float32)],
        interpret=interpret,
    )(a, b, wo)
    return out[:m] if pad_m else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _glu_down(a, b, wo, block_m, block_k, interpret):
    return _primal(a, b, wo, block_m, block_k, interpret)


def _glu_down_fwd(a, b, wo, block_m, block_k, interpret):
    return _primal(a, b, wo, block_m, block_k, interpret), (a, b, wo)


def _gelu_pair(af):
    """(gelu(a), gelu'(a)) in f32 via the A&S-7.1.26 erf (Mosaic has no erf
    lowering); gelu'(x) = Phi(x) + x * phi(x)."""
    cdf = 0.5 * (1.0 + _erf(af * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * af * af) * 0.3989422804014327
    return af * cdf, cdf + af * pdf


def _bwd_kernel(a_ref, b_ref, g_ref, wo_ref, da_ref, db_ref, dwo_ref, acc,
                *, io_dtype, wo_dtype):
    m = pl.program_id(1)
    num_m = pl.num_programs(1)

    @pl.when(m == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc[:, :])

    af = a_ref[:].astype(jnp.float32)
    bf = b_ref[:].astype(jnp.float32)
    gelu_a, dgelu = _gelu_pair(af)
    # dh = g @ wo^T, kept in VMEM (XLA's backward materializes this (M, K)
    # f32 array in HBM — the measured 0.696 ms/layer fusion in the round-5
    # train-step trace)
    dh = jax.lax.dot_general(
        g_ref[:], wo_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da_ref[:, :] = (dh * bf * dgelu).astype(io_dtype)
    db_ref[:, :] = (dh * gelu_a).astype(io_dtype)
    # dwo accumulation: h^T @ g with h recomputed on the VPU while the MXU
    # pipeline runs
    h = (gelu_a * bf).astype(io_dtype)
    acc[:, :] += jax.lax.dot_general(
        h, g_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(m == num_m - 1)
    def _():
        dwo_ref[:, :] = acc[:, :].astype(wo_dtype)


def _bwd_pallas(a, b, wo, g, block_m, block_k, interpret):
    m, kdim = a.shape
    n = wo.shape[1]
    pad_m = (-m) % block_m
    if pad_m:
        # zero rows contribute nothing to dwo and slice off of da/db
        a = jnp.pad(a, ((0, pad_m), (0, 0)))
        b = jnp.pad(b, ((0, pad_m), (0, 0)))
        g = jnp.pad(g, ((0, pad_m), (0, 0)))
    grid = (kdim // block_k, a.shape[0] // block_m)  # m inner: dwo accum
    da, db, dwo = pl.pallas_call(
        functools.partial(_bwd_kernel, io_dtype=a.dtype, wo_dtype=wo.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda k, m: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda k, m: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, n), lambda k, m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, n), lambda k, m: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, block_k), lambda k, m: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k), lambda k, m: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, n), lambda k, m: (k, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((a.shape[0], kdim), a.dtype),
            jax.ShapeDtypeStruct((a.shape[0], kdim), b.dtype),
            jax.ShapeDtypeStruct((kdim, n), wo.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((block_k, n), jnp.float32)],
        interpret=interpret,
    )(a, b, g, wo)
    if pad_m:
        da, db = da[:m], db[:m]
    return da, db, dwo


def use_pallas_glu_bwd() -> bool:
    """The fused backward is default ON wherever the forward kernel ran
    (it is only reachable through _glu_down's custom_vjp);
    MUSE_TPU_PALLAS_GLU_BWD=0 falls back to the plain XLA expression."""
    return os.environ.get("MUSE_TPU_PALLAS_GLU_BWD", "1") == "1"


def _glu_down_bwd(block_m, block_k, interpret, res, g):
    """Fused Pallas backward (round-5 verdict item 1): per (k, m) tile the
    kernel recomputes gelu/gelu' on the VPU, keeps the (M, K) f32 ``dh``
    entirely in VMEM, and accumulates ``dwo`` across the m grid — XLA's
    expression materializes dh(f32)+da+db in HBM (measured 0.696 ms/layer
    of the bs32 train step).  MUSE_TPU_PALLAS_GLU_BWD=0 restores the plain
    XLA expression."""
    a, b, wo = res
    if use_pallas_glu_bwd():
        bm = min(BWD_BLOCK_M, max(8, a.shape[0]))
        bk = BWD_BLOCK_K if a.shape[1] % BWD_BLOCK_K == 0 else block_k
        if a.shape[1] % bk == 0:
            return _bwd_pallas(a, b, wo, g, bm, bk, interpret)
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    gelu_a = jax.nn.gelu(af, approximate=False)
    hidden = (gelu_a * bf).astype(wo.dtype)
    dwo = (hidden.T @ g.astype(wo.dtype)).astype(wo.dtype)
    dh = (g @ wo.T).astype(jnp.float32)
    # d/dx gelu(x) = Phi(x) + x * phi(x)
    dgelu = (0.5 * (1.0 + jax.lax.erf(af * 0.7071067811865476))
             + af * jnp.exp(-0.5 * af * af) * 0.3989422804014327)
    da = (dh * bf * dgelu).astype(a.dtype)
    db = (dh * gelu_a).astype(b.dtype)
    return da, db, dwo


_glu_down.defvjp(_glu_down_fwd, _glu_down_bwd)


@functools.partial(jax.jit, static_argnames=("block_m", "block_k", "interpret"))
def _glu_down_jit(a, b, wo, block_m, block_k, interpret):
    return _glu_down(a, b, wo, block_m, block_k, interpret)


def glu_down_matmul(a, b, wo, block_m: int = BLOCK_M, block_k: int = BLOCK_K,
                    interpret: bool = False):
    """``(gelu(a) * b) @ wo`` for a, b (M, K) and wo (K, N) -> (M, N).

    Output dtype follows ``a``.  M pads internally to block_m; requires
    K % block_k == 0 and N a lane multiple (128) — callers should fall back
    to the plain XLA expression otherwise (see GLUFeedForward).
    Differentiable: the backward pass is the plain XLA expression's VJP.

    Inside a dp-only ``parallel.kernel_mesh`` (replicated_weight_mesh) the
    rows shard over the mesh batch axes via ``shard_map`` with ``wo``
    replicated, so sharded serving keeps the kernel win.  The mesh dispatch
    lives OUTSIDE the jitted single-shard impl: a jit cache keyed only on
    shapes would otherwise replay a no-mesh trace inside a mesh context (or
    vice versa).
    """
    m, kdim = a.shape
    n = wo.shape[1]
    if b.shape != a.shape or wo.shape[0] != kdim:
        raise ValueError(f"shape mismatch: a{a.shape} b{b.shape} wo{wo.shape}")
    block_m = min(block_m, max(8, m))
    block_k = min(block_k, kdim)
    if kdim % block_k or n % 128:
        raise ValueError(f"K={kdim} %% block_k={block_k} or N={n} %% 128 != 0")

    from ...parallel.kernel_mesh import mesh_shard_count, replicated_weight_mesh

    km = replicated_weight_mesh()
    if km is not None:
        mesh, axes = km
        nsh = mesh_shard_count(mesh, axes)
        if m % nsh == 0:
            from jax.sharding import PartitionSpec as P

            block_m_loc = min(block_m, max(8, m // nsh))
            body = lambda a_s, b_s, wo_s: _glu_down_jit(
                a_s, b_s, wo_s, block_m_loc, block_k, interpret)
            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(axes, None), P(axes, None), P()),
                out_specs=P(axes, None), check_vma=False)(a, b, wo)
        # rows not divisible by the shard count: the plain pallas_call would
        # make GSPMD all-gather — plain XLA expression instead (same
        # precision staging as the kernel: f32 GLU, wo-dtype matmul operand,
        # f32 accumulate, output in a's dtype)
        hidden = (jax.nn.gelu(a.astype(jnp.float32), approximate=False)
                  * b.astype(jnp.float32)).astype(wo.dtype)
        return jnp.dot(hidden, wo,
                       preferred_element_type=jnp.float32).astype(a.dtype)
    return _glu_down_jit(a, b, wo, block_m, block_k, interpret)
