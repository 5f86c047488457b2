"""Fused categorical sampling + confidence (Pallas TPU).

The MaskGIT decode tail does, per step (models/transformer_v2.py
parallel_decode_loop, reference modeling_transformer_v2.py:443-446):

    sampled = categorical(key, logits)            # gumbel + argmax, 1 read
    lse     = logsumexp(logits)                   # 1 read
    selected = exp(logits[sampled] - lse)         # gather

XLA executes that as separate passes over the (B, S, V) fp32 logits — at
512px/bs8 that tensor is 268 MB and the sampling tail costs ~1.7 ms of each
34 ms step (STATUS.md per-op accounting), dominated by HBM re-reads plus
threefry gumbel generation. This kernel streams the logits ONCE through
VMEM, generating gumbel noise on-chip (pltpu PRNG) and tracking, per row:

  * running argmax of (logit + gumbel)  -> the categorical sample
  * the logit value at that argmax      -> numerator of the confidence
  * online logsumexp (m, s)             -> denominator

Distributionally equivalent to jax.random.categorical (the gumbel-max
trick), NOT bitwise: the noise comes from the TPU PRNG seeded from the
caller's key, not threefry — decode outputs differ from the XLA path for
the same key. Default-ON on TPU; opt out with MUSE_TPU_PALLAS_SAMPLE=0
(and MUSE_TPU_PALLAS_SAMPLE_CFG=0 for the CFG-fused variant) to restore
the bit-reproducible XLA tail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ...parallel.kernel_mesh import (current_kernel_mesh, mesh_shard_count,
                                     shard_index)

__all__ = ["fused_categorical", "fused_categorical_cfg"]

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _grid_dims(n: int, v: int, block_n: int, block_v: int):
    """(row block, #row blocks, v block, #v blocks) — the same sizing logic
    both the local kernels and the sharded seed-offset computation use."""
    bn = min(block_n, n)
    bv = min(block_v, -(-v // 128) * 128)  # lane-aligned
    return bn, -(-n // bn), bv, -(-v // bv)


def _kernel(seed_ref, x_ref, *rest, n_v_blocks: int, block_v: int,
            vocab_limit: int, onchip_rng: bool):
    if onchip_rng:
        noise_ref = None
        (ids_ref, sel_ref, best_score, best_idx, best_logit, run_m,
         run_s) = rest
    else:
        (noise_ref, ids_ref, sel_ref, best_score, best_idx, best_logit,
         run_m, run_s) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_score[...] = jnp.full_like(best_score, -jnp.inf)
        best_idx[...] = jnp.zeros_like(best_idx)
        best_logit[...] = jnp.full_like(best_logit, -jnp.inf)
        run_m[...] = jnp.full_like(run_m, -jnp.inf)
        run_s[...] = jnp.zeros_like(run_s)

    x = x_ref[...].astype(jnp.float32)  # (block_n, block_v)
    # ceil-div v-blocks: columns past the true vocab (final partial block,
    # or a lane-rounded block for small vocabs) are masked out in-kernel
    col_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + j * block_v
    x = jnp.where(col_iota < vocab_limit, x, _NEG_INF)

    if onchip_rng:
        # on-chip gumbel noise; seed is unique per (row-block, v-block) so
        # every logit sees an independent draw and repeated calls with a new
        # seed resample
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * n_v_blocks + j)
        bits = pltpu.prng_random_bits(x.shape).astype(jnp.uint32)
        # Mosaic has no uint32->f32 cast; >>8 leaves 24 bits, exact in int32
        b24 = (bits >> 8).astype(jnp.int32)
        u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
        g = -jnp.log(-jnp.log(u))
    else:
        g = noise_ref[...]  # pre-drawn gumbel (tests / interpret mode)
    score = jnp.where(col_iota < vocab_limit, x + g, -jnp.inf)

    # per-row tile argmax of the perturbed logits; the raw logit at the
    # argmax is recovered with a where+max (Mosaic has no in-kernel gather)
    tile_best = jnp.max(score, axis=1, keepdims=True)
    is_best = score == tile_best
    arg_local = jnp.min(jnp.where(is_best, col_iota, vocab_limit),
                        axis=1, keepdims=True)
    logit_at = jnp.max(jnp.where(is_best, x, -jnp.inf), axis=1, keepdims=True)
    upd = tile_best > best_score[...]
    best_idx[...] = jnp.where(upd, arg_local.astype(jnp.int32), best_idx[...])
    best_logit[...] = jnp.where(upd, logit_at, best_logit[...])
    best_score[...] = jnp.maximum(best_score[...], tile_best)

    # online logsumexp of the raw logits
    tile_m = jnp.max(x, axis=1, keepdims=True)
    new_m = jnp.maximum(run_m[...], tile_m)
    run_s[...] = run_s[...] * jnp.exp(run_m[...] - new_m) + \
        jnp.sum(jnp.exp(x - new_m), axis=1, keepdims=True)
    run_m[...] = new_m

    @pl.when(j == n_v_blocks - 1)
    def _finish():
        ids_ref[...] = best_idx[...]
        lse = run_m[...] + jnp.log(run_s[...])
        sel_ref[...] = jnp.exp(best_logit[...] - lse)


def fused_categorical(seed, logits, block_n: int = 256, block_v: int = 2048,
                      interpret: bool = False, gumbel=None):
    """seed (int32 scalar or (1,)), logits (..., V) fp32 ->
    (ids int32 (...,), selected f32 (...,)) — ids ~ categorical(logits),
    selected = softmax(logits)[ids].

    gumbel: optional pre-drawn noise with logits' shape (the TPU PRNG
    primitives have no interpret-mode lowering; tests pass explicit noise).

    Under an active ``parallel.kernel_mesh`` the rows shard over the mesh
    batch axes via ``shard_map``; each shard offsets the on-chip PRNG seed
    by its global row-block index, so the draws stay independent (and match
    the unsharded stream when local rows divide block_n).
    """
    orig_shape = logits.shape[:-1]
    v = logits.shape[-1]
    n = 1
    for d in orig_shape:
        n *= d
    x = logits.reshape(n, v)
    g = gumbel.reshape(n, v) if gumbel is not None else None

    km = current_kernel_mesh()
    if km is not None and mesh_shard_count(*km) > 1:
        mesh, axes = km
        nsh = mesh_shard_count(mesh, axes)
        pad = (-n) % nsh
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            if g is not None:
                g = jnp.pad(g, ((0, pad), (0, 0)))
        n_loc = x.shape[0] // nsh
        bn, n_row_blocks, _, n_v_blocks = _grid_dims(n_loc, v, block_n, block_v)

        def body(seed_s, x_s, *maybe_g):
            lseed = (jnp.asarray(seed_s, jnp.int32).reshape(())
                     + shard_index(mesh, axes)
                     * jnp.int32(n_row_blocks * n_v_blocks))
            gm = maybe_g[0] if maybe_g else None
            return _fused_categorical_flat(lseed, x_s, block_n=block_n,
                                           block_v=block_v,
                                           interpret=interpret, gumbel=gm)

        args = (jnp.asarray(seed, jnp.int32).reshape(()), x)
        in_specs = (P(), P(axes, None))
        if g is not None:
            args += (g,)
            in_specs += (P(axes, None),)
        ids, sel = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=(P(axes), P(axes)),
                                 check_vma=False)(*args)
    else:
        ids, sel = _fused_categorical_flat(seed, x, block_n=block_n,
                                           block_v=block_v,
                                           interpret=interpret, gumbel=g)
    return ids[:n].reshape(orig_shape), sel[:n].reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("block_n", "block_v", "interpret"))
def _fused_categorical_flat(seed, x, block_n: int = 256, block_v: int = 2048,
                            interpret: bool = False, gumbel=None):
    """Single-shard implementation over flat (N, V) logits -> ((N,), (N,))."""
    n, v = x.shape
    x = x.astype(jnp.float32)
    if interpret and gumbel is None:
        # the TPU PRNG primitives have no interpreter lowering — draw the
        # noise host-side from the same seed so CPU CI can run the full
        # default-on kernel path (distributionally identical)
        gumbel = jax.random.gumbel(
            jax.random.PRNGKey(jnp.asarray(seed, jnp.int32).reshape(())),
            (n, v), jnp.float32)
    # lane-aligned v-block; any vocab works — the final (or only) block is
    # ceil-div sized and masked to the true vocab in-kernel
    block_n, _, block_v, n_v_blocks = _grid_dims(n, v, block_n, block_v)
    pad_n = (-n) % block_n
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0)))
    grid = (x.shape[0] // block_n, n_v_blocks)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    onchip_rng = gumbel is None
    inputs = [seed, x]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((block_n, block_v), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
    ]
    if not onchip_rng:
        gf = gumbel.astype(jnp.float32)
        if pad_n:
            gf = jnp.pad(gf, ((0, pad_n), (0, 0)))
        inputs.append(gf)
        in_specs.append(pl.BlockSpec((block_n, block_v), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
    ids, sel = pl.pallas_call(
        functools.partial(_kernel, n_v_blocks=n_v_blocks, block_v=block_v,
                          vocab_limit=v, onchip_rng=onchip_rng),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, 1), jnp.float32),  # best_score
            pltpu.VMEM((block_n, 1), jnp.int32),    # best_idx
            pltpu.VMEM((block_n, 1), jnp.float32),  # best_logit
            pltpu.VMEM((block_n, 1), jnp.float32),  # run_m
            pltpu.VMEM((block_n, 1), jnp.float32),  # run_s
        ],
        interpret=interpret,
    )(*inputs)
    return ids[:n, 0], sel[:n, 0]


def _cfg_kernel(seed_ref, g_ref, x_ref, *rest, n_v_blocks: int, block_v: int,
                vocab_limit: int, onchip_rng: bool):
    if onchip_rng:
        noise_ref = None
        (ids_ref, sel_ref, best_score, best_idx, best_logit, run_m,
         run_s) = rest
    else:
        (noise_ref, ids_ref, sel_ref, best_score, best_idx, best_logit,
         run_m, run_s) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_score[...] = jnp.full_like(best_score, -jnp.inf)
        best_idx[...] = jnp.zeros_like(best_idx)
        best_logit[...] = jnp.full_like(best_logit, -jnp.inf)
        run_m[...] = jnp.full_like(run_m, -jnp.inf)
        run_s[...] = jnp.zeros_like(run_s)

    # CFG combine on the fly: cond/uncond halves arrive in one (2, n, v)
    # block; the combined fp32 logits never exist in HBM
    xc = x_ref[0].astype(jnp.float32)
    xu = x_ref[1].astype(jnp.float32)
    g = g_ref[0]
    x = xu + g * (xc - xu)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + j * block_v
    # one mask handles the codebook crop (vocab 8256 -> 8192) AND the
    # non-divisible final v-block padding
    x = jnp.where(col_iota < vocab_limit, x, _NEG_INF)

    if onchip_rng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * n_v_blocks + j)
        bits = pltpu.prng_random_bits(x.shape).astype(jnp.uint32)
        b24 = (bits >> 8).astype(jnp.int32)
        u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
        gumb = -jnp.log(-jnp.log(u))
    else:
        gumb = noise_ref[...]
    score = jnp.where(col_iota < vocab_limit, x + gumb, -jnp.inf)

    tile_best = jnp.max(score, axis=1, keepdims=True)
    is_best = score == tile_best
    arg_local = jnp.min(jnp.where(is_best, col_iota, vocab_limit),
                        axis=1, keepdims=True)
    logit_at = jnp.max(jnp.where(is_best, x, -jnp.inf), axis=1, keepdims=True)
    upd = tile_best > best_score[...]
    best_idx[...] = jnp.where(upd, arg_local.astype(jnp.int32), best_idx[...])
    best_logit[...] = jnp.where(upd, logit_at, best_logit[...])
    best_score[...] = jnp.maximum(best_score[...], tile_best)

    tile_m = jnp.max(x, axis=1, keepdims=True)
    new_m = jnp.maximum(run_m[...], tile_m)
    run_s[...] = run_s[...] * jnp.exp(run_m[...] - new_m) + \
        jnp.sum(jnp.exp(x - new_m), axis=1, keepdims=True)
    run_m[...] = new_m

    @pl.when(j == n_v_blocks - 1)
    def _finish():
        ids_ref[...] = best_idx[...]
        lse = run_m[...] + jnp.log(run_s[...])
        sel_ref[...] = jnp.exp(best_logit[...] - lse)


def fused_categorical_cfg(seed, logits, guidance, vocab_limit: int,
                          block_n: int = 256, block_v: int = 2048,
                          interpret: bool = False, gumbel=None):
    """CFG + crop + sample + confidence in ONE streaming pass.

    logits: (2B, S, V_raw) raw model output (any float dtype), first half
    cond / second half uncond (the decode loop's concat order).  Equivalent
    to: combined = uncond + guidance*(cond - uncond) over
    logits[..., :vocab_limit].astype(f32), then categorical + softmax-gather
    — but the combined fp32 tensor, the vocab crop and the cond/uncond split
    copies never touch HBM.

    Under an active ``parallel.kernel_mesh`` the (cond, uncond) pair axis is
    replicated and rows shard over the mesh batch axes (shard_map), so every
    shard holds matching cond/uncond rows and the pallas_call stays local.
    """
    two_b, s, v_raw = logits.shape
    b = two_b // 2
    n = b * s
    x = logits.reshape(2, n, v_raw)
    g = gumbel.reshape(n, v_raw) if gumbel is not None else None

    km = current_kernel_mesh()
    if km is not None and mesh_shard_count(*km) > 1:
        mesh, axes = km
        nsh = mesh_shard_count(mesh, axes)
        pad = (-n) % nsh
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            if g is not None:
                g = jnp.pad(g, ((0, pad), (0, 0)))
        n_loc = x.shape[1] // nsh
        _, n_row_blocks, _, n_v_blocks = _grid_dims(n_loc, v_raw, block_n,
                                                    block_v)

        def body(seed_s, guid_s, x_s, *maybe_g):
            lseed = (jnp.asarray(seed_s, jnp.int32).reshape(())
                     + shard_index(mesh, axes)
                     * jnp.int32(n_row_blocks * n_v_blocks))
            gm = maybe_g[0] if maybe_g else None
            return _fused_categorical_cfg_flat(
                lseed, x_s, guid_s, vocab_limit, block_n=block_n,
                block_v=block_v, interpret=interpret, gumbel=gm)

        args = (jnp.asarray(seed, jnp.int32).reshape(()),
                jnp.asarray(guidance, jnp.float32).reshape(()), x)
        in_specs = (P(), P(), P(None, axes, None))
        if g is not None:
            args += (g,)
            in_specs += (P(axes, None),)
        ids, sel = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=(P(axes), P(axes)),
                                 check_vma=False)(*args)
    else:
        ids, sel = _fused_categorical_cfg_flat(
            seed, x, guidance, vocab_limit, block_n=block_n, block_v=block_v,
            interpret=interpret, gumbel=g)
    return ids[:n].reshape(b, s), sel[:n].reshape(b, s)


@functools.partial(jax.jit, static_argnames=("vocab_limit", "block_n",
                                             "block_v", "interpret"))
def _fused_categorical_cfg_flat(seed, x, guidance, vocab_limit: int,
                                block_n: int = 256, block_v: int = 2048,
                                interpret: bool = False, gumbel=None):
    """Single-shard CFG implementation over (2, N, V_raw) -> ((N,), (N,))."""
    _, n, v_raw = x.shape
    if interpret and gumbel is None:
        # no interpreter lowering for the TPU PRNG — see _fused_categorical_flat
        gumbel = jax.random.gumbel(
            jax.random.PRNGKey(jnp.asarray(seed, jnp.int32).reshape(())),
            (n, v_raw), jnp.float32)
    block_n, _, block_v, n_v_blocks = _grid_dims(n, v_raw, block_n, block_v)
    pad_n = (-n) % block_n
    if pad_n:
        x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0)))
    grid = (x.shape[1] // block_n, n_v_blocks)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    guidance = jnp.asarray(guidance, jnp.float32).reshape(1)
    onchip_rng = gumbel is None
    inputs = [seed, guidance, x]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((2, block_n, block_v), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
    ]
    if not onchip_rng:
        gf = gumbel.reshape(n, v_raw).astype(jnp.float32)
        if pad_n:
            gf = jnp.pad(gf, ((0, pad_n), (0, 0)))
        inputs.append(gf)
        in_specs.append(pl.BlockSpec((block_n, block_v), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
    ids, sel = pl.pallas_call(
        functools.partial(_cfg_kernel, n_v_blocks=n_v_blocks, block_v=block_v,
                          vocab_limit=vocab_limit, onchip_rng=onchip_rng),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x.shape[1], 1), jnp.int32),
            jax.ShapeDtypeStruct((x.shape[1], 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.int32),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    return ids[:n, 0], sel[:n, 0]
