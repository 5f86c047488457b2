"""Fused attention sublayer (Pallas TPU kernel) — the round-4 mega-kernel
attempt (VERDICT round-4 item 4).

Workload: the MaskGiTUViT_v2 trunk at 512px/bs8 decode
(reference muse/modeling_transformer_v2.py:757-792, 22 layers).  The
round-2/3 per-op accounting leaves two bounds XLA cannot close on its own:
the head_dim-64 QK/PV contractions fill the 128x128 MXU <=50%, and a
~2 ms/step tail of sub-30 us fusions (norms, AdaLN applies, softmax chains,
reshapes) pays XLA per-op dispatch overhead hundreds of times per step.

This kernel fuses ONE ENTIRE attention sublayer per launch:

    h   = x + residual                       (prenorm residual, bf16 add)
    n   = rmsnorm(h) * ln_scale              (fp32 variance)
    a   = n * (1 + adaln_scale) + adaln_shift
    qkv = a @ Wqkv          (self)    |  q = a @ Wq            (cross)
    o_h = softmax(q_h k_h^T / sqrt(d)) v_h   (fp32 softmax, per head)
    out = concat(o_h) @ Wout
    -> (out, h)

Grid is one cell per batch element: the (S, 3D) qkv block, all per-head
logits and the attention output never touch HBM, and Mosaic's pipeline
overlaps the next cell's DMA with the current cell's matmuls.  Heads are
processed in PAIRS so every VMEM slice lands on a 128-lane boundary
(head_dim 64 would otherwise force a relayout per access).

The backward is the plain XLA expression's VJP (same policy as
ops/pallas/glu_matmul.py): the kernel targets the decode/serving forward;
training keeps XLA's fusion landscape.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attn_sublayer_self", "attn_sublayer_cross",
           "use_pallas_attn_sublayer", "sublayer_shapes_supported"]

# the research self sublayer sits at ~20 MB scoped VMEM (resident Wqkv 6 MB +
# double-buffered activations + qkv/logits scratch); the compiler's default
# scoped limit is 16 MB, well under the v5e's physical VMEM — raise it
VMEM_LIMIT = 32 * 1024 * 1024
# Mosaic needs headroom beyond the refs/scratch we can count (semaphores,
# retiling buffers); gate admission at 90% of the scoped limit
_VMEM_HEADROOM = 0.9


def _self_vmem_bytes(seq: int, hidden: int, num_heads: int,
                     itemsize: int = 2) -> int:
    """Exact scoped-VMEM demand of the self kernel at these shapes: grid-
    blocked refs are double-buffered by Mosaic's pipeline (x, res, adaln, out,
    resout), full-array weight refs and scratch are resident once."""
    blocked = 4 * seq * hidden * itemsize          # x, res, out, resout
    blocked += 2 * hidden * itemsize               # adaln row (1, 2D)
    weights = (3 * hidden + hidden) * hidden * itemsize   # wqkv + wout
    weights += hidden * itemsize                   # ln scale
    scratch = seq * 3 * hidden * itemsize          # qkv
    scratch += seq * hidden * itemsize             # attn out
    scratch += num_heads * seq * seq * (4 + itemsize)     # logits fp32 + probs
    return 2 * blocked + weights + scratch


def _cross_vmem_bytes(seq: int, hidden: int, num_heads: int, kv_pad: int,
                      itemsize: int = 2) -> int:
    blocked = 4 * seq * hidden * itemsize          # x, res, out, resout
    blocked += 2 * hidden * itemsize               # adaln row
    blocked += kv_pad * 2 * hidden * itemsize      # kv block (1, L, 2D)
    weights = 2 * hidden * hidden * itemsize + hidden * itemsize  # wq, wout, ln
    scratch = 2 * seq * hidden * itemsize          # q + attn out
    scratch += num_heads * seq * kv_pad * (4 + itemsize)  # logits + probs
    return 2 * blocked + weights + scratch

# measured end-to-end at 512px/bs8/12-step: 332.8 ms vs 375.2 ms with the
# kernel off (round-4, muse_perf one-case; chain harness: self sublayer 625
# vs 678 us, staged-softmax restructure) — default ON single-device TPU
_DEFAULT_ON = True


def use_pallas_attn_sublayer() -> bool:
    """Default ON for single-device TPU (measured win at the research trunk,
    STATUS.md round 4); on a multi-device TPU ON only inside a
    ``parallel.kernel_mesh`` whose weights are replicated (dp-only serving —
    ``replicated_weight_mesh``): the sublayer is batch-row-parallel, so under
    ``shard_map`` each device runs the kernel on its local batch rows and the
    sharded program keeps the single-chip win.  On fsdp/tp meshes the
    operands include sharded weight matrices and the kernel stays OFF (XLA
    path; GSPMD manages the weight collectives).
    MUSE_TPU_PALLAS_ATTN_SUBLAYER=0/1 overrides either way."""
    env = os.environ.get("MUSE_TPU_PALLAS_ATTN_SUBLAYER")
    if env is not None:
        return env == "1"
    if not _DEFAULT_ON:
        return False
    try:
        if jax.default_backend() == "tpu":
            if jax.device_count() == 1:
                return True
            from ...parallel.kernel_mesh import replicated_weight_mesh

            return replicated_weight_mesh() is not None
        # Off-TPU the default stays OFF even under MUSE_TPU_PALLAS_INTERPRET:
        # the multichip dryrun flips interpret mode on globally while running
        # pjit over the virtual mesh, and the dryrun model's head_dim is not
        # 64 anyway — the dryrun exercises the sharded kernel entry points
        # directly instead (kernel-level parity checks).  Only the explicit
        # env above enables the fused model path off-TPU.
        return False
    except Exception:
        return False


def sublayer_shapes_supported(seq: int, hidden: int, num_heads: int,
                              kv_len: int | None = None) -> bool:
    """Kernel constraints: 128-aligned hidden, head_dim 64 in even-head pairs
    (every slice then lands on a 128-lane boundary), and the ACTUAL scoped-
    VMEM demand of both kernels at these shapes must fit under VMEM_LIMIT
    with headroom (advisor round-4: the old MAX_SEQ/MAX_HIDDEN box admitted
    seq-512/hidden-1024 self shapes whose logits+probs scratch alone
    overflows Mosaic's scoped allocation).  ``kv_len`` sizes the cross
    kernel's padded context; when None the CLIP-length default (77 -> 128)
    is assumed."""
    if hidden % 128 or num_heads <= 0 or hidden // num_heads != 64:
        return False
    if num_heads % 2:
        return False
    if not (8 <= seq and seq % 8 == 0):
        return False
    kv_pad = ((kv_len or 77) + 127) // 128 * 128
    budget = _VMEM_HEADROOM * VMEM_LIMIT
    return (_self_vmem_bytes(seq, hidden, num_heads) <= budget
            and _cross_vmem_bytes(seq, hidden, num_heads, kv_pad) <= budget)


def _interpret() -> bool:
    from . import interpret_mode

    return interpret_mode() or jax.default_backend() != "tpu"


def _rmsnorm_adaln(x_ref, res_ref, scale_ref, adaln_ref, eps, dim):
    """Shared prologue: bf16 residual add, fp32-variance rmsnorm, AdaLN.

    Precision matches ops/layers.RMSNorm + AdaLNModulation exactly: the
    residual add and the scale/shift run in the input dtype, only the
    variance/rsqrt is fp32."""
    h = x_ref[0] + res_ref[0]
    var = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=-1, keepdims=True)
    n = h * jax.lax.rsqrt(var + eps).astype(h.dtype)
    n = n * scale_ref[:, :].astype(h.dtype)           # (1, D) broadcast
    mapped = adaln_ref[0]                             # (1, 2D)
    a_scale = mapped[:, :dim]
    a_shift = mapped[:, dim:]
    a = n * (1.0 + a_scale.astype(h.dtype)) + a_shift.astype(h.dtype)
    return h, a


def _heads_attention(read_qp, read_kp, read_vp, out_ref, logits_scr, p_scr,
                     seq, num_heads, sm_scale, kv_len=None):
    """All-heads attention in three staged passes: every QK^T dot back to
    back (MXU stays busy, no softmax in between), ONE softmax over the
    stacked (H*S, L) logits (a single vectorized VPU pass instead of H
    serialized chains — the measured fixed cost of the v1 per-head loop),
    then every PV dot.  Heads stay in 128-wide PAIRS so all VMEM slices are
    lane-aligned."""
    for hp in range(num_heads // 2):
        qp = read_qp(hp)                      # (S, 128) = heads 2hp, 2hp+1
        kp = read_kp(hp)                      # (L, 128)
        for j in (0, 1):
            h_idx = 2 * hp + j
            q = qp[:, j * 64:(j + 1) * 64]
            k = kp[:, j * 64:(j + 1) * 64]
            logits_scr[h_idx * seq:(h_idx + 1) * seq, :] = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
    logits = logits_scr[:, :]
    if kv_len is not None and kv_len < logits.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, jnp.finfo(jnp.float32).min)
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    p_scr[:, :] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(p_scr.dtype)
    for hp in range(num_heads // 2):
        vp = read_vp(hp)                      # (L, 128)
        outs = []
        for j in (0, 1):
            h_idx = 2 * hp + j
            outs.append(jax.lax.dot_general(
                p_scr[h_idx * seq:(h_idx + 1) * seq, :],
                vp[:, j * 64:(j + 1) * 64],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype))
        out_ref[:, hp * 128:(hp + 1) * 128] = jnp.concatenate(outs, axis=1)


def _self_kernel(x_ref, res_ref, scale_ref, adaln_ref, wqkv_ref, wout_ref,
                 out_ref, resout_ref, qkv_scr, attn_scr, logits_scr, p_scr,
                 *, num_heads, eps, dim):
    h, a = _rmsnorm_adaln(x_ref, res_ref, scale_ref, adaln_ref, eps, dim)
    resout_ref[0] = h
    qkv_scr[:, :] = jax.lax.dot_general(
        a, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    _heads_attention(
        lambda hp: qkv_scr[:, hp * 128:(hp + 1) * 128],
        lambda hp: qkv_scr[:, dim + hp * 128:dim + (hp + 1) * 128],
        lambda hp: qkv_scr[:, 2 * dim + hp * 128:2 * dim + (hp + 1) * 128],
        attn_scr, logits_scr, p_scr, x_ref.shape[1], num_heads,
        1.0 / math.sqrt(dim // num_heads))
    out_ref[0] = jax.lax.dot_general(
        attn_scr[:, :], wout_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)


def _cross_kernel(x_ref, res_ref, scale_ref, adaln_ref, wq_ref, wout_ref,
                  kv_ref, out_ref, resout_ref, q_scr, attn_scr, logits_scr,
                  p_scr, *, num_heads, eps, dim, kv_len):
    h, a = _rmsnorm_adaln(x_ref, res_ref, scale_ref, adaln_ref, eps, dim)
    resout_ref[0] = h
    q_scr[:, :] = jax.lax.dot_general(
        a, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    _heads_attention(
        lambda hp: q_scr[:, hp * 128:(hp + 1) * 128],
        lambda hp: kv_ref[0, :, hp * 128:(hp + 1) * 128],
        lambda hp: kv_ref[0, :, dim + hp * 128:dim + (hp + 1) * 128],
        attn_scr, logits_scr, p_scr, x_ref.shape[1], num_heads,
        1.0 / math.sqrt(dim // num_heads), kv_len=kv_len)
    out_ref[0] = jax.lax.dot_general(
        attn_scr[:, :], wout_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)


def _bsd_spec(seq, dim):
    return pl.BlockSpec((1, seq, dim), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _row_spec(cols):
    # (B, 1, cols) with a (1, 1, cols) block: Mosaic requires the last two
    # block dims to be (8,128)-divisible or equal to the array dims — a flat
    # (1, cols) block over (B, cols) violates the sublane rule
    return pl.BlockSpec((1, 1, cols), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _self_primal(x, res, ln_scale, adaln, wqkv, wout, num_heads, eps,
                 interpret):
    b, s, d = x.shape
    out, res_out = pl.pallas_call(
        functools.partial(_self_kernel, num_heads=num_heads, eps=eps, dim=d),
        grid=(b,),
        in_specs=[_bsd_spec(s, d), _bsd_spec(s, d),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  _row_spec(2 * d), _full_spec(), _full_spec()],
        out_specs=(_bsd_spec(s, d), _bsd_spec(s, d)),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        scratch_shapes=[pltpu.VMEM((s, 3 * d), x.dtype),
                        pltpu.VMEM((s, d), x.dtype),
                        pltpu.VMEM((num_heads * s, s), jnp.float32),
                        pltpu.VMEM((num_heads * s, s), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, res, ln_scale.reshape(1, d), adaln.reshape(b, 1, 2 * d), wqkv, wout)
    return out, res_out


def _cross_primal(x, res, ln_scale, adaln, wq, wout, kv, num_heads, eps,
                  kv_len, interpret):
    b, s, d = x.shape
    l_pad = kv.shape[1]
    out, res_out = pl.pallas_call(
        functools.partial(_cross_kernel, num_heads=num_heads, eps=eps, dim=d,
                          kv_len=kv_len),
        grid=(b,),
        in_specs=[_bsd_spec(s, d), _bsd_spec(s, d),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  _row_spec(2 * d), _full_spec(), _full_spec(),
                  _bsd_spec(l_pad, 2 * d)],
        out_specs=(_bsd_spec(s, d), _bsd_spec(s, d)),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        scratch_shapes=[pltpu.VMEM((s, d), x.dtype),
                        pltpu.VMEM((s, d), x.dtype),
                        pltpu.VMEM((num_heads * s, l_pad), jnp.float32),
                        pltpu.VMEM((num_heads * s, l_pad), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, res, ln_scale.reshape(1, d), adaln.reshape(b, 1, 2 * d), wq, wout, kv)
    return out, res_out


def _xla_attention(q, k, v, num_heads, kv_len=None):
    b, s, d = q.shape
    hd = d // num_heads
    lk = k.shape[1]
    q = q.reshape(b, s, num_heads, hd)
    k = k.reshape(b, lk, num_heads, hd)
    v = v.reshape(b, lk, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if kv_len is not None and kv_len < lk:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 3)
        logits = jnp.where(col < kv_len, logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, d)


def _xla_ref_self(x, res, ln_scale, adaln, wqkv, wout, num_heads, eps):
    """Pure-XLA expression of the self sublayer (backward + fallback parity
    oracle); precision mirrors RMSNorm/AdaLNModulation/Attention exactly."""
    h = x + res
    var = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=-1, keepdims=True)
    n = h * jax.lax.rsqrt(var + eps).astype(h.dtype)
    n = n * ln_scale.astype(h.dtype)
    a_scale, a_shift = jnp.split(adaln, 2, axis=-1)
    a = n * (1.0 + a_scale[:, None, :].astype(h.dtype)) \
        + a_shift[:, None, :].astype(h.dtype)
    qkv = jnp.dot(a, wqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = _xla_attention(q, k, v, num_heads)
    return jnp.dot(attn, wout), h


def _xla_ref_cross(x, res, ln_scale, adaln, wq, wout, kv, num_heads, eps,
                   kv_len):
    h = x + res
    var = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=-1, keepdims=True)
    n = h * jax.lax.rsqrt(var + eps).astype(h.dtype)
    n = n * ln_scale.astype(h.dtype)
    a_scale, a_shift = jnp.split(adaln, 2, axis=-1)
    a = n * (1.0 + a_scale[:, None, :].astype(h.dtype)) \
        + a_shift[:, None, :].astype(h.dtype)
    q = jnp.dot(a, wq)
    k, v = jnp.split(kv, 2, axis=-1)
    attn = _xla_attention(q, k, v, num_heads, kv_len=kv_len)
    return jnp.dot(attn, wout), h


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _self(x, res, ln_scale, adaln, wqkv, wout, num_heads, eps, interpret):
    return _self_primal(x, res, ln_scale, adaln, wqkv, wout, num_heads, eps,
                        interpret)


def _self_fwd(x, res, ln_scale, adaln, wqkv, wout, num_heads, eps, interpret):
    return (_self_primal(x, res, ln_scale, adaln, wqkv, wout, num_heads, eps,
                         interpret),
            (x, res, ln_scale, adaln, wqkv, wout))


def _self_bwd(num_heads, eps, interpret, saved, g):
    _, vjp = jax.vjp(
        lambda *a: _xla_ref_self(*a, num_heads=num_heads, eps=eps), *saved)
    return vjp(g)


_self.defvjp(_self_fwd, _self_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _cross(x, res, ln_scale, adaln, wq, wout, kv, num_heads, eps, kv_len,
           interpret):
    return _cross_primal(x, res, ln_scale, adaln, wq, wout, kv, num_heads,
                         eps, kv_len, interpret)


def _cross_fwd(x, res, ln_scale, adaln, wq, wout, kv, num_heads, eps, kv_len,
               interpret):
    return (_cross_primal(x, res, ln_scale, adaln, wq, wout, kv, num_heads,
                          eps, kv_len, interpret),
            (x, res, ln_scale, adaln, wq, wout, kv))


def _cross_bwd(num_heads, eps, kv_len, interpret, saved, g):
    _, vjp = jax.vjp(
        lambda *a: _xla_ref_cross(*a, num_heads=num_heads, eps=eps,
                                  kv_len=kv_len), *saved)
    return vjp(g)


_cross.defvjp(_cross_fwd, _cross_bwd)


def attn_sublayer_self(x, res, ln_scale, adaln, wqkv, wout, num_heads: int,
                       eps: float = 1e-6):
    """Fused [rmsnorm -> AdaLN -> qkv matmul -> attention -> out proj] for
    the self-attention sublayer.  x, res: (B, S, D); ln_scale: (D,);
    adaln: (B, 2D) mapped scale|shift; wqkv: (D, 3D); wout: (D, D).
    Returns (attention_output, prenorm_residual) like the unfused chain
    (ops/layers.py RMSNorm + AdaLNModulation + Attention).  ``res`` may be
    None (first trunk layer).

    Inside a dp-only ``parallel.kernel_mesh`` (replicated_weight_mesh) the
    batch shards over the mesh batch axes via ``shard_map``: each device
    runs the kernel on its local rows, weights stay replicated, and no
    collective is emitted around the opaque ``pallas_call``."""
    if res is None:
        res = jnp.zeros_like(x)
    interpret = _interpret()
    from ...parallel.kernel_mesh import mesh_shard_count, replicated_weight_mesh

    km = replicated_weight_mesh()
    if km is not None:
        mesh, axes = km
        nsh = mesh_shard_count(mesh, axes)
        if x.shape[0] % nsh == 0:
            from jax.sharding import PartitionSpec as P

            body = lambda *a: _self(*a, num_heads, eps, interpret)
            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(axes, None, None), P(axes, None, None), P(),
                          P(axes, None), P(), P()),
                out_specs=(P(axes, None, None), P(axes, None, None)),
                check_vma=False)(x, res, ln_scale, adaln, wqkv, wout)
        # batch not divisible by the shard count: the plain pallas_call would
        # make GSPMD all-gather — use the XLA expression instead
        return _xla_ref_self(x, res, ln_scale, adaln, wqkv, wout, num_heads,
                             eps)
    return _self(x, res, ln_scale, adaln, wqkv, wout, num_heads, eps,
                 interpret)


def attn_sublayer_cross(x, res, ln_scale, adaln, wq, wout, kv, num_heads: int,
                        eps: float = 1e-6):
    """Cross-attention variant: ``kv`` is the precomputed (B, L, 2D)
    [k|v] projection of the text context (Attention precompute_kv); L pads
    internally to a 128 multiple with masked softmax columns.

    Mesh behavior matches attn_sublayer_self: inside a dp-only
    ``parallel.kernel_mesh`` the batch (x, res, adaln, kv) shards over the
    mesh batch axes via ``shard_map`` with replicated weights."""
    if res is None:
        res = jnp.zeros_like(x)
    kv_len = kv.shape[1]
    pad = (-kv_len) % 128
    if pad:
        kv = jnp.pad(kv, ((0, 0), (0, pad), (0, 0)))
    interpret = _interpret()
    from ...parallel.kernel_mesh import mesh_shard_count, replicated_weight_mesh

    km = replicated_weight_mesh()
    if km is not None:
        mesh, axes = km
        nsh = mesh_shard_count(mesh, axes)
        if x.shape[0] % nsh == 0 and kv.shape[0] == x.shape[0]:
            from jax.sharding import PartitionSpec as P

            body = lambda *a: _cross(*a, num_heads, eps, kv_len, interpret)
            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(axes, None, None), P(axes, None, None), P(),
                          P(axes, None), P(), P(), P(axes, None, None)),
                out_specs=(P(axes, None, None), P(axes, None, None)),
                check_vma=False)(x, res, ln_scale, adaln, wq, wout, kv)
        return _xla_ref_cross(x, res, ln_scale, adaln, wq, wout, kv,
                              num_heads, eps, kv_len)
    return _cross(x, res, ln_scale, adaln, wq, wout, kv, num_heads, eps,
                  kv_len, interpret)
