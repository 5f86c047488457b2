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
(head_dim 64 would otherwise force a relayout per access).  The softmax
runs in STAGES of head pairs (round 5): small trunks take one all-heads
stage (the round-4 behavior, bit-identical), while the seq-512/hidden-1024
and seq-1024 full-resolution trunks (configs/research_run_512.yaml,
reference muse/modeling_transformer_v2.py:757-792 at seq 1024) shrink the
stage until the logits scratch fits scoped VMEM instead of falling back to
XLA.

The backward (round 5) is a second pair of Pallas kernels with the same
one-cell-per-batch-element structure: they recompute the forward in VMEM
(remat inside the kernel — the fwd saves only its INPUTS), produce all
data-side grads in one launch, and hand the two weight-grad contractions
((D, B*S) x (B*S, 3D) — already near-peak MXU shapes) back to XLA.  XLA's
VJP of the unfused expression was the measured 86.7 ms / 33% of the bs32
train step (benchmark/profile_train_step.py); the same expression remains
the fallback and parity oracle (MUSE_TPU_PALLAS_ATTN_BWD=0).
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
           "use_pallas_attn_sublayer", "use_pallas_attn_bwd",
           "sublayer_shapes_supported"]

# the research self sublayer sits at ~20 MB scoped VMEM (resident Wqkv 6 MB +
# double-buffered activations + qkv/logits scratch); the compiler's default
# scoped limit is 16 MB, well under the v5e's physical VMEM — raise it
VMEM_LIMIT = 32 * 1024 * 1024
# large trunks (seq-512/hidden-1024, the research_run_512 seq-1024 no-
# downsample config) need more scoped VMEM even with single-pair softmax
# stages; half the v5e's 128 MB physical VMEM keeps Mosaic's own buffers safe
VMEM_LIMIT_LARGE = 64 * 1024 * 1024
# Mosaic needs headroom beyond the refs/scratch we can count (semaphores,
# retiling buffers); gate admission at 90% of the scoped limit
_VMEM_HEADROOM = 0.9


def _self_vmem_bytes(seq: int, hidden: int, num_heads: int,
                     stage_pairs: int | None = None,
                     itemsize: int = 2) -> int:
    """Exact scoped-VMEM demand of the self kernel at these shapes: grid-
    blocked refs are double-buffered by Mosaic's pipeline (x, res, adaln, out,
    resout), full-array weight refs and scratch are resident once.  The
    logits/probs scratch covers ``stage_pairs`` head PAIRS (round 5: the
    softmax runs in stages so big trunks fit; None = all heads at once)."""
    sp = stage_pairs or num_heads // 2
    blocked = 4 * seq * hidden * itemsize          # x, res, out, resout
    blocked += 2 * hidden * itemsize               # adaln rows (2, D)
    weights = (3 * hidden + hidden) * hidden * itemsize   # wqkv + wout
    weights += hidden * itemsize                   # ln scale
    scratch = seq * 3 * hidden * itemsize          # qkv
    scratch += seq * hidden * itemsize             # attn out
    scratch += sp * 2 * seq * seq * (4 + itemsize)        # logits fp32 + probs
    return 2 * blocked + weights + scratch


def _cross_vmem_bytes(seq: int, hidden: int, num_heads: int, kv_pad: int,
                      stage_pairs: int | None = None,
                      itemsize: int = 2) -> int:
    sp = stage_pairs or num_heads // 2
    blocked = 4 * seq * hidden * itemsize          # x, res, out, resout
    blocked += 2 * hidden * itemsize               # adaln row
    blocked += kv_pad * 2 * hidden * itemsize      # kv block (1, L, 2D)
    weights = 2 * hidden * hidden * itemsize + hidden * itemsize  # wq, wout, ln
    scratch = 2 * seq * hidden * itemsize          # q + attn out
    scratch += sp * 2 * seq * kv_pad * (4 + itemsize)     # logits + probs
    return 2 * blocked + weights + scratch


def _pick_stage(bytes_for_stage, num_heads: int):
    """Largest head-pair softmax stage (and the scoped-VMEM limit it needs)
    whose footprint fits.  The 32 MB limit is tried first so every round-4
    measured shape keeps its exact kernel configuration; VMEM_LIMIT_LARGE
    engages only for trunks nothing fits under 32 MB (seq-512/hidden-1024,
    seq-1024 — round-5 verdict item 4).  Returns (stage_pairs, limit) or
    None when even single-pair stages overflow."""
    npairs = num_heads // 2
    for limit in (VMEM_LIMIT, VMEM_LIMIT_LARGE):
        budget = _VMEM_HEADROOM * limit
        for sp in range(npairs, 0, -1):
            if bytes_for_stage(sp) <= budget:
                return sp, limit
    return None

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
                              kv_len: int | None = None,
                              itemsize: int = 2) -> bool:
    """Kernel constraints: 128-aligned hidden, head_dim 64 in even-head pairs
    (every slice then lands on a 128-lane boundary), and the ACTUAL scoped-
    VMEM demand of both kernels at these shapes must fit — at SOME head-pair
    softmax staging — under a scoped limit with headroom (advisor round-4:
    the old MAX_SEQ/MAX_HIDDEN box admitted seq-512/hidden-1024 self shapes
    whose logits+probs scratch alone overflows Mosaic's scoped allocation;
    round 5 stages the softmax so those trunks and the seq-1024 full-res
    config fit instead of falling back).  ``kv_len`` sizes the cross
    kernel's padded context; when None the CLIP-length default (77 -> 128)
    is assumed.  ``itemsize`` is the activation dtype's byte width — fp32
    trunks (benchmark_models.py sweeps them) double most of the footprint,
    so shapes that fit in bf16 can overflow in fp32 (measured: the d=1024
    cross backward needs 36.7 MB fp32 vs the 32 MB scoped limit)."""
    if hidden % 128 or num_heads <= 0 or hidden // num_heads != 64:
        return False
    if num_heads % 2:
        return False
    if not (8 <= seq and seq % 8 == 0):
        return False
    kv_pad = ((kv_len or 77) + 127) // 128 * 128
    return (_pick_stage(lambda sp: _self_vmem_bytes(
                seq, hidden, num_heads, sp, itemsize), num_heads) is not None
            and _pick_stage(lambda sp: _cross_vmem_bytes(
                seq, hidden, num_heads, kv_pad, sp,
                itemsize), num_heads) is not None)


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
    # adaln arrives as (2, D) so scale/shift are SUBLANE slices: a lane slice
    # (mapped[:, dim:]) carries a lane offset Mosaic cannot relayout for the
    # (1, D) -> (S, D) broadcast at D < 512 ("Invalid input layout",
    # found by the hidden-256 midscale protocol; D = 1024 happened to work)
    mapped = adaln_ref[0]                             # (2, D)
    a_scale = mapped[0:1, :]
    a_shift = mapped[1:2, :]
    a = n * (1.0 + a_scale.astype(h.dtype)) + a_shift.astype(h.dtype)
    return h, a


def _stage_softmax(logits_scr, p_scr, rows, kv_len=None):
    """Masked softmax over the stage's stacked (rows, L) logits: ONE
    vectorized VPU pass (instead of per-head serialized chains — the
    measured fixed cost of the v1 per-head loop).  Leaves the f32 result in
    logits_scr (the backward reads it) and its cast in p_scr."""
    logits = logits_scr[:rows, :]
    if kv_len is not None and kv_len < logits.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, jnp.finfo(jnp.float32).min)
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    pf = e / jnp.sum(e, axis=-1, keepdims=True)
    logits_scr[:rows, :] = pf
    p_scr[:rows, :] = pf.astype(p_scr.dtype)


def _heads_attention(read_qp, read_kp, read_vp, write_out, logits_scr, p_scr,
                     seq, num_heads, sm_scale, stage_pairs, kv_len=None):
    """All-heads attention in staged passes over ``stage_pairs`` head PAIRS:
    within a stage every QK^T dot runs back to back (MXU stays busy, no
    softmax in between), then ONE softmax over the stage's stacked
    (pairs*2*S, L) logits, then every PV dot.  ``stage_pairs == num_heads//2``
    is the round-4 all-heads behavior; smaller stages reuse the same scratch
    rows so the seq-512/hidden-1024 and seq-1024 trunks fit VMEM (round-5
    verdict item 4).  Heads stay in 128-wide PAIRS so all VMEM slices are
    lane-aligned."""
    npairs = num_heads // 2
    for base in range(0, npairs, stage_pairs):
        pairs = min(stage_pairs, npairs - base)
        for gi in range(pairs):
            qp = read_qp(base + gi)           # (S, 128) = heads 2hp, 2hp+1
            kp = read_kp(base + gi)           # (L, 128)
            for j in (0, 1):
                row = (2 * gi + j) * seq
                logits_scr[row:row + seq, :] = jax.lax.dot_general(
                    qp[:, j * 64:(j + 1) * 64], kp[:, j * 64:(j + 1) * 64],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
        _stage_softmax(logits_scr, p_scr, pairs * 2 * seq, kv_len=kv_len)
        for gi in range(pairs):
            vp = read_vp(base + gi)           # (L, 128)
            outs = []
            for j in (0, 1):
                row = (2 * gi + j) * seq
                outs.append(jax.lax.dot_general(
                    p_scr[row:row + seq, :], vp[:, j * 64:(j + 1) * 64],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(p_scr.dtype))
            write_out(base + gi, jnp.concatenate(outs, axis=1))


def _write_cols(ref, hp, v):
    ref[:, hp * 128:(hp + 1) * 128] = v


def _self_kernel(x_ref, res_ref, scale_ref, adaln_ref, wqkv_ref, wout_ref,
                 out_ref, resout_ref, qkv_scr, attn_scr, logits_scr, p_scr,
                 *, num_heads, eps, dim, stage_pairs):
    h, a = _rmsnorm_adaln(x_ref, res_ref, scale_ref, adaln_ref, eps, dim)
    resout_ref[0] = h
    qkv_scr[:, :] = jax.lax.dot_general(
        a, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    _heads_attention(
        lambda hp: qkv_scr[:, hp * 128:(hp + 1) * 128],
        lambda hp: qkv_scr[:, dim + hp * 128:dim + (hp + 1) * 128],
        lambda hp: qkv_scr[:, 2 * dim + hp * 128:2 * dim + (hp + 1) * 128],
        functools.partial(_write_cols, attn_scr),
        logits_scr, p_scr, x_ref.shape[1], num_heads,
        1.0 / math.sqrt(dim // num_heads), stage_pairs)
    out_ref[0] = jax.lax.dot_general(
        attn_scr[:, :], wout_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)


def _cross_kernel(x_ref, res_ref, scale_ref, adaln_ref, wq_ref, wout_ref,
                  kv_ref, out_ref, resout_ref, q_scr, attn_scr, logits_scr,
                  p_scr, *, num_heads, eps, dim, kv_len, stage_pairs):
    h, a = _rmsnorm_adaln(x_ref, res_ref, scale_ref, adaln_ref, eps, dim)
    resout_ref[0] = h
    q_scr[:, :] = jax.lax.dot_general(
        a, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    _heads_attention(
        lambda hp: q_scr[:, hp * 128:(hp + 1) * 128],
        lambda hp: kv_ref[0, :, hp * 128:(hp + 1) * 128],
        lambda hp: kv_ref[0, :, dim + hp * 128:dim + (hp + 1) * 128],
        functools.partial(_write_cols, attn_scr),
        logits_scr, p_scr, x_ref.shape[1], num_heads,
        1.0 / math.sqrt(dim // num_heads), stage_pairs, kv_len=kv_len)
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


def _adaln_spec(dim):
    # adaln as (B, 2, D): row 0 = scale, row 1 = shift, so the kernel slices
    # SUBLANES (lane-offset slices of a (1, 2D) row fail Mosaic relayout for
    # the AdaLN broadcast at D < 512)
    return pl.BlockSpec((1, 2, dim), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _self_primal(x, res, ln_scale, adaln, wqkv, wout, num_heads, eps,
                 interpret):
    b, s, d = x.shape
    sp, limit = (_pick_stage(lambda p: _self_vmem_bytes(
                     s, d, num_heads, p, x.dtype.itemsize),
                     num_heads) or (num_heads // 2, VMEM_LIMIT))
    out, res_out = pl.pallas_call(
        functools.partial(_self_kernel, num_heads=num_heads, eps=eps, dim=d,
                          stage_pairs=sp),
        grid=(b,),
        in_specs=[_bsd_spec(s, d), _bsd_spec(s, d),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  _adaln_spec(d), _full_spec(), _full_spec()],
        out_specs=(_bsd_spec(s, d), _bsd_spec(s, d)),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        scratch_shapes=[pltpu.VMEM((s, 3 * d), x.dtype),
                        pltpu.VMEM((s, d), x.dtype),
                        pltpu.VMEM((sp * 2 * s, s), jnp.float32),
                        pltpu.VMEM((sp * 2 * s, s), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=limit),
        interpret=interpret,
    )(x, res, ln_scale.reshape(1, d), adaln.reshape(b, 2, d), wqkv, wout)
    return out, res_out


def _cross_primal(x, res, ln_scale, adaln, wq, wout, kv, num_heads, eps,
                  kv_len, interpret):
    b, s, d = x.shape
    l_pad = kv.shape[1]
    sp, limit = (_pick_stage(lambda p: _cross_vmem_bytes(
                     s, d, num_heads, l_pad, p, x.dtype.itemsize),
                     num_heads) or (num_heads // 2, VMEM_LIMIT))
    out, res_out = pl.pallas_call(
        functools.partial(_cross_kernel, num_heads=num_heads, eps=eps, dim=d,
                          kv_len=kv_len, stage_pairs=sp),
        grid=(b,),
        in_specs=[_bsd_spec(s, d), _bsd_spec(s, d),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  _adaln_spec(d), _full_spec(), _full_spec(),
                  _bsd_spec(l_pad, 2 * d)],
        out_specs=(_bsd_spec(s, d), _bsd_spec(s, d)),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        scratch_shapes=[pltpu.VMEM((s, d), x.dtype),
                        pltpu.VMEM((s, d), x.dtype),
                        pltpu.VMEM((sp * 2 * s, l_pad), jnp.float32),
                        pltpu.VMEM((sp * 2 * s, l_pad), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=limit),
        interpret=interpret,
    )(x, res, ln_scale.reshape(1, d), adaln.reshape(b, 2, d), wq, wout, kv)
    return out, res_out


# ---------------------------------------------------------------------------
# Fused Pallas BACKWARD (round-5 verdict item 1): the custom_vjp backward was
# "the plain XLA expression's VJP", which re-runs the UNFUSED forward and
# materializes every intermediate in HBM — measured 86.7 ms/step (33%) of the
# bs32 train step (benchmark/profile_train_step.py).  These kernels recompute
# the forward IN VMEM per batch element (the fwd kernel's staged-softmax
# structure), produce all data-side grads, and materialize only the three
# (S, D)-sized tensors the weight grads need — the weight-grad matmuls
# themselves stay in XLA, where (D, B*S) x (B*S, 3D) contractions already run
# near peak.
# ---------------------------------------------------------------------------


def _rms_adaln_bwd(da, h, hhat, r, scale_ref, adaln_ref, g_res, dim,
                   dadaln_ref, dln_ref, dx_ref):
    """Shared backward epilogue: AdaLN -> affine-rmsnorm -> residual.
    Writes dadaln (2, D), dln partial (1, D, f32) and dx (= dres)."""
    mapped = adaln_ref[0]                                   # (2, D)
    a_scale = mapped[0:1, :].astype(jnp.float32)
    n2 = (hhat * scale_ref[:, :].astype(hhat.dtype)).astype(jnp.float32)
    da_f = da.astype(jnp.float32)
    ds = jnp.sum(da_f * n2, axis=0, keepdims=True)          # (1, D)
    dt = jnp.sum(da_f, axis=0, keepdims=True)
    dadaln_ref[0] = jnp.concatenate([ds, dt], axis=0).astype(dadaln_ref.dtype)
    dn2 = da_f * (1.0 + a_scale)
    hhat_f = hhat.astype(jnp.float32)
    dln_ref[0] = jnp.sum(dn2 * hhat_f, axis=0, keepdims=True)
    dn = dn2 * scale_ref[:, :].astype(jnp.float32)
    # rmsnorm bwd: dh = r * (dn - hhat * mean_D(dn * hhat))
    dh = r * (dn - hhat_f * jnp.mean(dn * hhat_f, axis=-1, keepdims=True))
    dx_ref[0] = (dh.astype(dx_ref.dtype) + g_res[0]).astype(dx_ref.dtype)


def _heads_attention_bwd(read_qp, read_kp, read_vp, write_out, write_dq,
                         write_dk, write_dv, dattn, logits_scr, p_scr, seq,
                         num_heads, sm_scale, stage_pairs, kv_len=None):
    """Staged attention recompute + backward, mirroring _heads_attention's
    head-pair stages: per stage the group's logits are recomputed and
    softmaxed (f32 result lands in ``logits_scr``, its cast in ``p_scr``),
    then per head pair the forward output (for XLA's dwout) and
    dp -> softmax bwd -> dq/dk/dv.  Masked-out columns have p == 0 so their
    dl is 0 and dk/dv rows beyond kv_len stay 0 automatically."""
    npairs = num_heads // 2
    for base in range(0, npairs, stage_pairs):
        pairs = min(stage_pairs, npairs - base)
        for gi in range(pairs):
            qp = read_qp(base + gi)
            kp = read_kp(base + gi)
            for j in (0, 1):
                row = (2 * gi + j) * seq
                logits_scr[row:row + seq, :] = jax.lax.dot_general(
                    qp[:, j * 64:(j + 1) * 64], kp[:, j * 64:(j + 1) * 64],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
        _stage_softmax(logits_scr, p_scr, pairs * 2 * seq, kv_len=kv_len)
        for gi in range(pairs):
            hp = base + gi
            kp = read_kp(hp)
            vp = read_vp(hp)
            qp = read_qp(hp)
            outs, dqs, dks, dvs = [], [], [], []
            for j in (0, 1):
                h_idx = 2 * hp + j
                rows = slice((2 * gi + j) * seq, (2 * gi + j + 1) * seq)
                dattn_h = dattn[:, h_idx * 64:(h_idx + 1) * 64]
                p_h = p_scr[rows, :]
                outs.append(jax.lax.dot_general(
                    p_h, vp[:, j * 64:(j + 1) * 64],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(p_scr.dtype))
                dvs.append(jax.lax.dot_general(
                    p_h, dattn_h, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(p_scr.dtype))
                dp = jax.lax.dot_general(
                    dattn_h, vp[:, j * 64:(j + 1) * 64],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)            # (S, L)
                pf = logits_scr[rows, :]
                dl = (pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
                      * sm_scale).astype(p_scr.dtype)
                dqs.append(jax.lax.dot_general(
                    dl, kp[:, j * 64:(j + 1) * 64],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(p_scr.dtype))
                dks.append(jax.lax.dot_general(
                    dl, qp[:, j * 64:(j + 1) * 64],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(p_scr.dtype))
            write_out(hp, jnp.concatenate(outs, axis=1))
            write_dq(hp, jnp.concatenate(dqs, axis=1))
            write_dk(hp, jnp.concatenate(dks, axis=1))
            write_dv(hp, jnp.concatenate(dvs, axis=1))


def _recompute_fwd(x_ref, res_ref, scale_ref, adaln_ref, eps, dim):
    """Forward recompute keeping the rmsnorm residuals the backward needs."""
    h = x_ref[0] + res_ref[0]
    var = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    hhat = h * r.astype(h.dtype)
    n2 = hhat * scale_ref[:, :].astype(h.dtype)
    mapped = adaln_ref[0]                             # (2, D), sublane slices
    a = n2 * (1.0 + mapped[0:1, :].astype(h.dtype)) \
        + mapped[1:2, :].astype(h.dtype)
    return h, hhat, r, a


def _write_row_cols(ref, off, hp, v):
    ref[0, :, off + hp * 128:off + (hp + 1) * 128] = v


def _self_bwd_kernel(x_ref, res_ref, scale_ref, adaln_ref, wqkv_ref, wout_ref,
                     gout_ref, gres_ref, dx_ref, dadaln_ref, dln_ref,
                     a_ref, dqkv_ref, attn_ref, qkv_scr, logits_scr, p_scr,
                     *, num_heads, eps, dim, stage_pairs):
    seq = x_ref.shape[1]
    sm_scale = 1.0 / math.sqrt(dim // num_heads)
    h, hhat, r, a = _recompute_fwd(x_ref, res_ref, scale_ref, adaln_ref, eps,
                                   dim)
    a_ref[0] = a
    qkv_scr[:, :] = jax.lax.dot_general(
        a, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    dattn = jax.lax.dot_general(
        gout_ref[0], wout_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    _heads_attention_bwd(
        lambda hp: qkv_scr[:, hp * 128:(hp + 1) * 128],
        lambda hp: qkv_scr[:, dim + hp * 128:dim + (hp + 1) * 128],
        lambda hp: qkv_scr[:, 2 * dim + hp * 128:2 * dim + (hp + 1) * 128],
        functools.partial(_write_row_cols, attn_ref, 0),
        functools.partial(_write_row_cols, dqkv_ref, 0),
        functools.partial(_write_row_cols, dqkv_ref, dim),
        functools.partial(_write_row_cols, dqkv_ref, 2 * dim),
        dattn, logits_scr, p_scr, seq, num_heads, sm_scale, stage_pairs)
    da = jax.lax.dot_general(
        dqkv_ref[0], wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    _rms_adaln_bwd(da, h, hhat, r, scale_ref, adaln_ref, gres_ref, dim,
                   dadaln_ref, dln_ref, dx_ref)


def _cross_bwd_kernel(x_ref, res_ref, scale_ref, adaln_ref, wq_ref, wout_ref,
                      kv_ref, gout_ref, gres_ref, dx_ref, dadaln_ref, dln_ref,
                      a_ref, dq_ref, attn_ref, dkv_ref, q_scr, logits_scr,
                      p_scr, *, num_heads, eps, dim, kv_len, stage_pairs):
    seq = x_ref.shape[1]
    sm_scale = 1.0 / math.sqrt(dim // num_heads)
    h, hhat, r, a = _recompute_fwd(x_ref, res_ref, scale_ref, adaln_ref, eps,
                                   dim)
    a_ref[0] = a
    q_scr[:, :] = jax.lax.dot_general(
        a, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    dattn = jax.lax.dot_general(
        gout_ref[0], wout_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    _heads_attention_bwd(
        lambda hp: q_scr[:, hp * 128:(hp + 1) * 128],
        lambda hp: kv_ref[0, :, hp * 128:(hp + 1) * 128],
        lambda hp: kv_ref[0, :, dim + hp * 128:dim + (hp + 1) * 128],
        functools.partial(_write_row_cols, attn_ref, 0),
        functools.partial(_write_row_cols, dq_ref, 0),
        functools.partial(_write_row_cols, dkv_ref, 0),
        functools.partial(_write_row_cols, dkv_ref, dim),
        dattn, logits_scr, p_scr, seq, num_heads, sm_scale, stage_pairs,
        kv_len=kv_len)
    da = jax.lax.dot_general(
        dq_ref[0], wq_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)
    _rms_adaln_bwd(da, h, hhat, r, scale_ref, adaln_ref, gres_ref, dim,
                   dadaln_ref, dln_ref, dx_ref)


def use_pallas_attn_bwd() -> bool:
    """Fused backward default ON wherever the forward kernel ran (the bwd is
    only reachable through the custom_vjp); MUSE_TPU_PALLAS_ATTN_BWD=0
    restores the plain-XLA-expression VJP."""
    return os.environ.get("MUSE_TPU_PALLAS_ATTN_BWD", "1") == "1"


def _self_bwd_vmem_bytes(seq, hidden, num_heads, stage_pairs=None,
                         itemsize=2):
    sp = stage_pairs or num_heads // 2
    blocked = 8 * seq * hidden * itemsize          # x,res,gout,gres,dx,a,attn
    blocked += seq * 3 * hidden * itemsize         # dqkv out
    blocked += (2 + 4) * hidden * itemsize         # adaln + dadaln + scale
    blocked += hidden * 4                          # dln f32
    weights = 4 * hidden * hidden * itemsize + hidden * itemsize
    scratch = seq * 3 * hidden * itemsize          # qkv
    scratch += sp * 2 * seq * seq * (4 + itemsize)     # p f32 + p bf16
    return 2 * blocked + weights + scratch


def _cross_bwd_vmem_bytes(seq, hidden, num_heads, kv_pad, stage_pairs=None,
                          itemsize=2):
    sp = stage_pairs or num_heads // 2
    blocked = 8 * seq * hidden * itemsize          # x,res,gout,gres,dx,a,attn
    blocked += seq * hidden * itemsize             # dq out
    blocked += 2 * kv_pad * 2 * hidden * itemsize  # kv in + dkv out
    blocked += (2 + 4) * hidden * itemsize + hidden * 4
    weights = 2 * hidden * hidden * itemsize + hidden * itemsize
    scratch = seq * hidden * itemsize              # q
    scratch += sp * 2 * seq * kv_pad * (4 + itemsize)
    return 2 * blocked + weights + scratch


def _self_bwd_pallas(x, res, ln_scale, adaln, wqkv, wout, g_out, g_res,
                     num_heads, eps, interpret, stage_pairs, limit):
    b, s, d = x.shape
    sp = stage_pairs
    dx, dadaln_b, dln_b, a_m, dqkv_m, attn_m = pl.pallas_call(
        functools.partial(_self_bwd_kernel, num_heads=num_heads, eps=eps,
                          dim=d, stage_pairs=sp),
        grid=(b,),
        in_specs=[_bsd_spec(s, d), _bsd_spec(s, d),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  _adaln_spec(d), _full_spec(), _full_spec(),
                  _bsd_spec(s, d), _bsd_spec(s, d)],
        out_specs=(_bsd_spec(s, d), _adaln_spec(d), _row_spec(d),
                   _bsd_spec(s, d), _bsd_spec(s, 3 * d), _bsd_spec(s, d)),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((b, 2, d), adaln.dtype),
                   jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
                   jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((b, s, 3 * d), x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        scratch_shapes=[pltpu.VMEM((s, 3 * d), x.dtype),
                        pltpu.VMEM((sp * 2 * s, s), jnp.float32),
                        pltpu.VMEM((sp * 2 * s, s), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=limit),
        interpret=interpret,
    )(x, res, ln_scale.reshape(1, d), adaln.reshape(b, 2, d), wqkv, wout,
      g_out, g_res)
    # weight grads in XLA: (D, B*S) x (B*S, 3D) contractions run near peak
    dwqkv = jnp.einsum("bsd,bse->de", a_m, dqkv_m,
                       preferred_element_type=jnp.float32).astype(wqkv.dtype)
    dwout = jnp.einsum("bsd,bse->de", attn_m, g_out,
                       preferred_element_type=jnp.float32).astype(wout.dtype)
    dln = jnp.sum(dln_b[:, 0, :], axis=0).astype(ln_scale.dtype)
    return (dx, dx, dln, dadaln_b.reshape(b, 2 * d).astype(adaln.dtype), dwqkv, dwout)


def _cross_bwd_pallas(x, res, ln_scale, adaln, wq, wout, kv, g_out, g_res,
                      num_heads, eps, kv_len, interpret, stage_pairs, limit):
    b, s, d = x.shape
    l_pad = kv.shape[1]
    sp = stage_pairs
    (dx, dadaln_b, dln_b, a_m, dq_m, attn_m, dkv) = pl.pallas_call(
        functools.partial(_cross_bwd_kernel, num_heads=num_heads, eps=eps,
                          dim=d, kv_len=kv_len, stage_pairs=sp),
        grid=(b,),
        in_specs=[_bsd_spec(s, d), _bsd_spec(s, d),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  _adaln_spec(d), _full_spec(), _full_spec(),
                  _bsd_spec(l_pad, 2 * d), _bsd_spec(s, d), _bsd_spec(s, d)],
        out_specs=(_bsd_spec(s, d), _adaln_spec(d), _row_spec(d),
                   _bsd_spec(s, d), _bsd_spec(s, d), _bsd_spec(s, d),
                   _bsd_spec(l_pad, 2 * d)),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((b, 2, d), adaln.dtype),
                   jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
                   jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(kv.shape, kv.dtype)),
        scratch_shapes=[pltpu.VMEM((s, d), x.dtype),
                        pltpu.VMEM((sp * 2 * s, l_pad), jnp.float32),
                        pltpu.VMEM((sp * 2 * s, l_pad), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=limit),
        interpret=interpret,
    )(x, res, ln_scale.reshape(1, d), adaln.reshape(b, 2, d), wq, wout,
      kv, g_out, g_res)
    dwq = jnp.einsum("bsd,bse->de", a_m, dq_m,
                     preferred_element_type=jnp.float32).astype(wq.dtype)
    dwout = jnp.einsum("bsd,bse->de", attn_m, g_out,
                       preferred_element_type=jnp.float32).astype(wout.dtype)
    dln = jnp.sum(dln_b[:, 0, :], axis=0).astype(ln_scale.dtype)
    return (dx, dx, dln, dadaln_b.reshape(b, 2 * d).astype(adaln.dtype), dwq, dwout,
            dkv)


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


def _bwd_stage(seq, hidden, num_heads, bytes_for_stage):
    """The bwd kernels inherit the fwd alignment constraints (lane-aligned
    head pairs) but have their own, larger scoped-VMEM footprint (resident
    f32 probs + recomputed qkv + grads) — pick the stage from the ACTUAL
    demand; None (XLA fallback) when even single-pair stages overflow (e.g.
    the seq-1024 trunk, whose double-buffered grads alone exceed the large
    limit — its training backward stays on XLA's VJP)."""
    if hidden % 128 or num_heads <= 0 or hidden // num_heads != 64:
        return None
    if num_heads % 2 or seq < 8 or seq % 8:
        return None
    return _pick_stage(bytes_for_stage, num_heads)


def _self_bwd(num_heads, eps, interpret, saved, g):
    x, res, ln_scale, adaln, wqkv, wout = saved
    g_out, g_res = g
    pick = use_pallas_attn_bwd() and _bwd_stage(
        x.shape[1], x.shape[2], num_heads,
        lambda sp: _self_bwd_vmem_bytes(x.shape[1], x.shape[2], num_heads,
                                        sp, x.dtype.itemsize))
    if pick:
        return _self_bwd_pallas(x, res, ln_scale, adaln, wqkv, wout,
                                g_out, g_res, num_heads, eps, interpret,
                                *pick)
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
    x, res, ln_scale, adaln, wq, wout, kv = saved
    g_out, g_res = g
    pick = (use_pallas_attn_bwd() and kv.shape[1] % 128 == 0
            and _bwd_stage(
                x.shape[1], x.shape[2], num_heads,
                lambda sp: _cross_bwd_vmem_bytes(
                    x.shape[1], x.shape[2], num_heads, kv.shape[1], sp,
                    x.dtype.itemsize)))
    if pick:
        return _cross_bwd_pallas(x, res, ln_scale, adaln, wq, wout, kv,
                                 g_out, g_res, num_heads, eps, kv_len,
                                 interpret, *pick)
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
