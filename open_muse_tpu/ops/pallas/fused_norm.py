"""Fused residual-add + RMSNorm/LayerNorm (Pallas TPU kernel).

Parity target: flash_attn's ``dropout_add_rms_norm`` /
``dropout_add_layer_norm`` CUDA kernels that the reference's
use_fused_residual_norm flag enables (modeling_transformer_v2.py:41-54,
661-738).  Under jit XLA already fuses add+norm, so this kernel exists for
(a) feature parity, (b) guaranteed fusion when the surrounding graph blocks
XLA's fuser, and (c) a single-pass fp32 moment computation.

Returns (normed, prenorm_residual) like the reference contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_residual_rmsnorm", "fused_residual_layernorm"]


def _rms_kernel(x_ref, res_ref, scale_ref, out_ref, resid_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    if res_ref is not None:
        x = x + res_ref[:].astype(jnp.float32)
    resid_ref[:] = x.astype(resid_ref.dtype)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    out = x * jax.lax.rsqrt(var + eps)
    out = out * scale_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _ln_kernel(x_ref, res_ref, scale_ref, bias_ref, out_ref, resid_ref, *,
               eps: float):
    x = x_ref[:].astype(jnp.float32)
    if res_ref is not None:
        x = x + res_ref[:].astype(jnp.float32)
    resid_ref[:] = x.astype(resid_ref.dtype)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale_ref[:].astype(jnp.float32)
    if bias_ref is not None:
        out = out + bias_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _run(kernel, x, residual, params, eps, block_rows: int = 256,
         interpret: bool = False):
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    block_rows = min(block_rows, max(8, n))
    pad = (-n) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    res2 = None
    if residual is not None:
        res2 = residual.reshape(-1, d)
        if pad:
            res2 = jnp.pad(res2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // block_rows,)
    row_spec = pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [row_spec]
    args = [x2]
    if res2 is not None:
        in_specs.append(row_spec)
        args.append(res2)
    for p in params:
        in_specs.append(vec_spec)
        args.append(p.reshape(1, d))

    def wrapped(*refs):
        x_ref = refs[0]
        idx = 1
        res_ref = None
        if res2 is not None:
            res_ref = refs[idx]
            idx += 1
        param_refs = list(refs[idx:idx + len(params)])
        out_ref, resid_ref = refs[idx + len(params):]
        kernel(x_ref, res_ref, *param_refs, out_ref, resid_ref)

    out, resid = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct(x2.shape, x.dtype),
                   jax.ShapeDtypeStruct(x2.shape, x.dtype)),
        interpret=interpret,
    )(*args)
    if pad:
        out, resid = out[:n], resid[:n]
    return out.reshape(orig_shape), resid.reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_residual_rmsnorm(x, residual, scale, eps: float = 1e-6,
                           interpret: bool = False):
    return _run(functools.partial(_rms_kernel, eps=eps), x, residual, [scale],
                eps, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_residual_layernorm(x, residual, scale, bias, eps: float = 1e-5,
                             interpret: bool = False):
    params = [scale] + ([bias] if bias is not None else [])

    def kernel(x_ref, res_ref, *rest):
        if bias is not None:
            scale_ref, bias_ref, out_ref, resid_ref = rest
        else:
            scale_ref, out_ref, resid_ref = rest
            bias_ref = None
        _ln_kernel(x_ref, res_ref, scale_ref, bias_ref, out_ref, resid_ref,
                   eps=eps)

    return _run(lambda *r: kernel(*r), x, residual, params, eps,
                interpret=interpret)
