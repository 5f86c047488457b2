"""Shared linen building blocks used across model families.

These replace the reference's hand-rolled torch layers *and* its optional CUDA
fused ops in one go: under ``jax.jit`` XLA fuses residual-add + norm and
GELU/GLU into neighbouring matmuls, which is exactly what the reference needed
flash_attn's ``dropout_add_rms_norm`` / ``fused_mlp_func`` for
(muse/modeling_transformer_v2.py:41-54,645-738,954-996).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "RMSNorm",
    "LayerNorm",
    "Norm",
    "GlobalResponseNorm",
    "AdaLNModulation",
    "sinusoidal_encode",
    "Attention",
]


def _use_pallas_norm() -> bool:
    """Route norms through the one-pass Pallas kernel (inference only: the
    kernel has no VJP).  Profiling showed XLA's norm fusions run at ~5% of
    HBM bandwidth inside the decode scan — 44% of step time."""
    import os

    return (os.environ.get("MUSE_TPU_PALLAS_NORM", "0") == "1"
            and jax.default_backend() == "tpu")


class RMSNorm(nn.Module):
    """RMSNorm with optional fused residual-add prenorm semantics.

    ``__call__(x)`` -> normed; ``__call__(x, residual)`` -> (normed, x+residual)
    matching the reference's prenorm-returning-residual contract
    (muse/modeling_transformer_v2.py:661-691).  Variance always in fp32.
    """

    dim: int
    eps: float = 1e-6
    elementwise_affine: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, return_residual: bool = False,
                 params_only: bool = False):
        if self.elementwise_affine:
            scale = self.param("scale", nn.initializers.ones, (self.dim,))
        else:
            scale = jnp.ones((self.dim,), dtype=jnp.float32)
        if params_only:
            # fused attn-sublayer path: the Pallas kernel applies the norm
            # itself and only needs the affine scale (ops/pallas/attn_sublayer)
            return scale
        if _use_pallas_norm() and x.shape[-1] % 128 == 0:
            from .pallas.fused_norm import fused_residual_rmsnorm

            out, prenorm_residual = fused_residual_rmsnorm(x, residual, scale,
                                                           eps=self.eps)
            if residual is not None or return_residual:
                return out, prenorm_residual
            return out
        if residual is not None:
            x = x + residual
        prenorm_residual = x
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        out = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        out = out * scale.astype(out.dtype)
        if residual is not None or return_residual:
            return out, prenorm_residual
        return out


class LayerNorm(nn.Module):
    """LayerNorm (optional bias / affine) with the same fused-residual
    contract as RMSNorm (reference muse/modeling_transformer_v2.py:694-738)."""

    dim: int
    eps: float = 1e-5
    use_bias: bool = False
    elementwise_affine: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, return_residual: bool = False):
        if residual is not None:
            x = x + residual
        prenorm_residual = x
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.elementwise_affine:
            scale = self.param("scale", nn.initializers.ones, (self.dim,))
            out = out * scale.astype(out.dtype)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.dim,))
                out = out + bias.astype(out.dtype)
        if residual is not None or return_residual:
            return out, prenorm_residual
        return out


def Norm(dim, norm_type: str = "layernorm", eps: float = 1e-5,
         use_bias: bool = False, elementwise_affine: bool = True, name=None,
         dtype=jnp.float32):
    """Factory mirroring reference Norm dispatch
    (muse/modeling_transformer_v2.py:636-642)."""
    if norm_type == "layernorm":
        return LayerNorm(dim, eps=eps, use_bias=use_bias,
                         elementwise_affine=elementwise_affine, name=name, dtype=dtype)
    if norm_type == "rmsnorm":
        return RMSNorm(dim, eps=eps, elementwise_affine=elementwise_affine,
                       name=name, dtype=dtype)
    raise ValueError(f"unknown norm_type {norm_type}")


class GlobalResponseNorm(nn.Module):
    """ConvNeXt-V2 GRN over NHWC tensors
    (reference muse/modeling_transformer_v2.py:741-751)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma.astype(x.dtype) * (x * nx.astype(x.dtype)) + beta.astype(x.dtype) + x


class AdaLNModulation(nn.Module):
    """scale/shift conditioning: x * (1+scale) + shift from silu(cond)
    (reference muse/modeling_transformer_v2.py:1025-1037)."""

    cond_embed_dim: int
    hidden_size: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, cond_embeds, cached=None,
                 precompute: bool = False):
        """``cached``/``precompute`` support MaskGIT decode-loop hoisting:
        the mapper matmul depends only on cond_embeds, which is constant
        across decode steps — ``precompute=True`` returns the mapped tensor,
        a later call with ``cached=`` skips the matmul (transformer_v2.py
        parallel_decode_loop)."""
        if cached is None:
            cond = jax.nn.silu(cond_embeds)
            cached = nn.Dense(self.hidden_size * 2, use_bias=self.use_bias,
                              dtype=self.dtype, name="mapper")(cond)
        if precompute:
            return cached
        mapped = cached
        scale, shift = jnp.split(mapped, 2, axis=-1)
        # broadcast over all non-(batch, channel) dims
        extra = hidden_states.ndim - 2
        shape = (scale.shape[0],) + (1,) * extra + (scale.shape[-1],)
        scale = scale.reshape(shape)
        shift = shift.reshape(shape)
        return hidden_states * (1 + scale) + shift


def sinusoidal_encode(features, embedding_dim: int, max_positions: float = 10000):
    """[cos | sin] sinusoidal features for micro-conditioning
    (reference muse/modeling_transformer_v2.py:59-76)."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / half_dim
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = features.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def dot_product_attention(query, key, value, scale: Optional[float] = None):
    """(B, T, H, D) attention with fp32 softmax accumulation.

    Sequence lengths in this model family are small (<=1024 image + 77 text
    tokens), so a plain fused-by-XLA attention saturates the MXU; this is the
    TPU answer to xformers memory_efficient_attention
    (muse/modeling_transformer_v2.py:881-889).  Set MUSE_TPU_PALLAS_ATTN=1 to
    route through the Pallas on-chip-softmax kernel instead
    (ops/pallas/flash_attention.py).
    """
    import os

    if os.environ.get("MUSE_TPU_PALLAS_ATTN", "0") == "1" and \
            jax.default_backend() == "tpu":
        from .pallas.flash_attention import flash_attention

        return flash_attention(query, key, value)
    if scale is None:
        scale = 1.0 / math.sqrt(query.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", query, key,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, value)


class _ProjParams(nn.Module):
    """Bare kernel(+bias) holder with nn.Dense-identical param names/shapes,
    so q/k/v weights can be CONCATENATED into one matmul at apply time while
    checkpoints keep the torch-compatible query/key/value split."""

    in_features: int
    features: int
    use_bias: bool
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        return kernel, bias


class Attention(nn.Module):
    """Multi-head self/cross attention (reference
    muse/modeling_transformer_v2.py:834-916).  Param names (query/key/value/
    out) match the torch attribute names for mechanical weight conversion.

    TPU perf: the q/k/v projections run as ONE fused matmul for self
    attention (x @ [Wq|Wk|Wv]) and q + [Wk|Wv] for cross attention — wider N
    keeps the MXU busy at the small decode batch sizes where three separate
    (M,1024)x(1024,1024) matmuls are launch/tiling-bound (STATUS round-1
    profiler: matmul fusions ~1.5 ms of the 3.3 ms decode step)."""

    hidden_size: int
    num_heads: int
    context_dim: Optional[int] = None
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, context=None, attention_mask=None,
                 cached_kv=None, precompute_kv: bool = False,
                 return_weights: bool = False):
        """``precompute_kv``/``cached_kv`` support decode-loop hoisting: for
        cross attention the fused [k|v] projection depends only on the text
        context, constant across MaskGIT decode steps.  ``precompute_kv=True``
        returns the (B, kv_len, 2*hidden) kv tensor; passing it back as
        ``cached_kv`` skips the projection.

        ``return_weights=True`` creates the full q/k/v/out param set and
        returns the raw (dtype-cast) kernels instead of applying attention —
        the fused Pallas attention-sublayer path (ops/pallas/attn_sublayer)
        consumes them directly while the checkpoint tree stays identical.
        No-bias configs only (the research config; kernels have no bias)."""
        self_attn = context is None and cached_kv is None
        if self_attn or return_weights:
            context = hidden_states
        head_dim = self.hidden_size // self.num_heads
        q_in = hidden_states.shape[-1]
        kv_in = context.shape[-1] if context is not None else None
        wq, bq = _ProjParams(q_in, self.hidden_size, self.use_bias,
                             name="query")()
        if cached_kv is None or return_weights:
            wk, bk = _ProjParams(kv_in, self.hidden_size, self.use_bias,
                                 name="key")()
            wv, bv = _ProjParams(kv_in, self.hidden_size, self.use_bias,
                                 name="value")()

        def matmul(x, w, b):
            # cast BOTH operands (nn.Dense semantics): with a float32 input
            # and bf16 policy, jnp.dot would otherwise promote to f32 and
            # silently lose the MXU bf16 win the fusion exists for
            y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
            return y if b is None else y + b.astype(self.dtype)

        def cat(parts):
            good = [p for p in parts if p is not None]
            return jnp.concatenate([p.astype(self.dtype) for p in good],
                                   axis=-1) if good else None

        wo, bo = _ProjParams(self.hidden_size, self.hidden_size,
                             self.use_bias, name="out")()

        if return_weights:
            if self.use_bias:
                raise NotImplementedError(
                    "return_weights (fused attn sublayer) is no-bias only")
            return {"wq": wq.astype(self.dtype), "wkv": cat([wk, wv]),
                    "wqkv": cat([wq, wk, wv]), "wout": wo.astype(self.dtype)}

        if precompute_kv:
            return matmul(context, cat([wk, wv]),
                          cat([bk, bv]) if self.use_bias else None)

        if self_attn:
            qkv = matmul(hidden_states, cat([wq, wk, wv]),
                         cat([bq, bk, bv]) if self.use_bias else None)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = matmul(hidden_states, wq.astype(self.dtype), bq)
            kv = cached_kv if cached_kv is not None else matmul(
                context, cat([wk, wv]),
                cat([bk, bv]) if self.use_bias else None)
            k, v = jnp.split(kv, 2, axis=-1)
        batch, q_len = q.shape[:2]
        kv_len = k.shape[1]
        q = q.reshape(batch, q_len, self.num_heads, head_dim)
        k = k.reshape(batch, kv_len, self.num_heads, head_dim)
        v = v.reshape(batch, kv_len, self.num_heads, head_dim)
        if attention_mask is not None:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) / math.sqrt(head_dim)
            logits = jnp.where(attention_mask, jnp.finfo(jnp.float32).min, logits)
            weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        else:
            attn = dot_product_attention(q, k, v)
        attn = attn.reshape(batch, q_len, self.hidden_size)
        # "out" is a _ProjParams (kernel/bias names identical to the former
        # nn.Dense) so return_weights can hand the raw kernel to the fused
        # sublayer kernel; matmul() reproduces nn.Dense(dtype=...) exactly
        return matmul(attn, wo, bo)
