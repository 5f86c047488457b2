"""Vector-quantization core shared by all four tokenizers.

Reference parity: the VectorQuantizer classes in
muse/modeling_maskgit_vqgan.py:243-348 (squared-L2 via addmm trick),
muse/modeling_taming_vqgan.py:404-509, muse/modeling_movq.py:455-552 and
muse/modeling_paella_vq.py:14-109 (true L2 via torch.cdist).

TPU-native design: everything is NHWC; the nearest-neighbour search is one
(B*H*W, C) x (C, K) matmul on the MXU plus an argmin — the `addmm` trick maps
1:1 onto a single fused XLA kernel.  A Pallas kernel that fuses
distance+argmin+gather lives in ops/pallas/vq_argmin.py for the large-K hot
path and is dispatched when beneficial.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["VectorQuantizer", "compute_distances", "nearest_codebook_indices"]


def _use_pallas_argmin(n, c, k) -> bool:
    """Dispatch the fused Pallas kernel (measured 10.7x faster than the XLA
    distance-matrix path at N=16k, K=8192, C=256 on v5e, with exact argmin
    agreement).  On by default on single-device TPU for K a multiple of 1024
    — and on a mesh inside a ``parallel.kernel_mesh`` context (shard_map
    keeps the call local, ops/pallas/__init__.kernels_enabled); set
    MUSE_TPU_PALLAS_VQ=0 to force the XLA path."""
    import os

    if os.environ.get("MUSE_TPU_PALLAS_VQ", "1") != "1":
        return False
    from .pallas import kernels_enabled

    return kernels_enabled() and k % 1024 == 0


def nearest_codebook_indices(flat_states, codebook, metric: str = "sq_l2"):
    """argmin over codebook entries; fused Pallas path on TPU (metric doesn't
    change the argmin, modeling_movq.py:518-521 cdist vs addmm)."""
    n, c = flat_states.shape
    k = codebook.shape[0]
    if _use_pallas_argmin(n, c, k):
        from .pallas import interpret_mode
        from .pallas.vq_argmin import vq_argmin

        return vq_argmin(flat_states, codebook, interpret=interpret_mode())
    return jnp.argmin(compute_distances(flat_states, codebook, metric), axis=1)


def compute_distances(flat_states, codebook, metric: str = "sq_l2"):
    """Pairwise distances between (N, C) latents and (K, C) codebook.

    metric="sq_l2": z² + e² − 2·z·eᵀ (reference maskgit/taming addmm trick,
    modeling_maskgit_vqgan.py:303-316); "l2": true euclidean like torch.cdist
    (modeling_movq.py:518-521).  Argmins agree; soft codes differ.
    """
    flat32 = flat_states.astype(jnp.float32)
    cb32 = codebook.astype(jnp.float32)
    z_sq = jnp.sum(jnp.square(flat32), axis=1, keepdims=True)
    e_sq = jnp.sum(jnp.square(cb32), axis=1)[None, :]
    d = z_sq + e_sq - 2.0 * jnp.dot(flat32, cb32.T, preferred_element_type=jnp.float32)
    if metric == "l2":
        d = jnp.sqrt(jnp.maximum(d, 0.0))
    return d


class VectorQuantizer(nn.Module):
    """Codebook with nearest-neighbour quantization over NHWC latents."""

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    metric: str = "sq_l2"  # "sq_l2" (maskgit/taming) or "l2" (movq/paella)
    embedding_param_name: str = "embedding"  # paella names it "codebook"

    def setup(self):
        # reference init: uniform(-1/K, 1/K) (modeling_maskgit_vqgan.py:265)
        scale = 1.0 / self.num_embeddings

        def _uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

        self.embed = nn.Embed(
            self.num_embeddings,
            self.embedding_dim,
            embedding_init=_uniform_init,
            name=self.embedding_param_name,
        )

    @property
    def codebook(self):
        return self.embed.embedding

    def _distances(self, flat_states):
        return compute_distances(flat_states, self.codebook, self.metric)

    def __call__(self, hidden_states, return_loss: bool = False):
        """hidden_states: (B, H, W, C) -> (z_q NHWC, indices (B, H*W), loss)."""
        b, h, w, c = hidden_states.shape
        flat = hidden_states.reshape(-1, c)
        indices = nearest_codebook_indices(flat, self.codebook, self.metric)
        z_q = self.embed(indices).reshape(b, h, w, c).astype(hidden_states.dtype)
        indices = indices.reshape(b, h * w)
        loss = None
        if return_loss:
            # VQ-VAE eq. 4 losses with straight-through estimator
            # (modeling_maskgit_vqgan.py:289-296)
            loss = jnp.mean(jnp.square(jax.lax.stop_gradient(z_q) - hidden_states)) \
                + self.commitment_cost * jnp.mean(
                    jnp.square(z_q - jax.lax.stop_gradient(hidden_states)))
            z_q = hidden_states + jax.lax.stop_gradient(z_q - hidden_states)
        return z_q, indices, loss

    def get_code(self, hidden_states):
        b, h, w, c = hidden_states.shape
        flat = hidden_states.reshape(-1, c)
        indices = nearest_codebook_indices(flat, self.codebook, self.metric)
        return indices.reshape(b, h * w)

    def get_soft_code(self, hidden_states, temp: float = 1.0, stochastic: bool = False,
                      key=None):
        # reference modeling_maskgit_vqgan.py:327-340
        b, h, w, c = hidden_states.shape
        flat = hidden_states.reshape(-1, c)
        distances = self._distances(flat)
        soft_code = jax.nn.softmax(-distances / temp, axis=-1)
        if stochastic:
            if key is None:
                raise ValueError("stochastic soft-code sampling requires a PRNG key")
            code = jax.random.categorical(key, -distances / temp, axis=-1)
        else:
            code = jnp.argmin(distances, axis=-1)
        code = code.reshape(b, h * w)
        soft_code = soft_code.reshape(b, h * w, -1)
        return soft_code, code

    def get_codebook_entry(self, indices):
        """(B, N) token ids -> (B, sqrt(N), sqrt(N), C) NHWC latents
        (reference returns NCHW, modeling_maskgit_vqgan.py:318-324)."""
        batch, num_tokens = indices.shape
        side = int(math.sqrt(num_tokens))
        z_q = self.embed(indices)
        return z_q.reshape(batch, side, side, -1)
