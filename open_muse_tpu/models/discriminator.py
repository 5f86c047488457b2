"""PatchGAN discriminator + GAN loss heads for VQGAN training.

The reference planned a VQGAN trainer but shipped a one-line stub
(reference training/train_vqgan.py:1); its tokenizer lineage (taming
VQGANModel, reference muse/modeling_taming_vqgan.py:512) was trained upstream
with the taming-transformers recipe: an NLayer PatchGAN discriminator,
hinge/vanilla adversarial loss, and an adaptive generator weight
``||grad(rec)|| / ||grad(gan)||`` measured at the decoder's last layer.
This module provides that recipe TPU-first:

- NHWC convs throughout (lowers straight onto the MXU, like every other
  conv in the package).
- GroupNorm instead of BatchNorm: no running statistics, so the whole
  two-player step stays ONE jittable, donate-able XLA program (BatchNorm's
  mutable batch_stats would split the step into apply/mutate phases).
- hinge loss uses the same formulation as taming's
  ``hinge_d_loss`` / vanilla ``bce-with-logits`` pair.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PatchDiscriminator", "hinge_d_loss", "vanilla_d_loss",
           "generator_loss", "adaptive_disc_weight"]


class PatchDiscriminator(nn.Module):
    """NLayer PatchGAN over NHWC images in [0, 1].

    4x4/stride-2 conv ladder with channel doubling (capped at 8x), a
    stride-1 penultimate block, then a 1-channel logit map — each spatial
    logit judges one receptive-field patch (70x70 at n_layers=3).
    """

    base_channels: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim != 4:
            raise ValueError(f"expected NHWC images, got {x.shape}")
        # center to [-1, 1] like taming's preprocessing
        h = (x.astype(self.dtype) * 2.0 - 1.0)
        h = nn.Conv(self.base_channels, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="conv_in",
                    dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(self.base_channels * mult, (4, 4),
                        strides=(stride, stride), padding=((1, 1), (1, 1)),
                        use_bias=False, name=f"conv_{n}", dtype=self.dtype)(h)
            h = nn.GroupNorm(num_groups=min(32, self.base_channels * mult),
                             name=f"norm_{n}", dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                       name="conv_out", dtype=self.dtype)(h)


def hinge_d_loss(logits_real, logits_fake):
    """taming's hinge_d_loss: 0.5 * (E[relu(1 - D(x))] + E[relu(1 + D(G))])."""
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    """Non-saturating BCE-with-logits pair (taming's vanilla_d_loss)."""
    return 0.5 * (jnp.mean(nn.softplus(-logits_real))
                  + jnp.mean(nn.softplus(logits_fake)))


def generator_loss(logits_fake, kind: str = "hinge"):
    if kind == "hinge":
        return -jnp.mean(logits_fake)
    return jnp.mean(nn.softplus(-logits_fake))


def adaptive_disc_weight(rec_grad, gan_grad, disc_weight: float = 1.0,
                         eps: float = 1e-4, max_weight: float = 1e4):
    """taming's calculate_adaptive_weight on precomputed last-layer grads:
    lambda = ||grad(L_rec)|| / (||grad(L_gan)|| + eps), clipped, scaled."""
    w = jnp.linalg.norm(rec_grad) / (jnp.linalg.norm(gan_grad) + eps)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, max_weight)) * disc_weight


def last_decoder_kernel_path(params) -> Sequence[str] | None:
    """Path of the decoder's final conv kernel — the 'last layer' taming
    measures the adaptive weight at.  Works for every VQ family in the
    package (maskgit/taming/movq/paella all name it decoder/conv_out)."""
    dec = params.get("decoder")
    if not isinstance(dec, dict):
        return None
    conv = dec.get("conv_out")
    if isinstance(conv, dict):
        # movq wraps conv_out; descend to the innermost kernel
        node, path = conv, ["decoder", "conv_out"]
        while isinstance(node, dict) and "kernel" not in node:
            k = next(iter(node))
            node, path = node[k], path + [k]
        if isinstance(node, dict) and "kernel" in node:
            return path + ["kernel"]
    return None
