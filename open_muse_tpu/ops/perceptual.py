"""Conv-feature perceptual loss for VQGAN training (LPIPS analog).

taming-transformers trains its VQGAN with an LPIPS(VGG16) perceptual term;
the pretrained VGG weights are not reachable in this offline environment, so
the default extractor here is a FIXED, SEEDED random conv pyramid — the
"random features" result (Zhang et al.'s LPIPS paper reports untrained nets
already correlate with human judgments well above pixel metrics) makes this
a real perceptual signal, and it is honestly labeled as seeded.  The module
accepts externally loaded torchvision-layout VGG16 features the day network
exists (``load_vgg16_features``), switching the same loss to true LPIPS
territory without touching the trainer.

TPU notes: NHWC convs, all static shapes, one jittable pure function; the
extractor parameters are baked constants (stop_gradient'd), so the backward
pass only flows through the two image branches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["PerceptualFeatures", "make_perceptual_loss_fn"]

# (channels, n_convs_before_pool) per stage — VGG16's conv pyramid shape
_STAGES = ((64, 2), (128, 2), (256, 3))


class PerceptualFeatures(nn.Module):
    """VGG16-shaped conv pyramid returning per-stage feature maps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # center like torchvision-normalized inputs (mean only; per-channel
        # std folds into the first conv's scale for a fixed extractor)
        h = x.astype(self.dtype) - jnp.asarray([0.485, 0.456, 0.406],
                                               self.dtype)
        feats = []
        for si, (ch, n_convs) in enumerate(_STAGES):
            for ci in range(n_convs):
                h = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"stage{si}_conv{ci}", dtype=self.dtype)(h)
                h = nn.relu(h)
            feats.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats


def _normalize(feat, eps=1e-8):
    """Unit-normalize channels (LPIPS's normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


def make_perceptual_loss_fn(image_size: int, seed: int = 0, params=None):
    """Build ``loss(x, y) -> scalar``: mean squared distance between
    unit-normalized per-stage features, averaged over stages (LPIPS with
    uniform per-channel weights).

    ``params``: optionally a pretrained parameter tree (from
    ``load_vgg16_features``); default is the seeded random pyramid.
    """
    module = PerceptualFeatures()
    if params is None:
        params = module.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, image_size, image_size, 3)))["params"]
    params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)

    def loss(x, y):
        fx = module.apply({"params": params}, x)
        fy = module.apply({"params": params}, y)
        per_stage = [jnp.mean(jnp.square(_normalize(a) - _normalize(b)))
                     for a, b in zip(fx, fy)]
        return jnp.mean(jnp.stack(per_stage))

    return loss


def load_vgg16_features(state_dict) -> dict:
    """Torchvision VGG16 ``features.*`` state_dict -> PerceptualFeatures
    params (OIHW -> HWIO).  Only the first three stages are consumed."""
    idx_map = []  # torchvision features indices of convs per stage
    tv_idx = 0
    for ch, n_convs in _STAGES:
        stage = []
        for _ in range(n_convs):
            stage.append(tv_idx)
            tv_idx += 2  # conv + relu
        idx_map.append(stage)
        tv_idx += 1  # pool
    params = {}
    for si, stage in enumerate(idx_map):
        for ci, tvi in enumerate(stage):
            w = np.asarray(state_dict[f"features.{tvi}.weight"])
            b = np.asarray(state_dict[f"features.{tvi}.bias"])
            params[f"stage{si}_conv{ci}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b)}
    return params
