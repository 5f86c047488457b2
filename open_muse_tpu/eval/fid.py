"""Fréchet Inception Distance machinery, TPU-native.

The reference scores FID with the external ``cleanfid`` package
(scripts/calculate_fid.py:215-220: ``fid.compute_fid(real_dir, fake_dir)``)
over InceptionV3 features.  This module implements the same protocol —
per-set feature statistics (mu, sigma) + Fréchet distance — with pluggable
feature extractors:

* :class:`CLIPFeatureExtractor` — projected CLIP image embeddings (the
  "CLIP-FID" protocol of Kynkäänniemi et al. 2022, also shipped by cleanfid
  as ``model_name="clip_vit_b_32"``).  With pretrained CLIP weights this is a
  standard published metric; with seeded weights (offline environments) it is
  a deterministic regression metric and is labeled as such by callers.
* any object with ``extract(images) -> (B, D)`` (e.g. an InceptionV3 port).

The Fréchet math matches cleanfid/pytorch-fid: FID = |mu1-mu2|^2 +
tr(S1 + S2 - 2 sqrtm(S1 S2)).
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional

import numpy as np

__all__ = ["frechet_distance", "compute_statistics", "CLIPFeatureExtractor",
           "fid_between_dirs", "fid_between_image_sets", "load_image_dir"]


def compute_statistics(features: np.ndarray):
    """Feature matrix (N, D) -> (mean (D,), covariance (D, D))."""
    features = np.asarray(features, dtype=np.float64)
    if features.ndim != 2:
        raise ValueError(f"expected (N, D) features, got {features.shape}")
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (pytorch-fid/cleanfid math:
    sqrtm via scipy with a jittered retry for near-singular covariances)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


class CLIPFeatureExtractor:
    """Image features from a CLIP vision tower (projected embeds, the
    CLIP-FID protocol).  Accepts PIL images or HWC arrays."""

    def __init__(self, vision_encoder, batch_size: int = 32):
        self.vision = vision_encoder
        self.batch_size = batch_size

    @classmethod
    def seeded(cls, seed: int = 0, **config):
        """Deterministic randomly-initialized tiny tower for offline
        regression numbers (NOT a published metric — label outputs as
        ``fid_clipfeat_seeded``)."""
        from ..models.clip_vision import CLIPVisionEncoder

        config = dict(dict(hidden_size=64, intermediate_size=128,
                           num_hidden_layers=4, num_attention_heads=4,
                           image_size=64, patch_size=8, projection_dim=64),
                      **config)
        return cls(CLIPVisionEncoder(seed=seed, **config))

    def extract(self, images) -> np.ndarray:
        import jax.numpy as jnp

        from ..models.clip_vision import clip_preprocess_images

        feats: List[np.ndarray] = []
        images = list(images)
        for start in range(0, len(images), self.batch_size):
            px = clip_preprocess_images(images[start:start + self.batch_size],
                                        self.vision.config.image_size)
            _, _, embeds = self.vision.encode(jnp.asarray(px))
            feats.append(np.asarray(embeds, dtype=np.float64))
        return np.concatenate(feats, axis=0)


def load_image_dir(path: str, limit: Optional[int] = None):
    """All images in a directory as PIL (sorted for determinism)."""
    from PIL import Image

    names = sorted(n for n in os.listdir(path)
                   if n.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
    if limit:
        names = names[:limit]
    return [Image.open(os.path.join(path, n)).convert("RGB") for n in names]


def fid_between_image_sets(real_images: Iterable, fake_images: Iterable,
                           extractor) -> float:
    real_feats = extractor.extract(real_images)
    fake_feats = extractor.extract(fake_images)
    if len(real_feats) < 2 or len(fake_feats) < 2:
        raise ValueError("need >= 2 images per set for covariance")
    return frechet_distance(*compute_statistics(real_feats),
                            *compute_statistics(fake_feats))


def fid_between_dirs(real_dir: str, fake_dir: str, extractor,
                     limit: Optional[int] = None) -> float:
    """In-repo analog of cleanfid's compute_fid(real_dir, fake_dir)."""
    return fid_between_image_sets(load_image_dir(real_dir, limit),
                                  load_image_dir(fake_dir, limit), extractor)
