from . import sampling
from .layers import (AdaLNModulation, Attention, GlobalResponseNorm, LayerNorm,
                     Norm, RMSNorm, sinusoidal_encode)
from .losses import (cross_entropy_loss, soft_target_cross_entropy,
                     weighted_cross_entropy_loss)
from .vq import VectorQuantizer, compute_distances, nearest_codebook_indices

__all__ = [
    "sampling",
    "AdaLNModulation",
    "Attention",
    "GlobalResponseNorm",
    "LayerNorm",
    "Norm",
    "RMSNorm",
    "sinusoidal_encode",
    "cross_entropy_loss",
    "soft_target_cross_entropy",
    "weighted_cross_entropy_loss",
    "VectorQuantizer",
    "compute_distances",
    "nearest_codebook_indices",
]
