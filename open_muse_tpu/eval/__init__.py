"""Quality evaluation: FID (Fréchet distance over image features) and CLIP
score — the scoring half the reference delegates to cleanfid
(scripts/calculate_fid.py:215-220) and transformers CLIPModel
(gen_sdxl_synthetic_dataset.py:97-104), implemented natively so the whole
generate->score loop runs as one JAX stack on TPU hosts."""

from .fid import (CLIPFeatureExtractor, compute_statistics, fid_between_dirs,
                  fid_between_image_sets, frechet_distance)
from .clip_score import clip_score
from .inception_score import inception_score, inception_score_from_logits

__all__ = ["frechet_distance", "compute_statistics", "fid_between_dirs",
           "fid_between_image_sets", "CLIPFeatureExtractor", "clip_score",
           "inception_score", "inception_score_from_logits"]
