"""CLIP score: mean text-image agreement of a generated set.

Protocol matches torchmetrics' CLIPScore (the metric behind the reference's
published CLIP-vs-CFG curves, benchmark/model_quality.py:32-74):
``mean(max(100 * cos(image_embed, text_embed), 0))`` per (image, caption)
pair — note the score uses the FIXED 100 scale, not the model's learned
logit_scale."""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

__all__ = ["clip_score"]


def clip_score(scorer, images: Iterable, captions: Sequence[str],
               batch_size: int = 32) -> float:
    """Mean CLIP score over paired (image, caption) lists.

    ``scorer`` is a :class:`~open_muse_tpu.models.clip_vision.CLIPScorer`;
    only its towers are used (fixed 100x scale per the metric definition).
    """
    images = list(images)
    if len(images) != len(captions):
        raise ValueError(f"{len(images)} images vs {len(captions)} captions")
    scores = []
    for start in range(0, len(images), batch_size):
        img = np.asarray(scorer.embed_images(images[start:start + batch_size]))
        txt = np.asarray(scorer.embed_texts(captions[start:start + batch_size]))
        scores.append(np.maximum(100.0 * np.sum(img * txt, axis=-1), 0.0))
    return float(np.concatenate(scores).mean())
