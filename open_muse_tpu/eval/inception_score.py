"""Inception Score: exp(E_x[KL(p(y|x) || p(y))]).

The third metric of the reference's published quality trio
(benchmark/model_quality.py:46-88, ISC-vs-CFG curves measured on 10k COCO).
The math is classifier-agnostic — the standard protocol feeds InceptionV3
class logits; any ``classify(images) -> (N, C) logits`` callable works, so
the same seeded-vs-pretrained labeling discipline as eval/fid.py applies.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

__all__ = ["inception_score", "inception_score_from_logits"]


def inception_score_from_logits(logits: np.ndarray,
                                splits: int = 10) -> Tuple[float, float]:
    """(mean, std) inception score over `splits` chunks (standard protocol:
    Salimans et al. 2016; cleanfid/torchmetrics use the same split scheme)."""
    logits = np.asarray(logits, dtype=np.float64)
    if logits.ndim != 2:
        raise ValueError(f"expected (N, C) logits, got {logits.shape}")
    logits = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(logits)
    probs /= probs.sum(axis=1, keepdims=True)
    n = len(probs)
    splits = max(1, min(splits, n))
    scores = []
    for chunk in np.array_split(probs, splits):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = (chunk * (np.log(chunk + 1e-12) - np.log(marginal + 1e-12))).sum(1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))


def inception_score(images: Iterable, classify, splits: int = 10,
                    batch_size: int = 32) -> Tuple[float, float]:
    """Score a generated image set with a ``classify(images)->(B, C) logits``
    callable (InceptionV3 for the published protocol; any fixed classifier
    for regression numbers)."""
    images = list(images)
    logits = []
    for start in range(0, len(images), batch_size):
        logits.append(np.asarray(classify(images[start:start + batch_size])))
    return inception_score_from_logits(np.concatenate(logits, axis=0),
                                       splits=splits)
