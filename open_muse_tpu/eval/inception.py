"""InceptionV3 feature extractor (flax, NHWC) for reference-protocol FID/ISC.

The reference scores FID and Inception Score with InceptionV3 features via
cleanfid (reference scripts/calculate_fid.py:215-220) whose curves are
published in reference benchmark/model_quality.py:18-88.  This module ports
the torchvision ``inception_v3`` evaluation graph — the same graph behind
pytorch-fid's ``pt_inception-2015-12-05`` FID weights — so that the day
published weights are reachable, reference-protocol scoring needs zero new
code: ``InceptionFeatureExtractor.from_torch_checkpoint(path)`` ingests
either a torchvision ``inception_v3_google`` state dict (1000-class) or a
pytorch-fid FID state dict (1008-class, FID-patched pooling) directly.

Two graph variants, selected automatically from the checkpoint:

* ``variant="torchvision"`` — stock torchvision blocks: the 3x3 stride-1
  average pools inside Mixed_5*/6*/7* count zero padding in the divisor
  (``count_include_pad=True``).
* ``variant="fid"`` — pytorch-fid's patches of those blocks
  (pytorch_fid/inception.py FIDInceptionA/C/E_1/E_2): the average pools use
  ``count_include_pad=False``, and the LAST InceptionE block (Mixed_7c)
  replaces its branch-pool average pool with a max pool.

Features: ``pool3`` (2048-dim global average after Mixed_7c) — the FID
feature space; ``logits`` — the classifier head, used by the Inception
Score protocol.  Everything is jitted, NHWC, fully convolutional (any input
>= 75 px), with eval-mode batch norm (running statistics, eps 1e-3).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InceptionV3", "InceptionFeatureExtractor",
           "convert_torch_inception_state_dict", "inception_preprocess"]

BN_EPS = 1e-3  # torchvision BatchNorm2d(eps=0.001) in inception_v3


def _pairs(padding) -> Sequence[Tuple[int, int]]:
    if isinstance(padding, int):
        return [(padding, padding), (padding, padding)]
    ph, pw = padding
    return [(ph, ph), (pw, pw)]


def avg_pool_3x3(x: jnp.ndarray, include_pad: bool) -> jnp.ndarray:
    """3x3 stride-1 pad-1 average pool, NHWC.  ``include_pad`` mirrors
    torch's ``count_include_pad``: True divides by 9 everywhere (stock
    torchvision inception), False divides by the number of in-bounds taps
    (pytorch-fid's FIDInception patches)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    if include_pad:
        return summed / 9.0
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def max_pool(x: jnp.ndarray, window: int, stride: int,
             padding: int = 0) -> jnp.ndarray:
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1), pad)


class BasicConv2d(nn.Module):
    """Conv (no bias) + eval-mode BatchNorm + ReLU — torchvision's
    BasicConv2d.  BN runs on stored statistics; all four BN tensors live in
    the param tree so the torch converter is a pure name/layout map."""

    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.stride,
                    padding=_pairs(self.padding), use_bias=False,
                    name="conv")(x)
        shape = (self.features,)
        scale = self.param("bn_scale", nn.initializers.ones, shape)
        bias = self.param("bn_bias", nn.initializers.zeros, shape)
        mean = self.param("bn_mean", nn.initializers.zeros, shape)
        var = self.param("bn_var", nn.initializers.ones, shape)
        x = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    include_pad: bool  # True: stock torchvision; False: pytorch-fid patch

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = avg_pool_3x3(x, include_pad=self.include_pad)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    include_pad: bool

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool_3x3(x, include_pad=self.include_pad)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # "avg_true" (stock), "avg_excl" (FIDInceptionE_1), "max" (FIDInceptionE_2)
    pool_mode: str

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = max_pool(x, 3, 1, padding=1)
        else:
            bp = avg_pool_3x3(x, include_pad=(self.pool_mode == "avg_true"))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision ``inception_v3`` eval graph (aux classifier excluded —
    it does not feed the features or logits at eval time).

    variant="torchvision": stock pooling, 1000-class head.
    variant="fid": pytorch-fid pooling patches, 1008-class head.
    """

    variant: str = "fid"
    num_classes: Optional[int] = None

    @nn.compact
    def __call__(self, x, return_logits: bool = False):
        fid = self.variant == "fid"
        include_pad = not fid
        x = BasicConv2d(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        x = InceptionA(32, include_pad, name="Mixed_5b")(x)
        x = InceptionA(64, include_pad, name="Mixed_5c")(x)
        x = InceptionA(64, include_pad, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, include_pad, name="Mixed_6b")(x)
        x = InceptionC(160, include_pad, name="Mixed_6c")(x)
        x = InceptionC(160, include_pad, name="Mixed_6d")(x)
        x = InceptionC(192, include_pad, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg_excl" if fid else "avg_true", name="Mixed_7b")(x)
        x = InceptionE("max" if fid else "avg_true", name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)
        if not return_logits:
            return pool3
        n_cls = self.num_classes or (1008 if fid else 1000)
        logits = nn.Dense(n_cls, name="fc")(pool3)
        return pool3, logits


# --------------------------------------------------------------------------
# torch state-dict ingestion
# --------------------------------------------------------------------------

_BN_MAP = {"weight": "bn_scale", "bias": "bn_bias",
           "running_mean": "bn_mean", "running_var": "bn_var"}


def convert_torch_inception_state_dict(state_dict) -> dict:
    """torchvision/pytorch-fid ``inception_v3`` state dict -> flax params.

    Pure name/layout map: ``X.conv.weight`` (OIHW) -> ``X/conv/kernel``
    (HWIO), ``X.bn.{weight,bias,running_mean,running_var}`` ->
    ``X/bn_{scale,bias,mean,var}``, ``fc.{weight,bias}`` -> dense kernel
    (transposed) / bias.  ``AuxLogits.*`` and ``num_batches_tracked`` are
    dropped (eval graph).  Raises on any other unrecognized key so a wrong
    checkpoint fails loudly instead of silently half-loading.
    """
    params: dict = {}

    def put(path: List[str], value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(np.asarray(value))

    for key, tensor in state_dict.items():
        parts = key.split(".")
        if parts[0] == "AuxLogits" or parts[-1] == "num_batches_tracked":
            continue
        if parts[0] == "fc":
            w = np.asarray(tensor)
            if parts[1] == "weight":
                put(["fc", "kernel"], w.T)  # (out,in) -> (in,out)
            else:
                put(["fc", "bias"], w)
            continue
        if parts[-2] == "conv" and parts[-1] == "weight":
            w = np.asarray(tensor).transpose(2, 3, 1, 0)  # OIHW -> HWIO
            put(parts[:-2] + ["conv", "kernel"], w)
            continue
        if parts[-2] == "bn" and parts[-1] in _BN_MAP:
            put(parts[:-2] + [_BN_MAP[parts[-1]]], tensor)
            continue
        raise ValueError(f"unrecognized inception checkpoint key: {key}")
    return params


def detect_variant(state_dict) -> str:
    """pytorch-fid FID weights carry a 1008-class fc; torchvision's
    inception_v3_google carries 1000 (and an AuxLogits head)."""
    fc = state_dict.get("fc.weight")
    if fc is not None and np.asarray(fc).shape[0] == 1008:
        return "fid"
    return "torchvision"


def inception_preprocess(images, size: int = 299) -> jnp.ndarray:
    """PIL images / HWC uint8 arrays -> (B, size, size, 3) float32 in
    [-1, 1]: the pytorch-fid protocol ([0,1] -> bilinear resize to 299 ->
    x*2-1).  cleanfid's "clean" mode differs only in its resize filter
    (bicubic on uint8); documented delta, same feature space."""
    arrs = []
    for im in images:
        a = np.asarray(im)
        if a.dtype != np.uint8 and a.max() <= 1.0 + 1e-6:
            a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=-1)
        arrs.append(a.astype(np.float32) / 255.0)
    batch = jnp.asarray(np.stack(arrs))
    if batch.shape[1] != size or batch.shape[2] != size:
        batch = jax.image.resize(
            batch, (batch.shape[0], size, size, 3), method="bilinear")
    return batch * 2.0 - 1.0


class InceptionFeatureExtractor:
    """``extract(images) -> (B, 2048)`` pool3 features — the pluggable
    contract of eval/fid.py; also exposes classifier ``predict_proba`` for
    the Inception Score protocol (eval/inception_score.py)."""

    def __init__(self, params, variant: str = "fid", batch_size: int = 32,
                 label: str = "inception_v3"):
        self.model = InceptionV3(variant=variant)
        self.params = params
        self.batch_size = batch_size
        self.label = label
        self._features = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))
        self._with_logits = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x,
                                          return_logits=True))

    @classmethod
    def from_torch_checkpoint(cls, path: str, batch_size: int = 32):
        """Ingest a torchvision ``inception_v3_google-*.pth`` or pytorch-fid
        ``pt_inception-2015-12-05-*.pth`` file (auto-detected)."""
        import torch

        state_dict = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(state_dict, "state_dict"):
            state_dict = state_dict.state_dict()
        variant = detect_variant(state_dict)
        params = convert_torch_inception_state_dict(state_dict)
        return cls(params, variant=variant, batch_size=batch_size,
                   label=f"inception_v3({variant})")

    @classmethod
    def seeded(cls, seed: int = 0, batch_size: int = 32):
        """Deterministic random-weight graph for offline regression numbers
        (NOT a published metric; callers label outputs accordingly).

        Conv kernels are rescaled from flax's lecun init to He init (x sqrt 2):
        with pass-through BN (running mean 0 / var 1) every ReLU halves the
        activation variance, so lecun-init features collapse to ~0 after the
        ~20-conv-deep trunk and FID/ISC degenerate.  He scaling keeps the
        feature variance O(1) so the seeded graph actually discriminates."""
        model = InceptionV3(variant="fid")
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, 128, 128, 3)),
                            return_logits=True)["params"]
        params = jax.tree_util.tree_map_with_path(
            lambda path, leaf: leaf * np.sqrt(2.0)
            if path and getattr(path[-1], "key", None) == "kernel" else leaf,
            params)
        return cls(params, variant="fid", batch_size=batch_size,
                   label=f"inception_v3_seeded(seed={seed})")

    def _batches(self, images):
        images = list(images)
        for start in range(0, len(images), self.batch_size):
            yield inception_preprocess(images[start:start + self.batch_size])

    def extract(self, images) -> np.ndarray:
        feats = [np.asarray(self._features(self.params, px), np.float64)
                 for px in self._batches(images)]
        return np.concatenate(feats, axis=0)

    def predict_proba(self, images) -> np.ndarray:
        """Class probabilities for Inception Score (softmax over the
        classifier head; the reference ISC protocol)."""
        probs = []
        for px in self._batches(images):
            _, logits = self._with_logits(self.params, px)
            probs.append(np.asarray(jax.nn.softmax(logits, -1), np.float64))
        return np.concatenate(probs, axis=0)
