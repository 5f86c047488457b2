#!/usr/bin/env python
"""Convert the ORIGINAL Google MaskGIT Flax tokenizer checkpoint
(tokenizer_imagenet256_checkpoint, maskgit-public GCS bucket) into an
open_muse_tpu MaskGitVQGAN pretrained directory.

This is the ground-truth bridge the reference implements in
/root/reference/scripts/convert_maskgit_vqgan.py:31-150 (Flax->PyTorch key
renames).  Ours maps the same original key space directly onto our flax
module tree — no layout transposes are needed because both sides are flax
HWIO convs; only the module names differ:

  original                                  ours
  ------------------------------------------------------------------
  encoder.ResBlock_{0..9}.Conv_0            encoder.down_{i}.block_{j}.conv1
  encoder.ResBlock_{10,11}.*                encoder.mid_{0,1}.*
  encoder.Conv_0 / Conv_1 / GroupNorm_0     conv_in / conv_out / norm_out
  decoder.ResBlock_{0,1}.*                  decoder.mid_{0,1}.*
  decoder.ResBlock_{2..11}.*                decoder.up_{4-i}.block_{j}.*
  decoder.Conv_{1..4}                       decoder.up_{5-k}.upsample_conv
  decoder.Conv_0 / Conv_5 / GroupNorm_0     conv_in / conv_out / norm_out
  quantizer.codebook                        quantize.embedding.embedding

Usage:
  python scripts/convert_maskgit_vqgan.py FLAX_CKPT OUT_DIR
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 10 per-level res blocks -> (level, block-in-level); 2 blocks per level
# (reference convert_maskgit_vqgan.py:39-50)
BLOCK_MAP = {i: (i // 2, i % 2) for i in range(10)}

_RES_PART = {"Conv_0": "conv1", "Conv_1": "conv2", "Conv_2": "nin_shortcut",
             "GroupNorm_0": "norm1", "GroupNorm_1": "norm2"}


def _rename_one(key: str) -> str:
    """One '.'-joined original key -> our '.'-joined param path."""
    parts = key.split(".")
    tower, rest = parts[0], parts[1:]

    if tower == "quantizer":
        return "quantize.embedding.embedding"

    if rest[0].startswith("ResBlock_"):
        idx = int(rest[0].split("_")[1])
        part = _RES_PART[rest[1]]
        if tower == "encoder":
            if idx >= 10:  # ResBlock_10/11 = encoder mid
                return f"encoder.mid_{idx - 10}.{part}.{rest[-1]}"
            lvl, blk = BLOCK_MAP[idx]
            return f"encoder.down_{lvl}.block_{blk}.{part}.{rest[-1]}"
        if idx < 2:  # ResBlock_0/1 = decoder mid
            return f"decoder.mid_{idx}.{part}.{rest[-1]}"
        lvl, blk = BLOCK_MAP[idx - 2]
        return f"decoder.up_{4 - lvl}.block_{blk}.{part}.{rest[-1]}"

    if rest[0].startswith("Conv_"):
        idx = int(rest[0].split("_")[1])
        if tower == "encoder":
            name = {0: "conv_in", 1: "conv_out"}[idx]
            return f"encoder.{name}.{rest[-1]}"
        if idx == 0:
            return f"decoder.conv_in.{rest[-1]}"
        if idx == 5:
            return f"decoder.conv_out.{rest[-1]}"
        # decoder Conv_1..4 are the nearest-upsample convs, reversed
        # (reference convert_maskgit_vqgan.py:119-126)
        return f"decoder.up_{5 - idx}.upsample_conv.{rest[-1]}"

    if rest[0] == "GroupNorm_0":
        return f"{tower}.norm_out.{rest[-1]}"

    raise KeyError(f"unrecognized original MaskGIT key: {key}")


def rename_original_flax_dict(flat_params: dict) -> dict:
    """{'encoder.ResBlock_0.Conv_0.kernel': arr, ...} (keys may also be
    tuples) -> {our_path: arr}."""
    out = {}
    for key, value in flat_params.items():
        if isinstance(key, tuple):
            key = ".".join(key)
        out[_rename_one(key)] = np.asarray(value)
    return out


def flat_to_tree(flat: dict) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def convert(flax_ckpt_path: str, out_dir: str, **model_kwargs):
    """Load the original checkpoint, rename, and save as a pretrained dir."""
    from flax import serialization
    from flax.traverse_util import flatten_dict

    from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN

    with open(flax_ckpt_path, "rb") as f:
        raw = f.read()
    try:
        state = serialization.msgpack_restore(raw)
    except Exception:
        import pickle

        state = pickle.loads(raw)
    params = state.get("params", state)
    flat = flatten_dict(params)
    renamed = rename_original_flax_dict(flat)

    model = MaskGitVQGAN(**model_kwargs)
    import jax

    expected = {
        ".".join(str(getattr(k, "key", k)) for k in kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(model.params)[0]
    }
    missing = sorted(set(expected) - set(renamed))
    unexpected = sorted(set(renamed) - set(expected))
    if missing or unexpected:
        raise ValueError(f"key mismatch: missing={missing[:5]} "
                         f"unexpected={unexpected[:5]}")
    for k, v in renamed.items():
        if tuple(v.shape) != tuple(expected[k].shape):
            raise ValueError(f"{k}: checkpoint shape {v.shape} != model "
                             f"shape {expected[k].shape}")
    model.params = flat_to_tree(renamed)
    model.save_pretrained(out_dir)
    return model


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("flax_ckpt")
    ap.add_argument("out_dir")
    args = ap.parse_args()
    convert(args.flax_ckpt, args.out_dir)
    print(f"saved converted MaskGitVQGAN to {args.out_dir}")


if __name__ == "__main__":
    main()
