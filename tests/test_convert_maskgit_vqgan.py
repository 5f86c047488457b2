"""Original Google-MaskGIT Flax checkpoint -> MaskGitVQGAN converter test.

Builds a synthetic checkpoint in the ORIGINAL key space (encoder.ResBlock_N,
decoder.Conv_N, quantizer.codebook — the layout the reference's
scripts/convert_maskgit_vqgan.py:31-150 consumes), converts it, and asserts
every tensor lands on the right parameter bit-exactly.
"""

import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from convert_maskgit_vqgan import (  # noqa: E402
    BLOCK_MAP, convert, rename_original_flax_dict,
)

VQ_KW = dict(resolution=64, hidden_channels=32, channel_mult=(1, 1, 2, 2, 4),
             num_res_blocks=2, z_channels=32, num_embeddings=64,
             quantized_embed_dim=32)

_INV_PART = {"conv1": "Conv_0", "conv2": "Conv_1", "nin_shortcut": "Conv_2",
             "norm1": "GroupNorm_0", "norm2": "GroupNorm_1"}
_INV_BLOCK = {v: k for k, v in BLOCK_MAP.items()}


def _to_original_key(path: str) -> str:
    """Our param path -> the original MaskGIT Flax checkpoint key."""
    parts = path.split(".")
    tower = parts[0]
    if path == "quantize.embedding.embedding":
        return "quantizer.codebook"
    if parts[1].startswith("mid_"):
        k = int(parts[1].split("_")[1])
        base = 10 if tower == "encoder" else 0
        return f"{tower}.ResBlock_{base + k}.{_INV_PART[parts[2]]}.{parts[3]}"
    if parts[1].startswith("down_"):
        lvl, blk = int(parts[1].split("_")[1]), int(parts[2].split("_")[1])
        return f"encoder.ResBlock_{_INV_BLOCK[(lvl, blk)]}." \
               f"{_INV_PART[parts[3]]}.{parts[4]}"
    if parts[1].startswith("up_"):
        lvl = int(parts[1].split("_")[1])
        if parts[2] == "upsample_conv":
            return f"decoder.Conv_{5 - lvl}.{parts[3]}"
        blk = int(parts[2].split("_")[1])
        return f"decoder.ResBlock_{2 + _INV_BLOCK[(4 - lvl, blk)]}." \
               f"{_INV_PART[parts[3]]}.{parts[4]}"
    name = {"conv_in": "Conv_0",
            "conv_out": "Conv_1" if tower == "encoder" else "Conv_5",
            "norm_out": "GroupNorm_0"}[parts[1]]
    return f"{tower}.{name}.{parts[2]}"


def _synthetic_original_checkpoint():
    """Original-key-space flat dict with distinct values per tensor, shaped
    for VQ_KW."""
    from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN

    model = MaskGitVQGAN(**VQ_KW)
    rs = np.random.RandomState(0)
    flat_ours = {
        ".".join(str(getattr(k, "key", k)) for k in kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(model.params)[0]
    }
    original = {_to_original_key(p): rs.randn(*leaf.shape).astype(np.float32)
                for p, leaf in flat_ours.items()}
    assert len(original) == len(flat_ours), "inverse mapping collided"
    return original, flat_ours


def test_rename_covers_every_param_exactly():
    original, flat_ours = _synthetic_original_checkpoint()
    renamed = rename_original_flax_dict(original)
    assert set(renamed) == set(flat_ours)
    for our_path in flat_ours:
        np.testing.assert_array_equal(
            renamed[our_path], original[_to_original_key(our_path)],
            err_msg=our_path)


def test_convert_cli_roundtrip(tmp_path):
    from flax import serialization

    from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN

    original, _ = _synthetic_original_checkpoint()
    # nest into the original {'params': {encoder: {ResBlock_0: ...}}} layout
    nested: dict = {}
    for key, val in original.items():
        node = nested
        ps = key.split(".")
        for p in ps[:-1]:
            node = node.setdefault(p, {})
        node[ps[-1]] = val
    ckpt = tmp_path / "tokenizer_checkpoint"
    ckpt.write_bytes(serialization.msgpack_serialize({"params": nested}))

    out_dir = str(tmp_path / "converted")
    model = convert(str(ckpt), out_dir, **VQ_KW)

    # reload through the standard pretrained path and run the tokenizer
    loaded = MaskGitVQGAN.from_pretrained(out_dir)
    flat = {
        ".".join(str(getattr(k, "key", k)) for k in kp): np.asarray(leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(loaded.params)[0]
    }
    for our_path, arr in flat.items():
        np.testing.assert_array_equal(
            arr, original[_to_original_key(our_path)], err_msg=our_path)

    import jax.numpy as jnp

    pixels = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3),
                         dtype=jnp.float32)
    codes = model.get_code(pixels)
    assert codes.shape == (1, (64 // 16) ** 2)


def test_convert_rejects_shape_mismatch(tmp_path):
    from flax import serialization

    original, _ = _synthetic_original_checkpoint()
    original["quantizer.codebook"] = np.zeros((7, 7), dtype=np.float32)
    nested: dict = {}
    for key, val in original.items():
        node = nested
        ps = key.split(".")
        for p in ps[:-1]:
            node = node.setdefault(p, {})
        node[ps[-1]] = val
    ckpt = tmp_path / "bad_checkpoint"
    ckpt.write_bytes(serialization.msgpack_serialize({"params": nested}))
    with pytest.raises(ValueError, match="shape"):
        convert(str(ckpt), str(tmp_path / "out"), **VQ_KW)
