"""Convert reference PyTorch checkpoints to the native flax format (and back).

The reference ships a Flax->PyTorch converter for the original MaskGIT
tokenizer (scripts/convert_maskgit_vqgan.py); our framework natively ingests
torch checkpoints on load (core/convert.py), so this CLI just materializes the
conversion once (faster subsequent loads) and provides the reverse direction
(flax -> torch state_dict) for interop with the reference.

Usage:
  python scripts/convert_checkpoint.py --input path/to/torch_ckpt_dir \
      --output path/to/flax_dir [--model-class MaskGiTUViT_v2]
  python scripts/convert_checkpoint.py --input flax_dir --output torch_dir \
      --to-torch
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLASSES = ["MaskGitVQGAN", "VQGANModel", "MOVQ", "PaellaVQModel",
           "MaskGitTransformer", "MaskGiTUViT_v2", "CLIPTextEncoder"]


def resolve_class(path, override=None):
    import open_muse_tpu
    from open_muse_tpu.core.configuration import load_config_dict

    if override:
        return getattr(open_muse_tpu, override)
    cfg = load_config_dict(path)
    name = cfg.get("_class_name")
    aliases = {"MaskGiTUViT": "MaskGiTUViT_v2",
               "CLIPTextModelWithProjection": "CLIPTextEncoder"}
    name = aliases.get(name, name)
    if name not in CLASSES:
        raise SystemExit(f"unknown class {name}")
    return getattr(open_muse_tpu, name)


def to_torch_state_dict(model):
    """flax params -> torch-layout flat state dict (numpy tensors)."""
    from open_muse_tpu.core.convert import flatten_dict

    out = {}
    for key, value in flatten_dict(model.params).items():
        arr = np.asarray(value)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "kernel":
            if arr.ndim == 2:
                arr = arr.T
            elif arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            leaf = "weight"
        elif leaf in ("scale", "embedding"):
            leaf = "weight"
        # flax list-index names back to torch dots: name_3 -> name.3
        import re

        body = [re.sub(r"_(\d+)$", r".\1", p) for p in parts[:-1]]
        out[".".join(body + [leaf])] = arr
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--model-class", default=None)
    parser.add_argument("--to-torch", action="store_true")
    args = parser.parse_args(argv)

    cls = resolve_class(args.input, args.model_class)
    model = cls.from_pretrained(args.input)
    if args.to_torch:
        os.makedirs(args.output, exist_ok=True)
        state = to_torch_state_dict(model)
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
                  os.path.join(args.output, "model.safetensors"))
        model.save_config(args.output)
        print(f"wrote torch-layout checkpoint to {args.output}")
    else:
        model.save_pretrained(args.output)
        print(f"wrote native flax checkpoint to {args.output}")


if __name__ == "__main__":
    main()
