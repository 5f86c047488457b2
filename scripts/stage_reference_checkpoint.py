#!/usr/bin/env python
"""Stage a reference-format MUSE checkpoint directory for real-weights
validation.

The published research-run checkpoint
(williamberman/muse_research_run_benchmarking_512_output, consumed by
/root/reference/benchmark/muse_perf.py:242-270) is unreachable offline, so
this script produces the closest equivalent: it constructs the REFERENCE
PyTorch models at the research-run architecture (MaskGiTUViT_v2 defaults:
hidden 1024 / 22 layers / codebook 8192; taming VQGANModel f16; CLIP-L text
tower) with deterministic seeded weights, and exports them through the
reference's own ``save_pretrained`` into the published hub layout:

  OUT/
    transformer/config.json + pytorch_model.bin
    vae/config.json + pytorch_model.bin
    text_encoder/config.json + pytorch_model.bin (HF CLIPTextModelWithProjection)

Every byte of the result is a genuine reference checkpoint — same config
schema, same weight names, same serialization — exercising exactly the
from_pretrained -> generate -> decode chain a hub download would.

Usage:
  python scripts/stage_reference_checkpoint.py OUT_DIR [--size full|small]
"""

from __future__ import annotations

import argparse
import os
import sys

REFERENCE_PATH = os.environ.get("MUSE_REFERENCE_PATH", "/root/reference")

# structurally identical to the research run, scaled down for fast tests
SMALL_TRANSFORMER = dict(
    hidden_size=64, use_bias=False, hidden_dropout=0.0, attention_dropout=0.0,
    in_channels=32, block_out_channels=(32,), num_res_blocks=1,
    block_num_heads=2, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=96, vocab_size=68, codebook_size=64,
    encoder_hidden_size=32, cond_embed_dim=24, micro_cond_encode_dim=8,
    micro_cond_embed_dim=40,
)
SMALL_VAE = dict(resolution=64, hidden_channels=32, channel_mult=(1, 2),
                 num_res_blocks=1, z_channels=32, num_embeddings=64,
                 quantized_embed_dim=32, attn_resolutions=(32,))
SMALL_CLIP = dict(vocab_size=100, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  max_position_embeddings=77, projection_dim=24)
# CLIP-L/14 text tower (the research run's text encoder,
# openMUSE/clip-vit-large-patch14-text-enc)
FULL_CLIP = dict(vocab_size=49408, hidden_size=768, intermediate_size=3072,
                 num_hidden_layers=12, num_attention_heads=12,
                 max_position_embeddings=77, projection_dim=768)
# published f16 tokenizer: 8192-entry codebook (openMUSE/vqgan-f16-8192-laion)
FULL_VAE = dict(num_embeddings=8192)


def stage(out_dir: str, size: str = "full", seed: int = 0) -> str:
    import torch

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from muse import MaskGiTUViT, VQGANModel
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    os.makedirs(out_dir, exist_ok=True)

    torch.manual_seed(seed)
    transformer = MaskGiTUViT(
        use_fused_mlp=False, use_fused_residual_norm=False,
        **(SMALL_TRANSFORMER if size == "small" else {}))
    transformer.eval()
    transformer.save_pretrained(os.path.join(out_dir, "transformer"))

    torch.manual_seed(seed + 1)
    vae = VQGANModel(**(SMALL_VAE if size == "small" else FULL_VAE))
    vae.eval()
    vae.save_pretrained(os.path.join(out_dir, "vae"))

    torch.manual_seed(seed + 2)
    clip_cfg = CLIPTextConfig(**(SMALL_CLIP if size == "small" else FULL_CLIP))
    text_encoder = CLIPTextModelWithProjection(clip_cfg)
    text_encoder.eval()
    text_encoder.save_pretrained(os.path.join(out_dir, "text_encoder"),
                                 safe_serialization=False)
    return out_dir


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--size", choices=("full", "small"), default="full")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    stage(args.out_dir, size=args.size, seed=args.seed)
    print(f"staged reference checkpoint ({args.size}) at {args.out_dir}")


if __name__ == "__main__":
    main()
