"""Pre-encode throughput benchmark: the offline tokenization path at research
model sizes (dual VQ + CLIP text) on one chip.

Reference numbers to compare against (/root/reference/scripts/pre_encode.py:11-27):
COYO 64.1 GPU-s/shard, LAION 75 GPU-s/shard on A100 nodes; at ~9.4k samples
per COYO shard that is ~146 imgs/s per A100.

Protocol here: research-size taming f16 VQGAN + Paella f8 VQ + CLIP-L-text
(random weights — throughput does not depend on weight values), one synthetic
tar shard of 256px JPEGs, `scripts/pre_encode.py` run twice (cold run pays the
jit compile; the second, warm run is the reported number).

Usage: python benchmark/bench_pre_encode.py [--n-images 512 --batch-size 64]
Prints one JSON line with imgs_per_sec and the A100-equivalent s/shard.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COYO_IMGS_PER_SHARD = 9364  # 74752 shards / COYO-700M (reference :11-27)
A100_COYO_S_PER_SHARD = 64.1


def make_shard(path: str, n: int, resolution: int):
    from PIL import Image

    rs = np.random.RandomState(0)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            arr = rs.randint(0, 255, (resolution, resolution, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"synthetic caption number {i}".encode()
            info = tarfile.TarInfo(f"{i:06d}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))


def save_models(root: str):
    from open_muse_tpu.models.clip_text import CLIPTextEncoder
    from open_muse_tpu.models.paella_vq import PaellaVQModel
    from open_muse_tpu.models.taming_vqgan import VQGANModel

    f16 = os.path.join(root, "vae_f16")
    f8 = os.path.join(root, "vae_f8")
    clip = os.path.join(root, "clip")
    VQGANModel(resolution=256, num_embeddings=8192,
               channel_mult=(1, 1, 2, 2, 4), z_channels=256,
               quantized_embed_dim=256).save_pretrained(f16)
    PaellaVQModel().save_pretrained(f8)
    CLIPTextEncoder(vocab_size=49408, hidden_size=768, intermediate_size=3072,
                    num_hidden_layers=12, num_attention_heads=12,
                    max_position_embeddings=77,
                    projection_dim=768).save_pretrained(clip)
    return f16, f8, clip


def run_once(shard, out_dir, f16, f8, clip, batch_size, resolution):
    from scripts.pre_encode import main as pre_encode_main

    t0 = time.perf_counter()
    stats = pre_encode_main(["--shards", shard, "--output-dir", out_dir,
                             "--vae-f16", f16, "--vae-f8", f8,
                             "--text-encoder", clip,
                             "--batch-size", str(batch_size),
                             "--resolution", str(resolution)])
    return time.perf_counter() - t0, stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-images", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--resolution", type=int, default=256)
    args = parser.parse_args(argv)

    from bench import _enable_compile_cache

    _enable_compile_cache()
    with tempfile.TemporaryDirectory() as tmp:
        shard = os.path.join(tmp, "shard-000000.tar")
        make_shard(shard, args.n_images, args.resolution)
        f16, f8, clip = save_models(tmp)
        total, stats = run_once(shard, os.path.join(tmp, "out"), f16, f8,
                                clip, args.batch_size, args.resolution)
    imgs_per_sec = stats.get("steady_imgs_per_sec", stats["imgs_per_sec"])
    s_per_shard = COYO_IMGS_PER_SHARD / imgs_per_sec
    print(json.dumps({
        "metric": "pre_encode_throughput", "value": round(imgs_per_sec, 1),
        "unit": "imgs/s/chip (steady-state, excl. first-batch compile)",
        "total_s_incl_compile": round(total, 1),
        "coyo_equiv_s_per_shard": round(s_per_shard, 1),
        "a100_published_s_per_shard": A100_COYO_S_PER_SHARD,
        "vs_a100": round(A100_COYO_S_PER_SHARD / s_per_shard, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
