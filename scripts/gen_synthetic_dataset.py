"""Generate a synthetic training set: N candidates per prompt, CLIP-scored.

Reference parity: scripts/gen_sdxl_synthetic_dataset.py:19-187 — the
reference generates 4 candidates per caption with SDXL, scores them with
CLIPModel (``logits_per_image``, :97-104) and writes ALL candidates plus
``clip_scores.txt`` to webdataset tar shards (:108-118); best-of-N selection
happens at training time in ``sdxl_synthetic_dataset_map``
(training/data.py:415-446).  Here the generator is any of OUR pipelines and
scoring uses the native CLIP towers (models/clip_vision.py).

Output schema per sample (round-trips through our sdxl_synthetic dataset map):
  {key}.{i}.png ... candidate images
  {key}.txt ........ the prompt
  {key}.clip_scores.txt ... comma-separated logits_per_image

With --candidates 1 a flat single-image schema is written instead
({key}.jpg/txt/json).

Usage:
  python scripts/gen_synthetic_dataset.py --model path/to/pipeline \
      --prompts prompts.txt --output shards/syn-%05d.tar \
      --candidates 4 --clip-model path/to/clip --samples-per-shard 1000
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
    parser.add_argument("--clip-model", default=None,
                        help="CLIP checkpoint dir (full CLIPModel or "
                             "vision+text subfolders) used to score candidates")
    parser.add_argument("--samples-per-shard", type=int, default=1000)
    parser.add_argument("--timesteps", type=int, default=12)
    parser.add_argument("--guidance-scale", type=float, default=8.0)
    args = parser.parse_args(argv)

    import jax

    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    scorer = None
    if args.clip_model:
        from open_muse_tpu.models.clip_vision import CLIPScorer

        scorer = CLIPScorer.from_pretrained(args.clip_model)
    elif args.candidates > 1:
        # the POINT of multi-candidate generation is CLIP selection; fail
        # loudly instead of silently wasting (N-1)/N of the compute
        parser.error("--candidates > 1 requires --clip-model (candidates are "
                     "CLIP-scored; without a scorer the extra samples would "
                     "be dead weight)")

    pipe = PipelineMuse.from_pretrained(args.model)
    with open(args.prompts) as f:
        prompts = [line.strip() for line in f if line.strip()]

    key = jax.random.PRNGKey(0)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    shard_idx, in_shard, tf = 0, 0, None

    def add(name, data):
        info = tarfile.TarInfo(name)
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))

    for p_idx, prompt in enumerate(prompts):
        key, sub = jax.random.split(key)
        candidates = pipe(prompt, num_images_per_prompt=args.candidates,
                          timesteps=args.timesteps,
                          guidance_scale=args.guidance_scale, key=sub)
        if tf is None:
            tf = tarfile.open(args.output % shard_idx, "w")
        sample_key = f"{p_idx:08d}"
        if scorer is not None and args.candidates > 1:
            # reference schema: ALL candidates + clip_scores.txt
            # (gen_sdxl_synthetic_dataset.py:108-118)
            scores = scorer.score(candidates, [prompt])[:, 0]
            for i, img in enumerate(candidates):
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                add(f"{sample_key}.{i}.png", buf.getvalue())
            add(f"{sample_key}.txt", prompt.encode())
            add(f"{sample_key}.clip_scores.txt",
                ",".join(str(float(s)) for s in scores).encode())
        else:
            best = candidates[0]
            if scorer is not None:
                best = candidates[scorer.best_of(candidates, prompt)]
            buf = io.BytesIO()
            best.save(buf, format="JPEG", quality=95)
            add(f"{sample_key}.jpg", buf.getvalue())
            add(f"{sample_key}.txt", prompt.encode())
            add(f"{sample_key}.json",
                json.dumps({"width": best.size[0], "height": best.size[1],
                            "synthetic": True}).encode())
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
