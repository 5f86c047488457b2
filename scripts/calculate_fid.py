"""FID evaluation: generate images from COCO/Flickr caption files and score.

Reference parity: scripts/calculate_fid.py — 30k COCO-caption generation
(SLURM-sharded, :107-180) or Flickr8k (:41-104), then cleanfid (:215-220).

TPU version: generation shards across hosts by --task-id/--num-tasks (or
jax.process_index); FID uses `cleanfid` when installed, else a built-in
InceptionV3-free fallback (torchvision inception if available) is skipped with
a clear message — generation still runs so images can be scored offline.

Usage:
  python scripts/calculate_fid.py --model path/to/pipeline \
      --captions captions.txt --output-dir fid_out/ --num-images 1000 \
      [--timesteps 12 --guidance-scale 8] [--real-dir path/to/real/images]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_and_save_images(pipe, captions, output_dir, batch_size, timesteps,
                             guidance_scale, seed: int = 0,
                             global_indices=None):
    """Generate and save images named by GLOBAL caption index.

    With --num-tasks N sharding, every task writes into the same output dir
    (the fid_pod.sh wait-then-score flow scores that dir on worker 0), so
    filenames must be globally unique across tasks — the reference names
    images by dataset __key__ (reference scripts/calculate_fid.py:163-166).
    `global_indices[i]` is the position of captions[i] in the unsharded list.
    """
    import jax

    if global_indices is None:
        global_indices = list(range(len(captions)))
    os.makedirs(output_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    for start in range(0, len(captions), batch_size):
        chunk = captions[start:start + batch_size]
        key, step_key = jax.random.split(key)
        images = pipe(list(chunk), timesteps=timesteps, guidance_scale=guidance_scale,
                      key=step_key)
        for i, img in enumerate(images):
            img.save(os.path.join(
                output_dir, f"{global_indices[start + i]:06d}.png"))
    dt = time.time() - t0
    print(f"generated {len(captions)} images in {dt:.1f}s "
          f"({len(captions) / max(dt, 1e-9):.2f} img/s)")


def compute_fid(real_dir: str, fake_dir: str, clip_model: str = None):
    """Score fake_dir against real_dir.  Backend priority:
    cleanfid (Inception, the reference protocol) > in-repo CLIP-FID with real
    weights (--clip-model) > in-repo seeded-extractor regression number
    (clearly labeled; deterministic but NOT a published metric)."""
    try:
        from cleanfid import fid

        score = fid.compute_fid(real_dir, fake_dir)
        print(json.dumps({"fid": score, "backend": "cleanfid"}))
        return score
    except ImportError:
        pass
    from open_muse_tpu.eval.fid import CLIPFeatureExtractor, fid_between_dirs

    if clip_model:
        from open_muse_tpu.models.clip_vision import CLIPVisionEncoder

        extractor = CLIPFeatureExtractor(
            CLIPVisionEncoder.from_pretrained(clip_model))
        backend = f"clip_fid({clip_model})"
    else:
        extractor = CLIPFeatureExtractor.seeded(seed=1234)
        backend = "clipfeat_seeded(NOT a published metric; deterministic)"
        print("cleanfid not installed and no --clip-model given; scoring "
              "with a seeded extractor — regression number only",
              file=sys.stderr)
    score = fid_between_dirs(real_dir, fake_dir, extractor)
    print(json.dumps({"fid": score, "backend": backend}))
    return score


def compute_clip_score(fake_dir: str, captions, clip_model: str):
    """Mean CLIP score of generated images vs their captions (the metric
    behind the reference's CLIP-vs-CFG curves, benchmark/model_quality.py)."""
    from open_muse_tpu.eval.clip_score import clip_score
    from open_muse_tpu.eval.fid import load_image_dir
    from open_muse_tpu.models.clip_vision import CLIPScorer

    scorer = CLIPScorer.from_pretrained(clip_model)
    images = load_image_dir(fake_dir, limit=len(captions))
    score = clip_score(scorer, images, captions[: len(images)])
    print(json.dumps({"clip_score": score, "n_images": len(images)}))
    return score


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="pipeline dir")
    parser.add_argument("--captions", required=True,
                        help="txt file, one caption per line (or COCO json)")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--real-dir", default=None)
    parser.add_argument("--num-images", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--timesteps", type=int, default=12)
    parser.add_argument("--guidance-scale", type=float, default=8.0)
    parser.add_argument("--task-id", type=int, default=0)
    parser.add_argument("--num-tasks", type=int, default=1)
    parser.add_argument("--clip-model", default=None,
                        help="CLIP checkpoint dir: enables CLIP-FID fallback "
                             "and --clip-score")
    parser.add_argument("--clip-score", action="store_true",
                        help="also report mean CLIP score vs captions")
    args = parser.parse_args(argv)

    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    if args.captions.endswith(".json"):
        with open(args.captions) as f:
            coco = json.load(f)
        captions = [a["caption"] for a in coco.get("annotations", [])]
    else:
        with open(args.captions) as f:
            captions = [line.strip() for line in f if line.strip()]
    all_captions = captions[: args.num_images]
    # per-task shard (reference SLURM sharding, calculate_fid.py:74-142);
    # keep the global index of each sharded caption for collision-free names
    global_indices = list(range(len(all_captions)))[args.task_id::args.num_tasks]
    captions = all_captions[args.task_id::args.num_tasks]

    if captions:
        pipe = PipelineMuse.from_pretrained(args.model)
        generate_and_save_images(pipe, captions, args.output_dir,
                                 args.batch_size, args.timesteps,
                                 args.guidance_scale, seed=args.task_id,
                                 global_indices=global_indices)

    if args.real_dir and args.num_tasks == 1:
        compute_fid(args.real_dir, args.output_dir, clip_model=args.clip_model)
    if args.clip_score:
        if not args.clip_model:
            parser.error("--clip-score needs --clip-model")
        compute_clip_score(args.output_dir, all_captions, args.clip_model)


if __name__ == "__main__":
    main()
