"""Qualitative sample grids from a pipeline checkpoint.

Reference parity: scripts/log_generations_wandb.py and
log_inpainting_images.py — generate images for fixed validation prompt lists
(validation_prompts/, inpainting_validation/ where the folder name is the
prompt, train_muse.py:1220-1244) and log them.  Logs to wandb when available,
always writes PNG grids locally.

Usage:
  python scripts/log_generations.py --model path/to/pipeline \
      --prompts validation_prompts/dalle_mini_prompts.txt --output-dir gens/
  python scripts/log_generations.py --model ... --inpainting-dir inpainting_validation/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--prompts", default=None, help="txt file of prompts")
    parser.add_argument("--inpainting-dir", default=None,
                        help="dirs of image.png+mask.png; dir name = prompt")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--timesteps", type=int, default=12)
    parser.add_argument("--guidance-scale", type=float, default=8.0)
    parser.add_argument("--batch-size", type=int, default=8)
    args = parser.parse_args(argv)

    import jax

    from open_muse_tpu.pipelines.pipeline_muse import (PipelineMuse,
                                                       PipelineMuseInpainting)
    from open_muse_tpu.training.train_muse import save_image_grid

    os.makedirs(args.output_dir, exist_ok=True)
    wandb = None
    try:
        import wandb as _wandb

        wandb = _wandb
        wandb.init(project="muse-tpu-generations")
    except Exception:
        pass

    key = jax.random.PRNGKey(0)

    if args.prompts:
        pipe = PipelineMuse.from_pretrained(args.model)
        with open(args.prompts) as f:
            prompts = [line.strip() for line in f if line.strip()]
        for start in range(0, len(prompts), args.batch_size):
            chunk = prompts[start:start + args.batch_size]
            key, sub = jax.random.split(key)
            images = pipe(chunk, timesteps=args.timesteps,
                          guidance_scale=args.guidance_scale, key=sub)
            arrays = np.stack([np.asarray(img, dtype=np.float32) / 255 for img in images])
            out = os.path.join(args.output_dir, f"generations-{start:04d}.png")
            save_image_grid(arrays, out)
            if wandb is not None:
                wandb.log({"generations": [wandb.Image(img, caption=p)
                                           for img, p in zip(images, chunk)]})
            print(f"wrote {out}")

    if args.inpainting_dir:
        from PIL import Image

        pipe = PipelineMuseInpainting.from_pretrained(args.model)
        for prompt_dir in sorted(os.listdir(args.inpainting_dir)):
            full = os.path.join(args.inpainting_dir, prompt_dir)
            if not os.path.isdir(full):
                continue
            files = os.listdir(full)
            img_file = next((f for f in files if "mask" not in f.lower()
                             and f.lower().endswith((".png", ".jpg"))), None)
            mask_file = next((f for f in files if "mask" in f.lower()), None)
            if not img_file or not mask_file:
                continue
            image = Image.open(os.path.join(full, img_file))
            mask_img = Image.open(os.path.join(full, mask_file)).convert("L")
            prompt = prompt_dir.replace("_", " ")
            # mask at latent resolution
            latent_side = 16
            mask = np.asarray(mask_img.resize((latent_side, latent_side))) > 127
            key, sub = jax.random.split(key)
            images = pipe(image=image, mask=mask, text=prompt,
                          timesteps=args.timesteps,
                          guidance_scale=args.guidance_scale, key=sub)
            out = os.path.join(args.output_dir, f"inpaint-{prompt_dir}.png")
            images[0].save(out)
            if wandb is not None:
                wandb.log({"inpainting": wandb.Image(images[0], caption=prompt)})
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
