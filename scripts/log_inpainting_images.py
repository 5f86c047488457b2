"""Standalone inpainting logger — the reference
``scripts/log_inpainting_images.py:20-93`` analog.

Takes one input image and a rectangular mask given in LATENT coordinates
(``image_size // vae_scaling_factor`` per side), runs PipelineMuseInpainting
(text- or class-conditioned), and writes:

  output_dir/segmented.jpg          the input with the masked pixels zeroed
  output_dir/output[_{class}]_{i}.jpg   each generation
  output_dir/inpainting_grid.png    one PNG grid of all generations
                                    (replaces the reference's wandb panel)

Alternatively ``--validation-dir`` runs the whole inpainting_validation/
layout (folders of image+mask where the folder name is the prompt, the same
loader the in-training panels use) and writes one grid per folder.

Usage:
  python scripts/log_inpainting_images.py --model PATH --input-image cat.png \
      --text "a photo of a dog" --mask-start-x 4 --mask-end-x 12 \
      --mask-start-y 4 --mask-end-y 12 --output-dir generated/
  python scripts/log_inpainting_images.py --model PATH \
      --validation-dir inpainting_validation/ --output-dir generated/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        help="pipeline dir or hub id")
    parser.add_argument("--is-class-conditioned", action="store_true")
    parser.add_argument("--imagenet-class-id", type=int, default=248)
    parser.add_argument("--text", type=str, default="a picture of a dog")
    parser.add_argument("--input-image", type=str, default=None)
    parser.add_argument("--validation-dir", type=str, default=None,
                        help="inpainting_validation/-layout folder; "
                             "overrides --input-image")
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--vae-scaling-factor", type=int, default=16,
                        help="pixel->latent downsample (f16 MaskGit VQ)")
    parser.add_argument("--mask-start-x", type=int, default=4)
    parser.add_argument("--mask-start-y", type=int, default=4)
    parser.add_argument("--mask-end-x", type=int, default=12)
    parser.add_argument("--mask-end-y", type=int, default=12)
    parser.add_argument("--timesteps", type=int, default=18)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--guidance-scale", type=float, default=2.0)
    parser.add_argument("--num-generations", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output-dir", type=str, default="generated")
    return parser


def _save_outputs(images, output_dir, prefix, class_id=None):
    from open_muse_tpu.training.train_muse import save_image_grid

    for i, image in enumerate(images):
        tag = f"_{class_id}" if class_id is not None else ""
        image.save(os.path.join(output_dir, f"{prefix}{tag}_{i}.jpg"))
    arrays = np.stack([np.asarray(img, dtype=np.float32) / 255
                       for img in images])
    grid_path = os.path.join(output_dir, f"{prefix}_grid.png")
    save_image_grid(arrays, grid_path)
    return grid_path


def main(argv=None, pipe=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    from PIL import Image

    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuseInpainting

    if pipe is None:
        pipe = PipelineMuseInpainting.from_pretrained(
            args.model, is_class_conditioned=args.is_class_conditioned)
    key = jax.random.PRNGKey(args.seed)
    latent_side = args.image_size // args.vae_scaling_factor

    if args.validation_dir:
        from open_muse_tpu.training.train_muse import \
            load_inpainting_validation_data

        entries = load_inpainting_validation_data(
            args.validation_dir, args.image_size, latent_side)
        for entry in entries:
            prompt = entry["prompt"]
            key, sub = jax.random.split(key)
            images = pipe(image=entry["image"], mask=np.asarray(entry["mask"]),
                          text=prompt, timesteps=args.timesteps,
                          guidance_scale=args.guidance_scale,
                          temperature=args.temperature,
                          num_images_per_prompt=args.num_generations,
                          image_size=args.image_size, key=sub)
            slug = prompt.replace(" ", "_")[:60]
            grid = _save_outputs(images, args.output_dir, f"inpaint-{slug}")
            print(f"wrote {grid}")
        return 0

    if not args.input_image:
        raise SystemExit("--input-image or --validation-dir is required")

    # rectangular mask at latent resolution (reference :35-38); x indexes
    # rows and y columns, matching the reference's numpy slicing
    mask = np.zeros((latent_side, latent_side), dtype=bool)
    mask[args.mask_start_x:args.mask_end_x,
         args.mask_start_y:args.mask_end_y] = True

    image = Image.open(args.input_image).convert("RGB") \
        .resize((args.image_size, args.image_size))

    # the masked input, for eyeballing what was inpainted (reference :42-48)
    f = args.vae_scaling_factor
    masked_pixels = np.array(image)
    masked_pixels[args.mask_start_x * f:args.mask_end_x * f,
                  args.mask_start_y * f:args.mask_end_y * f] = 0
    Image.fromarray(masked_pixels).save(
        os.path.join(args.output_dir, "segmented.jpg"))

    if args.is_class_conditioned:
        cond = {"class_ids": args.imagenet_class_id}
    else:
        cond = {"text": args.text}
    images = pipe(image=image, mask=mask, **cond,
                  timesteps=args.timesteps,
                  guidance_scale=args.guidance_scale,
                  temperature=args.temperature,
                  num_images_per_prompt=args.num_generations,
                  image_size=args.image_size, key=key)
    class_id = args.imagenet_class_id if args.is_class_conditioned else None
    grid = _save_outputs(images, args.output_dir, "output", class_id=class_id)
    print(f"wrote {len(images)} generations + {grid}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
