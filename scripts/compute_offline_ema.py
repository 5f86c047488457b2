"""Reconstruct an EMA model post-hoc from a saved checkpoint series.

Reference parity: scripts/compute_offline_ema.py:10-56 — walk checkpoint-*/
dirs in step order, fold each unwrapped model into an EMA accumulator, save
the result as a pretrained dir.

Usage:
  python scripts/compute_offline_ema.py --checkpoints-dir runs/exp1 \
      --output runs/exp1/offline_ema --decay 0.9999
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoints-dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--decay", type=float, default=0.9999)
    parser.add_argument("--model-class", default="MaskGiTUViT_v2")
    args = parser.parse_args(argv)

    import open_muse_tpu
    from open_muse_tpu.training.ema import EMAModel

    model_cls = getattr(open_muse_tpu, args.model_class)

    dirs = sorted(
        (d for d in os.listdir(args.checkpoints_dir) if d.startswith("checkpoint-")),
        key=lambda d: int(d.split("-")[1]))
    if not dirs:
        raise SystemExit(f"no checkpoint-* dirs in {args.checkpoints_dir}")

    ema = None
    for d in dirs:
        path = os.path.join(args.checkpoints_dir, d, "unwrapped_model")
        if not os.path.isdir(path):
            continue
        model = model_cls.from_pretrained(path)
        if ema is None:
            ema = EMAModel(model.params, decay=args.decay, model_cls=model_cls,
                           model_config=model.config)
        else:
            ema.step(model.params)
        print(f"folded {d} (decay now {ema.get_decay(ema.optimization_step):.6f})")

    ema.save_pretrained(args.output)
    print(f"saved offline EMA to {args.output}")


if __name__ == "__main__":
    main()
