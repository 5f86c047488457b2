"""Convert image datasets (folders, HF datasets) to webdataset tar shards.

Reference parity: scripts/convert_imagenet_to_wds.py and
convert_coco_to_wds.py (HF datasets -> tar shards with jpg/cls or jpg/txt
members).  This version also supports plain directory trees (class-per-folder
for ImageNet-style, or images+caption txt files), so it works offline.

Usage:
  python scripts/convert_datasets_to_wds.py --input /path/imagenet_train \
      --output shards/imagenet-%05d.tar --samples-per-shard 5000 --mode class
  python scripts/convert_datasets_to_wds.py --input /path/coco \
      --output shards/coco-%05d.tar --mode caption
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = (".jpg", ".jpeg", ".png", ".webp")


def iter_class_tree(root):
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    class_to_id = {c: i for i, c in enumerate(classes)}
    for cls in classes:
        for fname in sorted(os.listdir(os.path.join(root, cls))):
            if fname.lower().endswith(IMG_EXTS):
                yield os.path.join(root, cls, fname), {"cls": str(class_to_id[cls])}


def iter_caption_tree(root):
    for fname in sorted(os.listdir(root)):
        if fname.lower().endswith(IMG_EXTS):
            stem = os.path.splitext(fname)[0]
            cap_path = os.path.join(root, stem + ".txt")
            caption = open(cap_path).read().strip() if os.path.isfile(cap_path) else ""
            yield os.path.join(root, fname), {"txt": caption}


def iter_hf_dataset(name, split, image_key="image", label_key=None, text_key=None):
    from datasets import load_dataset

    ds = load_dataset(name, split=split, streaming=True)
    for i, row in enumerate(ds):
        extras = {}
        if label_key:
            extras["cls"] = str(row[label_key])
        if text_key:
            extras["txt"] = str(row[text_key])
        yield (f"hf-{i:08d}", row[image_key]), extras


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True,
                        help="directory tree or hf:dataset_name:split")
    parser.add_argument("--output", required=True, help="pattern with %%05d")
    parser.add_argument("--mode", choices=["class", "caption"], default="caption")
    parser.add_argument("--samples-per-shard", type=int, default=5000)
    parser.add_argument("--resize", type=int, default=None)
    args = parser.parse_args(argv)

    from PIL import Image

    if args.input.startswith("hf:"):
        _, name, split = args.input.split(":", 2)
        items = iter_hf_dataset(name, split,
                                label_key="label" if args.mode == "class" else None,
                                text_key="caption" if args.mode == "caption" else None)
    elif args.mode == "class":
        items = iter_class_tree(args.input)
    else:
        items = iter_caption_tree(args.input)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    shard_idx, in_shard, tf = 0, 0, None
    count = 0
    for src, extras in items:
        if tf is None:
            tf = tarfile.open(args.output % shard_idx, "w")
        if isinstance(src, tuple):  # hf path: (key, PIL image)
            key, img = src
        else:
            key = f"{count:08d}"
            img = Image.open(src).convert("RGB")
        if args.resize:
            img = img.resize((args.resize, args.resize), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=95)
        members = {"jpg": buf.getvalue()}
        for ext, val in extras.items():
            members[ext] = val.encode()
        members["json"] = json.dumps({"width": img.size[0],
                                      "height": img.size[1]}).encode()
        for ext, data in members.items():
            info = tarfile.TarInfo(f"{key}.{ext}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        in_shard += 1
        count += 1
        if in_shard >= args.samples_per_shard:
            tf.close()
            tf, in_shard = None, 0
            shard_idx += 1
    if tf is not None:
        tf.close()
    print(f"wrote {count} samples into {shard_idx + 1} shards")


if __name__ == "__main__":
    main()
