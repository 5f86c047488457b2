"""Quickstart: train a tiny text2image model on synthetic data, then sample.

Runs entirely offline on CPU or one TPU chip in a couple of minutes:

    python examples/quickstart.py

It (1) writes a synthetic webdataset shard, (2) trains a tiny
MaskGiTUViT_v2 + MaskGitVQGAN + CLIP stack for a few steps via the real
trainer CLI, (3) reloads the checkpoint through PipelineMuse and samples.
"""

import io
import json
import os
import sys
import tarfile
import tempfile

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_shard(path: str, n: int = 24):
    from PIL import Image

    colors = ["red", "green", "blue", "yellow"]
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            color = colors[i % len(colors)]
            rgb = {"red": (200, 40, 40), "green": (40, 200, 40),
                   "blue": (40, 40, 200), "yellow": (220, 220, 40)}[color]
            arr = np.zeros((32, 32, 3), np.uint8)
            arr[:] = rgb
            arr += np.random.RandomState(i).randint(0, 30, arr.shape).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            for ext, data in [("jpg", buf.getvalue()),
                              (("txt"), f"a {color} square".encode()),
                              ("json", json.dumps({"width": 32, "height": 32}).encode())]:
                info = tarfile.TarInfo(f"{i:05d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def main():
    from open_muse_tpu.training.train_muse import main as train_main
    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse
    from open_muse_tpu.models.clip_text import SimpleTokenizer
    from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2
    from open_muse_tpu.models.clip_text import CLIPTextEncoder

    workdir = tempfile.mkdtemp(prefix="muse_quickstart_")
    shard = os.path.join(workdir, "data-000.tar")
    make_synthetic_shard(shard)
    out_dir = os.path.join(workdir, "run")

    config = {
        "experiment": {"name": "quickstart", "output_dir": out_dir,
                       "save_every": 20, "generate_every": 20, "log_every": 5,
                       "resume_from_checkpoint": None},
        "model": {
            "vq_model_type": "maskgit_vqgan",
            "vq_model": {"pretrained": None,
                         "params": {"resolution": 32, "hidden_channels": 32,
                                    "channel_mult": [1, 2], "num_res_blocks": 1,
                                    "z_channels": 16, "num_embeddings": 64,
                                    "quantized_embed_dim": 16}},
            "text_encoder": {"pretrained": None,
                             "params": {"vocab_size": 256, "hidden_size": 32,
                                        "intermediate_size": 64,
                                        "num_hidden_layers": 2,
                                        "num_attention_heads": 4,
                                        "max_position_embeddings": 16,
                                        "projection_dim": 24}},
            "transformer": {"hidden_size": 64, "cond_embed_dim": 24,
                            "micro_cond_encode_dim": 8, "micro_cond_embed_dim": 40,
                            "encoder_hidden_size": 32, "vocab_size": 68,
                            "codebook_size": 64, "in_channels": 32,
                            "block_out_channels": [32], "num_res_blocks": 1,
                            "block_num_heads": 2, "num_hidden_layers": 2,
                            "num_attention_heads": 4, "intermediate_size": 96},
        },
        "dataset": {"params": {"train_shards_path_or_url": shard,
                               "batch_size": 4, "shuffle_buffer_size": 16,
                               "resolution": 32}},
        "optimizer": {"name": "adamw", "params": {"learning_rate": 3e-4}},
        "lr_scheduler": {"scheduler": "constant_with_warmup",
                         "params": {"warmup_steps": 5}},
        "training": {"batch_size": 4, "max_train_steps": 20, "seed": 0,
                     "use_ema": False, "cond_dropout_prob": 0.1},
    }
    cfg_path = os.path.join(workdir, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    print(f">> training 20 steps in {out_dir}")
    train_main([f"config={cfg_path}"])

    print(">> sampling from the checkpoint")
    import jax

    ckpt = os.path.join(out_dir, "checkpoint-20")
    pipe = PipelineMuse(
        # the VQ is frozen during training; rebuilding with the same seed
        # reproduces the exact tokenizer the trainer used
        vae=MaskGitVQGAN(**config["model"]["vq_model"]["params"]),
        transformer=MaskGiTUViT_v2.from_pretrained(
            os.path.join(ckpt, "unwrapped_model")),
        text_encoder=CLIPTextEncoder(**config["model"]["text_encoder"]["params"]),
        tokenizer=SimpleTokenizer(256, 16),
    )
    images = pipe("a red square", timesteps=4, guidance_scale=2.0,
                  key=jax.random.PRNGKey(0))
    out_png = os.path.join(workdir, "sample.png")
    images[0].save(out_png)
    print(f">> wrote {out_png}")


if __name__ == "__main__":
    main()
