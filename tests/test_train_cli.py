"""End-to-end smoke tests for the three trainer CLIs on generated shards."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
import yaml

# full trainer-CLI runs: minutes each -> nightly tier
pytestmark = pytest.mark.slow


def _make_shard(path, n, with_class=False):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:05d}"
            img = Image.fromarray(
                (np.random.RandomState(i).rand(36, 36, 3) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            items = [("jpg", buf.getvalue()), ("txt", f"sample {i}".encode()),
                     ("json", json.dumps({"width": 36, "height": 36}).encode())]
            if with_class:
                items.append(("cls", str(i % 3).encode()))
            for ext, data in items:
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


VQ_TINY = dict(resolution=32, hidden_channels=32, channel_mult=[1, 2],
               num_res_blocks=1, z_channels=16, num_embeddings=64,
               quantized_embed_dim=16)

BASE = {
    "experiment": {"name": "smoke", "output_dir": None, "save_every": 4,
                   "generate_every": 4, "log_every": 2,
                   "resume_from_checkpoint": None, "checkpoints_total_limit": 2},
    "dataset": {"params": {"train_shards_path_or_url": None, "batch_size": 2,
                           "shuffle_buffer_size": 8, "resolution": 32}},
    "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-4}},
    "lr_scheduler": {"scheduler": "constant_with_warmup",
                     "params": {"warmup_steps": 2}},
    "training": {"batch_size": 2, "max_train_steps": 4, "seed": 0,
                 "use_ema": False},
}


def _write_cfg(tmp_path, cfg):
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_train_muse_cli(tmp_path):
    from open_muse_tpu.training.train_muse import main

    shard = str(tmp_path / "data-000.tar")
    _make_shard(shard, 8)
    cfg = json.loads(json.dumps(BASE))
    cfg["experiment"]["output_dir"] = str(tmp_path / "out")
    cfg["dataset"]["params"]["train_shards_path_or_url"] = shard
    cfg["model"] = {
        "vq_model_type": "maskgit_vqgan",
        "vq_model": {"pretrained": None, "params": VQ_TINY},
        "text_encoder": {"pretrained": None,
                         "params": {"vocab_size": 100, "hidden_size": 32,
                                    "intermediate_size": 64, "num_hidden_layers": 2,
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
    }
    # global batch sharded over the 8-device ('dp','fsdp') mesh axes
    cfg["training"]["batch_size"] = 8
    cfg["training"]["cond_dropout_prob"] = 0.1
    cfg["dataset"]["params"]["eval_shards_path_or_url"] = shard
    cfg["experiment"]["eval_every"] = 4
    cfg["experiment"]["max_eval_batches"] = 1
    cfg["experiment"]["log_entropy_buckets"] = True
    cfg["experiment"]["log_grad_norm_every"] = 2
    # inpainting validation: one prompt dir with image + mask
    from PIL import Image

    ipd = tmp_path / "inpaint" / "a_red_square"
    ipd.mkdir(parents=True)
    Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255)
                    .astype(np.uint8)).save(ipd / "image.png")
    Image.fromarray((np.ones((16, 16)) * 255).astype(np.uint8)).save(
        ipd / "mask.png")
    cfg["experiment"]["inpainting_validation_dir"] = str(tmp_path / "inpaint")
    state = main([f"config={_write_cfg(tmp_path, cfg)}"])
    out = cfg["experiment"]["output_dir"]
    assert os.path.isfile(os.path.join(out, "metrics.jsonl"))
    logged = [json.loads(line) for line in open(os.path.join(out, "metrics.jsonl"))]
    assert any("eval_loss" in m for m in logged)
    assert any("pixel_entropy_by_bucket" in m for m in logged)
    assert any("token_prob_deciles_by_bucket" in m for m in logged)
    # per-parameter grad norms on the log_grad_norm_every cadence
    # (reference train_muse.py:1309-1314)
    assert any(any(k.startswith("grad_norm/") for k in m) for m in logged)
    assert all(np.isfinite(m["loss"]) for m in logged if "loss" in m)
    assert os.path.isfile(os.path.join(out, "inpainting-4.png"))
    assert os.path.isdir(os.path.join(out, "checkpoint-4", "unwrapped_model"))
    assert os.path.isfile(os.path.join(out, "samples-4.png"))
    # resume from the checkpoint and run 2 more steps
    cfg["experiment"]["resume_from_checkpoint"] = "latest"
    cfg["training"]["max_train_steps"] = 6
    state = main([f"config={_write_cfg(tmp_path, cfg)}"])
    import jax

    assert int(jax.device_get(state.step)) == 6


def test_train_maskgit_imagenet_cli(tmp_path):
    from open_muse_tpu.training.train_maskgit_imagenet import main

    shard = str(tmp_path / "cls-000.tar")
    _make_shard(shard, 8, with_class=True)
    cfg = json.loads(json.dumps(BASE))
    cfg["experiment"]["output_dir"] = str(tmp_path / "out")
    cfg["dataset"]["params"]["train_shards_path_or_url"] = shard
    cfg["model"] = {
        "vq_model_type": "maskgit_vqgan",
        "vq_model": {"pretrained": None, "params": VQ_TINY},
        "transformer": {"vocab_size": 70, "hidden_size": 32,
                        "num_hidden_layers": 2, "num_attention_heads": 4,
                        "intermediate_size": 64, "codebook_size": 64,
                        "num_vq_tokens": 256, "max_position_embeddings": 257,
                        "num_classes": 3, "hidden_dropout": 0.0,
                        "attention_dropout": 0.0},
    }
    main([f"config={_write_cfg(tmp_path, cfg)}"])
    out = cfg["experiment"]["output_dir"]
    assert os.path.isfile(os.path.join(out, "samples-4.png"))
    assert os.path.isdir(os.path.join(out, "checkpoint-4"))


def test_train_vqgan_cli(tmp_path):
    from open_muse_tpu.training.train_vqgan import main

    shard = str(tmp_path / "img-000.tar")
    _make_shard(shard, 8)
    cfg = json.loads(json.dumps(BASE))
    cfg["experiment"]["output_dir"] = str(tmp_path / "out")
    cfg["dataset"]["params"]["train_shards_path_or_url"] = shard
    cfg["model"] = {"vq_model_type": "maskgit_vqgan",
                    "vq_model": {"params": VQ_TINY}}
    main([f"config={_write_cfg(tmp_path, cfg)}"])
    out = cfg["experiment"]["output_dir"]
    assert os.path.isfile(os.path.join(out, "recon-4.png"))
    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    assert len(lines) >= 2
    assert "l2" in json.loads(lines[0])


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _make_preencoded_shard(path, n, seq=16, text_dim=32, text_len=7):
    """Shard in the native pre-encoded dialect written by scripts/pre_encode.py
    (vq_f16.npy tokens + clip_penultimate/clip_pooled.npy embeds)."""
    with tarfile.open(path, "w") as tf:
        rs = np.random.RandomState(0)
        for i in range(n):
            key = f"{i:05d}"
            items = [
                ("vq_f16.npy", _npy_bytes(rs.randint(0, 64, (seq,)).astype(np.int32))),
                ("clip_penultimate.npy",
                 _npy_bytes(rs.randn(text_len, text_dim).astype(np.float16))),
                ("clip_pooled.npy", _npy_bytes(rs.randn(24).astype(np.float16))),
            ]
            for ext, data in items:
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_train_muse_cli_pre_encode(tmp_path):
    """pre_encode: true end-to-end (ADVICE round 1: this branch raised
    KeyError on the first batch because collated member names were never
    remapped to the trainer's expected keys)."""
    from open_muse_tpu.training.train_muse import main

    shard = str(tmp_path / "enc-000.tar")
    _make_preencoded_shard(shard, 8)
    cfg = json.loads(json.dumps(BASE))
    cfg["experiment"]["output_dir"] = str(tmp_path / "out")
    cfg["dataset"]["params"]["train_shards_path_or_url"] = shard
    cfg["training"]["batch_size"] = 8
    cfg["training"]["pre_encode"] = True
    cfg["model"] = {
        "transformer": {"hidden_size": 64, "cond_embed_dim": 24,
                        "micro_cond_encode_dim": 8, "micro_cond_embed_dim": 40,
                        "encoder_hidden_size": 32, "vocab_size": 68,
                        "codebook_size": 64, "in_channels": 32,
                        "block_out_channels": [32], "num_res_blocks": 1,
                        "block_num_heads": 2, "num_hidden_layers": 2,
                        "num_attention_heads": 4, "intermediate_size": 96},
    }
    state = main([f"config={_write_cfg(tmp_path, cfg)}"])
    import jax

    assert int(jax.device_get(state.step)) == 4
    out = cfg["experiment"]["output_dir"]
    logged = [json.loads(line) for line in open(os.path.join(out, "metrics.jsonl"))]
    assert all(np.isfinite(m["loss"]) for m in logged if "loss" in m)


def test_train_muse_cli_v1_architecture(tmp_path):
    """model.architecture: transformer -> v1 MaskGitTransformer text2image
    (reference train_muse.py:358 dispatch; cross-attention conditioning,
    no pooled/micro-cond embeds)."""
    from open_muse_tpu.training.train_muse import main

    shard = str(tmp_path / "data-000.tar")
    _make_shard(shard, 8)
    cfg = json.loads(json.dumps(BASE))
    cfg["experiment"]["output_dir"] = str(tmp_path / "out")
    cfg["dataset"]["params"]["train_shards_path_or_url"] = shard
    cfg["training"]["batch_size"] = 8
    cfg["training"]["cond_dropout_prob"] = 0.1
    cfg["model"] = {
        "architecture": "transformer",
        "vq_model_type": "maskgit_vqgan",
        "vq_model": {"pretrained": None, "params": VQ_TINY},
        "text_encoder": {"pretrained": None,
                         "params": {"vocab_size": 100, "hidden_size": 32,
                                    "intermediate_size": 64, "num_hidden_layers": 2,
                                    "num_attention_heads": 4,
                                    "max_position_embeddings": 16,
                                    "projection_dim": 24}},
        "transformer": {"vocab_size": 70, "hidden_size": 32,
                        "num_hidden_layers": 2, "num_attention_heads": 4,
                        "intermediate_size": 64, "codebook_size": 64,
                        "num_vq_tokens": 256, "max_position_embeddings": 256,
                        "add_cross_attention": True, "encoder_hidden_size": 32,
                        "project_encoder_hidden_states": True,
                        "hidden_dropout": 0.0, "attention_dropout": 0.0},
    }
    state = main([f"config={_write_cfg(tmp_path, cfg)}"])
    import jax

    assert int(jax.device_get(state.step)) == 4
    out = cfg["experiment"]["output_dir"]
    logged = [json.loads(line) for line in open(os.path.join(out, "metrics.jsonl"))]
    assert all(np.isfinite(m["loss"]) for m in logged if "loss" in m)
    assert os.path.isfile(os.path.join(out, "samples-4.png"))


def test_distill_cli(tmp_path):
    """Distillation CLI: stage a tiny pretrained transformer, distill from a
    prompt file, checkpoint lands with finite logged loss."""
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2
    from open_muse_tpu.training.distill import main

    teacher_dir = str(tmp_path / "teacher")
    MaskGiTUViT_v2(
        hidden_size=64, cond_embed_dim=24, micro_cond_encode_dim=8,
        micro_cond_embed_dim=40, encoder_hidden_size=32, vocab_size=68,
        codebook_size=64, in_channels=32, block_out_channels=[32],
        num_res_blocks=1, block_num_heads=2, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        seed=0).save_pretrained(teacher_dir)
    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red square\na green square\na blue square\n")

    cfg = {
        "experiment": {"name": "distill-smoke",
                       "output_dir": str(tmp_path / "out"),
                       "save_every": 4, "log_every": 2},
        "model": {"text_encoder": {"pretrained": None,
                                   "params": {"vocab_size": 64,
                                              "hidden_size": 32,
                                              "intermediate_size": 64,
                                              "num_hidden_layers": 2,
                                              "num_attention_heads": 4,
                                              "max_position_embeddings": 8,
                                              "projection_dim": 24}}},
        "distill": {"teacher_checkpoint": teacher_dir,
                    "prompts_file": str(prompts),
                    "teacher_timesteps": 4, "step_ratio": 2,
                    "guidance_scale": 2.0, "resolution": 16,
                    "seq_len": 16, "use_ema": True},
        "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-4}},
        "lr_scheduler": {"scheduler": "constant_with_warmup",
                         "params": {"warmup_steps": 2}},
        "training": {"batch_size": 4, "max_train_steps": 4, "seed": 0,
                     "max_grad_norm": 1.0},
    }
    state = main([f"config={_write_cfg(tmp_path, cfg)}"])
    import jax

    assert int(jax.device_get(state.step)) == 4
    out = cfg["experiment"]["output_dir"]
    logged = [json.loads(line) for line in open(os.path.join(out, "metrics.jsonl"))]
    assert any(np.isfinite(m["loss"]) for m in logged if "loss" in m)
    assert os.path.isdir(os.path.join(out, "checkpoint-4"))
