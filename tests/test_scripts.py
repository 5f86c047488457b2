"""Ops scripts: pre_encode, dataset conversion, checkpoint conversion,
offline EMA, benchmark table."""

import io
import json
import os
import tarfile

import numpy as np
import pytest


def _image_dir(tmp_path, n=6, with_captions=True):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(n):
        img = Image.fromarray(
            (np.random.RandomState(i).rand(40, 40, 3) * 255).astype(np.uint8))
        img.save(d / f"img{i:03d}.jpg")
        if with_captions:
            (d / f"img{i:03d}.txt").write_text(f"caption {i}")
    return str(d)


def test_convert_datasets_to_wds(tmp_path):
    from scripts.convert_datasets_to_wds import main

    src = _image_dir(tmp_path)
    out = str(tmp_path / "shards" / "data-%05d.tar")
    main(["--input", src, "--output", out, "--mode", "caption",
          "--samples-per-shard", "4"])
    assert os.path.isfile(out % 0) and os.path.isfile(out % 1)
    with tarfile.open(out % 0) as tf:
        names = tf.getnames()
    assert any(n.endswith(".jpg") for n in names)
    assert any(n.endswith(".txt") for n in names)


def test_pre_encode_roundtrip(tmp_path):
    """pre_encode writes shards the pre_encode data branch can read back."""
    from scripts.convert_datasets_to_wds import main as convert_main
    from scripts.pre_encode import main as pre_encode_main
    from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN
    from open_muse_tpu.training.data import Text2ImageDataset

    src = _image_dir(tmp_path)
    shards = str(tmp_path / "raw" / "d-%05d.tar")
    convert_main(["--input", src, "--output", shards, "--mode", "caption",
                  "--samples-per-shard", "6"])

    vq = MaskGitVQGAN(resolution=32, hidden_channels=32, channel_mult=(1, 2),
                      num_res_blocks=1, z_channels=16, num_embeddings=64,
                      quantized_embed_dim=16)
    vq_dir = str(tmp_path / "vq")
    vq.save_pretrained(vq_dir)

    out_dir = str(tmp_path / "encoded")
    pre_encode_main(["--shards", shards % 0, "--output-dir", out_dir,
                     "--vae-f16", vq_dir, "--batch-size", "3",
                     "--resolution", "32", "--task-id", "0", "--num-tasks", "1"])
    out_shard = os.path.join(out_dir, os.path.basename(shards % 0))
    assert os.path.isfile(out_shard)

    ds = Text2ImageDataset(out_shard, batch_size=2, pre_encode=True,
                           resample=False, num_batches_per_epoch=2,
                           shuffle_buffer_size=4)
    batches = list(ds)
    assert batches, "no pre-encoded batches read back"
    key = [k for k in batches[0] if k.endswith("npy")][0]
    assert batches[0][key].shape == (2, 256)  # 16x16 tokens


def test_shard_writer_pool_eviction(tmp_path):
    """Many shards with few open writers: eviction finalizes tars cleanly and
    reopening a finalized shard errors instead of truncating it."""
    import tarfile

    from scripts.pre_encode import ShardWriterPool

    pool = ShardWriterPool(str(tmp_path / "{shard}"), max_open=2)
    for s in range(6):
        for i in range(10):
            pool.submit(f"shard-{s:02d}.tar", {f"{i:05d}.txt": f"s{s}i{i}".encode()})
    with pytest.raises(RuntimeError):
        pool.submit("shard-00.tar", {"x.txt": b"late"})
    pool.close()
    for s in range(6):
        with tarfile.open(str(tmp_path / f"shard-{s:02d}.tar")) as tf:
            assert len(tf.getnames()) == 10


def test_convert_checkpoint_roundtrip(tmp_path):
    from scripts.convert_checkpoint import main, to_torch_state_dict
    from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN

    vq = MaskGitVQGAN(resolution=32, hidden_channels=32, channel_mult=(1, 2),
                      num_res_blocks=1, z_channels=16, num_embeddings=64,
                      quantized_embed_dim=16)
    src = str(tmp_path / "src")
    vq.save_pretrained(src)
    # flax -> torch layout -> load back through the torch-ingest path
    torch_dir = str(tmp_path / "as_torch")
    main(["--input", src, "--output", torch_dir, "--to-torch"])
    assert os.path.isfile(os.path.join(torch_dir, "model.safetensors"))
    reloaded = MaskGitVQGAN.from_pretrained(torch_dir)
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(vq.get_code(x)),
                                  np.asarray(reloaded.get_code(x)))


def test_compute_offline_ema(tmp_path):
    from scripts.compute_offline_ema import main
    from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN

    cfg = dict(resolution=32, hidden_channels=32, channel_mult=(1, 2),
               num_res_blocks=1, z_channels=16, num_embeddings=64,
               quantized_embed_dim=16)
    for step, seed in [(10, 0), (20, 1)]:
        m = MaskGitVQGAN(seed=seed, **cfg)
        m.save_pretrained(str(tmp_path / f"checkpoint-{step}" / "unwrapped_model"))
    out = str(tmp_path / "ema")
    main(["--checkpoints-dir", str(tmp_path), "--output", out,
          "--model-class", "MaskGitVQGAN"])
    assert os.path.isfile(os.path.join(out, "config.json"))
    ema = MaskGitVQGAN.from_pretrained(out)
    assert ema.config.num_embeddings == 64


def test_muse_table(tmp_path, capsys):
    import pandas as pd
    from benchmark.muse_table import main

    csv = tmp_path / "all.csv"
    pd.DataFrame([
        {"model": "muse_tpu", "resolution": 256, "batch_size": 1, "timesteps": 12,
         "use_xformers": "n/a", "use_fused_residual_norm": "xla-fused",
         "device": "tpu", "median_ms": 130.0, "imgs_per_sec": 7.7,
         "peak_mem_gb": ""},
    ]).to_csv(csv, index=False)
    main(["--csv", str(csv)])
    out = capsys.readouterr().out
    assert "speedup_vs_a100" in out and "3.65" in out


def test_model_quality_summary():
    from benchmark.model_quality import best

    cfg, fid = best("fid", "muse-256")
    assert fid == pytest.approx(39.30)
    assert cfg == 4
