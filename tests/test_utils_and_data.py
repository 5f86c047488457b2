"""Config system, logging, training diagnostics, data pipeline."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.utils.config import Config, load_config, parse_cli, flatten_config
from open_muse_tpu.utils import training_utils as TU
from open_muse_tpu.training import data as D


def test_config_yaml_cli_interpolation(tmp_path):
    yml = tmp_path / "c.yaml"
    yml.write_text(
        "model:\n  hidden: 64\n  name: uvit\n"
        "training:\n  batch_size: 8\n  out: out/${model.name}\n"
    )
    cfg = load_config([f"config={yml}", "training.batch_size=16", "model.extra=1.5"])
    assert cfg.model.hidden == 64
    assert cfg.training.batch_size == 16
    assert cfg.model.extra == 1.5
    assert cfg.training.out == "out/uvit"
    flat = flatten_config(cfg)
    assert flat["training.batch_size"] == 16
    assert cfg.training.get("missing", "d") == "d"


def test_parse_cli_types():
    cfg = parse_cli(["a.b=true", "a.c=null", "a.d=[1,2]", "e=text"])
    assert cfg.a.b is True and cfg.a.c is None and cfg.a.d == [1, 2] and cfg.e == "text"


def test_logger():
    from open_muse_tpu.utils import logging as L

    logger = L.get_logger("open_muse_tpu.test")
    L.set_verbosity_info()
    assert L.get_verbosity() == 20
    L.set_verbosity_warning()
    L.disable_progress_bar()
    assert not L.is_progress_bar_enabled()
    L.enable_progress_bar()


def test_bucketed_metrics_match_reference_semantics():
    rs = np.random.RandomState(0)
    logits = jnp.asarray(rs.randn(4, 16, 8).astype(np.float32))
    input_ids = jnp.asarray(rs.randint(0, 8, (4, 16)))
    # mask different fractions per image: 2, 6, 10, 14 of 16
    ids = np.asarray(input_ids).copy()
    for i, n in enumerate([2, 6, 10, 14]):
        ids[i, :n] = 99
    input_ids = jnp.asarray(ids)

    buckets = np.asarray(TU.input_ids_to_masked_buckets(input_ids, 99))
    np.testing.assert_array_equal(buckets, [1, 3, 6, 8])  # ceil(p*10)-1

    ent = np.asarray(TU.pixel_entropy_per_percent_masked_bucket(logits, input_ids, 99))
    assert ent.shape == (10,)
    assert (ent[[1, 3, 6, 8]] > 0).all()
    assert (ent[[0, 2, 4, 5, 7, 9]] == 0).all()

    img_ent = np.asarray(TU.image_entropy_per_percent_masked_bucket(logits, input_ids, 99))
    assert (img_ent[[1, 3, 6, 8]] > 0).all()

    labels = jnp.where(input_ids == 99, jnp.asarray(rs.randint(0, 8, (4, 16))), -100)
    ce = np.asarray(TU.cross_entropy_per_percent_masked_bucket(
        logits, labels, input_ids, 99, 8))
    assert (ce[[1, 3, 6, 8]] > 0).all()

    df = TU.token_probability_distributions_per_percent_masked_bucket(
        logits, input_ids, 99)
    assert set(df["bucket"].unique()) == {1, 3, 6, 8}


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
def test_buckets_match_torch_reference():
    torch = pytest.importorskip("torch")
    from tests.conftest import import_reference_muse

    import_reference_muse()
    from muse import training_utils as ref_tu

    rs = np.random.RandomState(1)
    ids = rs.randint(0, 8, (16, 32))
    for i in range(16):
        ids[i, : rs.randint(1, 32)] = 99
    ours = np.asarray(TU.input_ids_to_masked_buckets(jnp.asarray(ids), 99))
    ref = ref_tu.input_ids_to_masked_buckets(torch.from_numpy(ids), 99).numpy()
    np.testing.assert_array_equal(ours, ref)

    vals = rs.rand(16).astype(np.float32)
    ours_avg = np.asarray(TU.average_by_buckets(jnp.asarray(vals), jnp.asarray(ours)))
    ref_avg = ref_tu.average_by_buckets(torch.from_numpy(vals),
                                        torch.from_numpy(ref), 10).numpy()
    np.testing.assert_allclose(ours_avg, ref_avg, atol=1e-6)


# -- data pipeline -------------------------------------------------------------


def test_braceexpand():
    assert D.braceexpand("s-{000..002}.tar") == ["s-000.tar", "s-001.tar", "s-002.tar"]
    assert D.braceexpand("{a,b}/{0..1}.tar") == ["a/0.tar", "a/1.tar",
                                                 "b/0.tar", "b/1.tar"]
    assert D.expand_urls(["x.tar", "y-{1..2}.tar"]) == ["x.tar", "y-1.tar", "y-2.tar"]


def _make_shard(path, n, with_class=False, start=0):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"{i:05d}"
            img = Image.fromarray(
                (np.random.RandomState(i).rand(40, 48, 3) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            for ext, data in [
                ("jpg", buf.getvalue()),
                ("txt", f"caption <person> {i}".encode()),
                ("json", json.dumps({"width": 48, "height": 40, "aesthetic": 5.0,
                                     "pwatermark": 0.1}).encode()),
            ] + ([("cls", str(i % 3).encode())] if with_class else []):
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_tar_samples_and_corrupt_handling(tmp_path):
    shard = str(tmp_path / "s.tar")
    _make_shard(shard, 3)
    samples = list(D.tar_samples(shard))
    assert len(samples) == 3
    assert {"jpg", "txt", "json"} <= set(samples[0])
    # corrupt shard: truncated file — must not raise
    bad = str(tmp_path / "bad.tar")
    with open(shard, "rb") as f, open(bad, "wb") as g:
        g.write(f.read()[:100])
    assert list(D.tar_samples(bad)) == []


def test_text2image_dataset(tmp_path):
    for i in range(2):
        _make_shard(str(tmp_path / f"shard-{i:03d}.tar"), 6, start=i * 6)
    ds = D.Text2ImageDataset(
        str(tmp_path / "shard-{000..001}.tar"), batch_size=4, resolution=32,
        shuffle_buffer_size=8, select=D.WebdatasetSelect(min_size=32),
        num_batches_per_epoch=3, seed=0)
    batches = list(ds)
    assert len(batches) == 3
    b = batches[0]
    assert b["pixel_values"].shape == (4, 32, 32, 3)
    assert b["pixel_values"].dtype == np.float32
    assert len(b["input_text"]) == 4
    assert all("<person>" not in t for t in b["input_text"])
    assert b["orig_sizes"].shape == (4, 2) and b["crop_coords"].shape == (4, 2)


def test_webdataset_select_filters():
    sel = D.WebdatasetSelect(min_size=100, max_pwatermark=0.5, min_aesthetic_score=4.75)
    ok = {"metadata": {"width": 256, "height": 256, "aesthetic": 5.0, "pwatermark": 0.2}}
    small = {"metadata": {"width": 50, "height": 256}}
    marked = {"metadata": {"width": 256, "height": 256, "pwatermark": 0.9}}
    ugly = {"metadata": {"WIDTH": 256, "HEIGHT": 256, "AESTHETIC_SCORE": 2.0}}
    assert sel(ok) and not sel(small) and not sel(marked) and not sel(ugly)
    assert not sel({})


def test_shard_source_per_host_split(tmp_path):
    urls = [f"s{i}.tar" for i in range(8)]
    a = D.ShardSource(urls, resample=False, shuffle=False, process_index=0,
                      process_count=2)
    b = D.ShardSource(urls, resample=False, shuffle=False, process_index=1,
                      process_count=2)
    sa, sb = set(a.urls), set(b.urls)
    assert sa | sb == set(urls) and not (sa & sb)
    # resample-with-replacement never terminates by itself
    import itertools

    r = D.ShardSource(urls, resample=True, seed=0)
    assert len(list(itertools.islice(iter(r), 20))) == 20


def test_classification_dataset_class_to_text(tmp_path):
    _make_shard(str(tmp_path / "c.tar"), 6, with_class=True)
    mapping = tmp_path / "map.json"
    mapping.write_text(json.dumps({"0": "tench", "1": "goldfish", "2": "shark"}))
    ds = D.ClassificationDataset(str(tmp_path / "c.tar"), batch_size=3,
                                 resolution=32, shuffle_buffer_size=4,
                                 num_batches_per_epoch=1, seed=2,
                                 imagenet_class_mapping_path=str(mapping))
    batch = next(iter(ds))
    assert len(batch["input_text"]) == 3
    assert set(batch["input_text"]) <= {"tench", "goldfish", "shark"}


def test_classification_dataset(tmp_path):
    _make_shard(str(tmp_path / "cls-000.tar"), 8, with_class=True)
    ds = D.ClassificationDataset(str(tmp_path / "cls-000.tar"), batch_size=4,
                                 resolution=32, shuffle_buffer_size=4,
                                 num_batches_per_epoch=2, seed=1)
    batches = list(ds)
    assert len(batches) == 2
    assert batches[0]["class_ids"].shape == (4,)
    assert set(batches[0]["class_ids"]) <= {0, 1, 2}


# -- dataset-dialect maps (reference training/data.py:415-485, 561-573) ------


def _png_bytes(arr):
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


def test_sdxl_synthetic_dataset_map_picks_best_clip_image():
    from open_muse_tpu.training.data import sdxl_synthetic_dataset_map

    rs = np.random.RandomState(0)
    imgs = [_png_bytes(rs.rand(8, 8, 3) * 255) for _ in range(3)]
    raw = {"__key__": "k", "__url__": "u", "txt": b"a cat",
           "clip_scores.txt": b"0.21,0.35,0.19",
           "0.png": imgs[0], "1.png": imgs[1], "2.png": imgs[2]}
    out = sdxl_synthetic_dataset_map(raw)
    assert out["png"] == imgs[1]
    meta = json.loads(out["json"])
    assert meta == {"aesthetic": 5, "original_width": 1024,
                    "original_height": 1024}
    # missing candidate file -> ValueError (reference raises)
    bad = dict(raw)
    del bad["1.png"]
    with pytest.raises(ValueError):
        sdxl_synthetic_dataset_map(bad)


def test_ds_clean_map_crops_top_left_quadrant():
    from PIL import Image

    from open_muse_tpu.training.data import ds_clean_map, ds_clean_upscaled_map

    grid = np.zeros((16, 20, 3), dtype=np.uint8)
    grid[:8, :10] = 200  # top-left quadrant marker
    raw = {"__key__": "k", "__url__": "u", "txt": b"t", "png": _png_bytes(grid)}
    out = ds_clean_map(raw)
    img = Image.open(io.BytesIO(out["png"]))
    assert img.size == (10, 8)
    assert np.asarray(img).min() == 200  # only the marked quadrant survives
    meta = json.loads(out["json"])
    assert (meta["original_width"], meta["original_height"]) == (10, 8)

    out_up = ds_clean_upscaled_map(raw)
    meta_up = json.loads(out_up["json"])
    assert (meta_up["original_width"], meta_up["original_height"]) == (20, 16)
    assert out_up["png"] == raw["png"]


def test_dataset_map_in_pipeline_and_select_gate(tmp_path):
    """sdxl-synthetic shards stream through Text2ImageDataset: best-CLIP
    candidate selected, samples without clip_scores.txt skipped."""
    import tarfile

    from open_muse_tpu.training.data import Text2ImageDataset

    rs = np.random.RandomState(1)
    shard = tmp_path / "sdxl-000.tar"
    with tarfile.open(shard, "w") as tf:
        def add(name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        for i in range(4):
            key = f"{i:04d}"
            add(f"{key}.txt", f"prompt {i}".encode())
            if i != 2:  # sample 2 lacks clip scores -> must be skipped
                add(f"{key}.clip_scores.txt", b"0.1,0.9")
            for j in range(2):
                add(f"{key}.{j}.png", _png_bytes(rs.rand(40, 40, 3) * 255))

    ds = Text2ImageDataset(str(shard), batch_size=3, resolution=32,
                           shuffle_buffer_size=4, resample=False,
                           dataset_map="sdxl_synthetic", use_native=False)
    batch = next(iter(ds))
    assert batch["pixel_values"].shape == (3, 32, 32, 3)
    # micro-cond origin sizes come from the synthetic json (1024x1024)
    np.testing.assert_array_equal(batch["orig_sizes"],
                                  np.full((3, 2), 1024.0, np.float32))


def test_preencoded_checkpoint_named_pth_members(tmp_path):
    """Reference dialect: .pth members named after the encoder checkpoints
    rename to image_input_ids / encoder_hidden_states
    (reference training/data.py:561-573)."""
    import tarfile

    torch = pytest.importorskip("torch")

    from open_muse_tpu.training.data import Text2ImageDataset

    vae_name = "openMUSE/vqgan-f16-8192-laion"
    te_name = "openMUSE/clip-vit-large-patch14-text-enc"
    shard = tmp_path / "enc-000.tar"
    rs = np.random.RandomState(2)
    with tarfile.open(shard, "w") as tf:
        for i in range(4):
            key = f"{i:04d}"
            for name, tensor in (
                    (vae_name.lower().replace("/", "."),
                     torch.from_numpy(rs.randint(0, 64, (16,)).astype(np.int64))),
                    (te_name.lower().replace("/", "."),
                     torch.from_numpy(rs.randn(7, 24).astype(np.float16)))):
                buf = io.BytesIO()
                torch.save(tensor, buf)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.{name}.pth")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

    ds = Text2ImageDataset(str(shard), batch_size=4, resolution=32,
                           shuffle_buffer_size=4, resample=False,
                           pre_encode=True, use_native=False,
                           vae_checkpoint=vae_name,
                           text_encoder_checkpoint=te_name)
    batch = next(iter(ds))
    assert batch["image_input_ids"].shape == (4, 16)
    assert batch["encoder_hidden_states"].shape == (4, 7, 24)
