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
