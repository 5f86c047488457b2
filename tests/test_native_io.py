"""Native C++ tar reader: parity with the Python reader + threading."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from open_muse_tpu.training import data as D
from open_muse_tpu.training.native_io import (NativeShardReader, build_native,
                                              native_available)


def _make_shard(path, n, start=0):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"{i:05d}"
            img = Image.fromarray(
                (np.random.RandomState(i).rand(32, 32, 3) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            for ext, data in [("jpg", buf.getvalue()),
                              ("txt", f"caption {i}".encode()),
                              ("json", json.dumps({"width": 32, "height": 32}).encode())]:
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


@pytest.fixture(scope="module")
def native_lib():
    if not build_native():
        pytest.skip("g++/make unavailable")
    assert native_available()


def test_native_matches_python_reader(native_lib, tmp_path):
    shard = str(tmp_path / "s.tar")
    _make_shard(shard, 10)
    py_samples = {s["__key__"]: s for s in D.tar_samples(shard)}
    reader = NativeShardReader([shard], num_threads=1)
    native_samples = {s["__key__"]: s for s in reader}
    reader.close()
    assert set(py_samples) == set(native_samples)
    for key in py_samples:
        py, nat = py_samples[key], native_samples[key]
        for ext in ("jpg", "txt", "json"):
            assert py[ext] == nat[ext], f"mismatch {key}.{ext}"


def test_native_multi_shard_threads(native_lib, tmp_path):
    shards = []
    for i in range(4):
        p = str(tmp_path / f"s{i}.tar")
        _make_shard(p, 5, start=i * 5)
        shards.append(p)
    reader = NativeShardReader(shards, num_threads=3)
    keys = sorted(s["__key__"] for s in reader)
    reader.close()
    assert keys == [f"{i:05d}" for i in range(20)]


def test_native_corrupt_shard_skipped(native_lib, tmp_path):
    good = str(tmp_path / "good.tar")
    _make_shard(good, 3)
    bad = str(tmp_path / "bad.tar")
    with open(good, "rb") as f, open(bad, "wb") as g:
        g.write(f.read()[:700])  # truncated mid-member
    reader = NativeShardReader([bad, good], num_threads=1)
    keys = sorted(s["__key__"] for s in reader)
    reader.close()
    # all samples from the good shard survive; corrupt shard contributes <= 1
    assert set(f"{i:05d}" for i in range(3)) <= set(keys)


def test_dataset_uses_native_reader(native_lib, tmp_path):
    shard = str(tmp_path / "d-000.tar")
    _make_shard(shard, 8)
    ds = D.Text2ImageDataset(shard, batch_size=4, resolution=32,
                             shuffle_buffer_size=4, num_batches_per_epoch=2,
                             seed=0, use_native=True, resample=False)
    batches = list(ds)
    assert len(batches) == 2
    assert batches[0]["pixel_values"].shape == (4, 32, 32, 3)
