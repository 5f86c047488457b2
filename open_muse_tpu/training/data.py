"""Webdataset-style input pipeline, built from scratch for TPU-VM hosts.

Reference parity: training/data.py (ClassificationDataset :148-271,
Text2ImageDataset :488-662, quality filter WebdatasetSelect :274-412,
non-throwing tar grouping :60-93, resampled shards :602, pre-encoded branch
:561-573, random-crop with recorded coords :136-145, <person>-token
replacement :42-50, epoch bookkeeping :611-617).

The `webdataset` package is not available here, so the tar-shard streaming
core is implemented natively: brace expansion, (optionally pipe:) tar
iteration, key grouping that skips corrupt members instead of raising,
shard resampling with replacement (non-deterministic by design,
reference README.md:302-304), per-host shard splitting for TPU pods
(jax.process_index replaces SLURM env math), a background prefetch thread,
and NHWC numpy batches ready for jax.device_put.
"""

from __future__ import annotations

import io
import itertools
import json
import os
import queue
import random
import re
import subprocess
import tarfile
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

__all__ = [
    "braceexpand",
    "expand_urls",
    "tar_samples",
    "ShardSource",
    "WebdatasetSelect",
    "person_token_replace",
    "image_transform",
    "sdxl_synthetic_dataset_map",
    "ds_clean_map",
    "ds_clean_upscaled_map",
    "DATASET_MAPS",
    "Text2ImageDataset",
    "ClassificationDataset",
]


# -- brace expansion (replaces the braceexpand package) ----------------------

_BRACE_RE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def braceexpand(pattern: str) -> List[str]:
    """'{00000..00004}.tar' -> 5 urls; supports multiple ranges and comma
    alternation '{a,b}', expanding left-to-right like bash."""
    m_range = _BRACE_RE.search(pattern)
    m_alt = re.search(r"\{([^{}]*,[^{}]*)\}", pattern)
    if m_range and (m_alt is None or m_range.start() < m_alt.start()):
        lo, hi = m_range.group(1), m_range.group(2)
        width = len(lo)
        out = []
        for i in range(int(lo), int(hi) + 1):
            out.extend(braceexpand(pattern[: m_range.start()] + str(i).zfill(width)
                                   + pattern[m_range.end():]))
        return out
    if m_alt:
        out = []
        for alt in m_alt.group(1).split(","):
            out.extend(braceexpand(pattern[: m_alt.start()] + alt
                                   + pattern[m_alt.end():]))
        return out
    return [pattern]


def expand_urls(urls) -> List[str]:
    """str | list[str] with brace patterns -> flat shard list
    (reference training/data.py:532-540)."""
    if isinstance(urls, str):
        urls = [urls]
    out = []
    for u in urls:
        out.extend(braceexpand(u))
    return out


# -- tar streaming core -------------------------------------------------------


def _open_shard(url: str):
    """Local path or 'pipe:cmd ...' (reference uses pipe:aws s3 cp,
    scripts/pre_encode.py:402-430)."""
    if url.startswith("pipe:"):
        proc = subprocess.Popen(url[5:], shell=True, stdout=subprocess.PIPE,
                                bufsize=1 << 20)
        return proc.stdout
    return open(url, "rb")


def tar_samples(url: str, handler: str = "warn") -> Iterator[Dict[str, bytes]]:
    """Stream key-grouped samples from one tar shard.

    Members 'key.ext' group into {'__key__': key, ext: bytes, ...}; corrupt
    members/truncated tars skip instead of raising (reference non-throwing
    grouper, training/data.py:60-93).
    """
    try:
        stream = _open_shard(url)
    except OSError:
        if handler == "raise":
            raise
        return
    current_key = None
    sample: Dict[str, Any] = {}
    try:
        with tarfile.open(fileobj=stream, mode="r|*") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                name = member.name
                if name.startswith("./"):
                    name = name[2:]
                if "." not in name:
                    continue
                key, ext = name.split(".", 1)
                try:
                    data = tf.extractfile(member).read()
                except Exception:
                    continue
                if key != current_key:
                    if current_key is not None and sample:
                        yield sample
                    current_key = key
                    sample = {"__key__": key, "__url__": url}
                sample[ext.lower()] = data
            if current_key is not None and sample:
                yield sample
    except (tarfile.TarError, EOFError, OSError) as e:
        if handler == "raise":
            raise
        # warn_and_continue semantics
        from ..utils.logging import get_logger

        get_logger(__name__).warning(f"skipping corrupt shard {url}: {e}")
    finally:
        try:
            stream.close()
        except Exception:
            pass


class ShardSource:
    """Shard iterator: per-host split + optional resample-with-replacement.

    deterministic=False reproduces webdataset.ResampledShards (sample with
    replacement forever, reference training/data.py:602); deterministic=True
    iterates the host's shards in order, once per epoch.
    """

    def __init__(self, urls, shuffle: bool = True, resample: bool = True,
                 seed: Optional[int] = None, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        # bare dataset names resolve to shard-list YAMLs in configs/
        # (reference training/data.py:519-521, e.g. 'm4_shards',
        # 'sdxl_synthetic_dataset_shards')
        if isinstance(urls, str) and "." not in os.path.basename(urls):
            repo_configs = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), "configs")
            for base in (os.path.join(os.getcwd(), "configs"), repo_configs):
                candidate = os.path.join(base, f"{urls}.yaml")
                if os.path.isfile(candidate):
                    import yaml

                    with open(candidate) as f:
                        urls = yaml.safe_load(f)
                    break
        self.urls = expand_urls(urls)
        if process_index is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        # per-host shard split (replaces SLURM distribute_shards,
        # scripts/pre_encode.py:245-271)
        self.urls = self.urls[process_index::max(1, process_count)]
        if not self.urls:
            raise ValueError("no shards assigned to this host")
        self.shuffle = shuffle
        self.resample = resample
        self.rng = random.Random(seed)

    def __iter__(self) -> Iterator[str]:
        if self.resample:
            while True:
                yield self.rng.choice(self.urls)
        else:
            urls = list(self.urls)
            if self.shuffle:
                self.rng.shuffle(urls)
            yield from urls


# -- decoding / mapping -------------------------------------------------------

_IMG_EXTS = ("jpg", "jpeg", "png", "webp")


def decode_sample(sample: Dict[str, bytes], pre_encoded: bool = False) -> Dict[str, Any]:
    out = {"__key__": sample.get("__key__")}
    for ext, data in sample.items():
        if ext.startswith("__"):
            continue
        if ext in _IMG_EXTS:
            from PIL import Image

            out["image"] = Image.open(io.BytesIO(data)).convert("RGB")
        elif ext in ("txt", "text", "caption"):
            out["text"] = data.decode("utf-8")
        elif ext == "json":
            out["metadata"] = json.loads(data)
        elif ext.endswith("pth") and pre_encoded:
            # pre-encoded tensors keyed by encoder checkpoint name
            # (reference training/data.py:561-573)
            import torch

            out[ext] = torch.load(io.BytesIO(data), map_location="cpu",
                                  weights_only=True)
        elif ext.endswith("npy") and pre_encoded:
            # native pre-encoded format written by scripts/pre_encode.py
            out[ext] = np.load(io.BytesIO(data))
        elif ext == "cls":
            out["class_id"] = int(data.decode("utf-8"))
    return out


def get_aesthetic_score(meta: Dict[str, Any]) -> float:
    """Aesthetic score across the LAION/COYO/stability metadata dialects
    (reference training/data.py:100-115; default 0.0)."""
    if "aesthetic" in meta:
        a = meta["aesthetic"]
    elif "AESTHETIC_SCORE" in meta:
        a = meta["AESTHETIC_SCORE"]
    elif "aesthetic_score_laion_v2" in meta:
        a = meta["aesthetic_score_laion_v2"]
    elif "stability_metadata" in meta and \
            "aes_scorelv2" in meta["stability_metadata"]:
        a = meta["stability_metadata"]["aes_scorelv2"]
    else:
        a = 0.0
    return float(a)


def person_token_replace(text: str, rng: random.Random) -> str:
    """Replace CC12M '<person>' tokens with sampled person words
    (reference training/data.py:42-50)."""
    person_words = ["a person", "someone", "somebody"]
    while "<person>" in text:
        text = text.replace("<person>", rng.choice(person_words), 1)
    return text


def image_transform(image, resolution: int = 256, rng: Optional[random.Random] = None,
                    center_crop: bool = False, normalize: bool = True):
    """Resize shorter side to `resolution`, (random|center) crop, return
    (NHWC float array in [0,1] — or uint8 when ``normalize=False``, for
    callers that divide on-device to cut host->device traffic 4x —
    orig_size (width, height), crop_coords (top, left)) — both feed the
    micro-conds (reference training/data.py:96-97,136-145)."""
    from PIL import Image

    rng = rng or random
    w, h = image.size
    # reference convention: orig size is (width, height) — get_orig_size
    # (training/data.py:96-97) feeds (original_width, original_height) into
    # micro_conds; crop coords are (top, left) (training/data.py:141-145)
    orig_size = (w, h)
    scale = resolution / min(w, h)
    image = image.resize((max(resolution, round(w * scale)),
                          max(resolution, round(h * scale))), Image.BILINEAR)
    w2, h2 = image.size
    if center_crop:
        left, top = (w2 - resolution) // 2, (h2 - resolution) // 2
    else:
        left = rng.randint(0, w2 - resolution) if w2 > resolution else 0
        top = rng.randint(0, h2 - resolution) if h2 > resolution else 0
    image = image.crop((left, top, left + resolution, top + resolution))
    if normalize:
        arr = np.asarray(image, dtype=np.float32) / 255.0
    else:
        arr = np.asarray(image, dtype=np.uint8)
    return arr, orig_size, (top, left)


# -- dataset-dialect raw-sample maps ------------------------------------------
# These operate on RAW samples (ext -> bytes), before decoding, exactly like
# the reference's wds.map stages.


def sdxl_synthetic_dataset_map(sample: Dict[str, bytes]) -> Dict[str, bytes]:
    """SDXL-synthetic shards carry N candidate images '<key>.<i>.png' plus
    'clip_scores.txt'; keep only the best-CLIP-score candidate (reference
    training/data.py:415-446)."""
    scores = [float(x) for x in
              sample["clip_scores.txt"].decode("utf-8").split(",")]
    best = max(range(len(scores)), key=scores.__getitem__)
    best_key = f"{best}.png"
    if best_key not in sample:
        raise ValueError(
            f"{best_key} not found in sample; expected files <key>.<i>.png "
            f"matching the clip_scores.txt indices")
    return {
        "__key__": sample.get("__key__"),
        "__url__": sample.get("__url__"),
        "txt": sample["txt"],
        "png": sample[best_key],
        # dataset was generated at 1024px by sdxl; aesthetic 5 approximation
        # (reference training/data.py:438-445)
        "json": json.dumps({"aesthetic": 5, "original_width": 1024,
                            "original_height": 1024}).encode(),
    }


def ds_clean_upscaled_map(sample: Dict[str, bytes]) -> Dict[str, bytes]:
    """ds_clean upscaled variant: real size read from the image, aesthetic 5
    (reference training/data.py:449-461)."""
    from PIL import Image

    with io.BytesIO(sample["png"]) as stream:
        image = Image.open(stream)
        image.load()
    return {
        "__key__": sample.get("__key__"),
        "__url__": sample.get("__url__"),
        "txt": sample["txt"],
        "png": sample["png"],
        "json": json.dumps({"aesthetic": 5, "original_width": image.width,
                            "original_height": image.height}).encode(),
    }


def ds_clean_map(sample: Dict[str, bytes]) -> Dict[str, bytes]:
    """ds_clean 2x2-grid variant: crop the top-left quadrant (reference
    training/data.py:464-485)."""
    from PIL import Image

    with io.BytesIO(sample["png"]) as stream:
        image = Image.open(stream)
        image.load()
    width, height = image.width // 2, image.height // 2
    image = image.crop((0, 0, width, height))
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    return {
        "__key__": sample.get("__key__"),
        "__url__": sample.get("__url__"),
        "txt": sample["txt"],
        "png": buf.getvalue(),
        "json": json.dumps({"aesthetic": 5, "original_width": width,
                            "original_height": height}).encode(),
    }


DATASET_MAPS = {
    "sdxl_synthetic": sdxl_synthetic_dataset_map,
    "ds_clean": ds_clean_map,
    "ds_clean_upscaled": ds_clean_upscaled_map,
}


# -- quality filter (reference WebdatasetSelect, training/data.py:274-412) ----


class WebdatasetSelect:
    """Metadata quality filter across the LAION/COYO metadata dialects:
    min size, pwatermark, aesthetic score, nsfw, spawning opt-out, getty."""

    def __init__(self, min_size: int = 256, max_pwatermark: float = 0.5,
                 min_aesthetic_score: float = 4.75, require_marked_as_ok_by_spawning: bool = False,
                 require_marked_as_not_getty: bool = False, max_pnsfw: Optional[float] = None):
        self.min_size = min_size
        self.max_pwatermark = max_pwatermark
        self.min_aesthetic_score = min_aesthetic_score
        self.require_marked_as_ok_by_spawning = require_marked_as_ok_by_spawning
        self.require_marked_as_not_getty = require_marked_as_not_getty
        self.max_pnsfw = max_pnsfw

    def __call__(self, sample: Dict[str, Any]) -> bool:
        meta = sample.get("metadata")
        if meta is None:
            return False
        # sizes across dialects
        w = meta.get("width", meta.get("WIDTH", meta.get("original_width")))
        h = meta.get("height", meta.get("HEIGHT", meta.get("original_height")))
        if w is None or h is None or w < self.min_size or h < self.min_size:
            return False
        pw = meta.get("pwatermark", meta.get("watermark_score"))
        if pw is not None and pw > self.max_pwatermark:
            return False
        aes = meta.get("aesthetic", meta.get("AESTHETIC_SCORE",
                                             meta.get("aesthetic_score")))
        if aes is not None and aes < self.min_aesthetic_score:
            return False
        nsfw = meta.get("pnsfw", meta.get("punsafe", meta.get("nsfw_score")))
        if self.max_pnsfw is not None and nsfw is not None and nsfw > self.max_pnsfw:
            return False
        if self.require_marked_as_ok_by_spawning and meta.get("optout", False):
            return False
        if self.require_marked_as_not_getty and "getty" in str(
                meta.get("url", "")).lower():
            return False
        return True


# -- datasets -----------------------------------------------------------------


def _prefetch(iterator: Iterable, depth: int = 4) -> Iterator:
    """Background-thread prefetch (replaces DataLoader workers on TPU VMs)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


class Text2ImageDataset:
    """Streaming text2image batches (reference training/data.py:488-662).

    Yields dicts of numpy arrays: pixel_values (B,H,W,3) [or pre-encoded
    token/embedding tensors], input_text list, orig_sizes, crop_coords.
    """

    def __init__(
        self,
        train_shards_path_or_url,
        batch_size: int,
        resolution: int = 256,
        shuffle_buffer_size: int = 1000,
        pre_encode: bool = False,
        select: Optional[Callable] = None,
        text_map: Optional[Callable] = None,
        num_batches_per_epoch: Optional[int] = None,
        resample: bool = True,
        seed: int = 0,
        center_crop: bool = False,
        require_text: bool = True,
        prefetch_depth: int = 4,
        use_native: bool = True,
        native_threads: int = 4,
        dataset_map=None,
        vae_checkpoint: Optional[str] = None,
        text_encoder_checkpoint: Optional[str] = None,
    ):
        self.shards = ShardSource(train_shards_path_or_url, resample=resample,
                                  seed=seed)
        # dialect map applied to raw samples (name from DATASET_MAPS or a
        # callable); sdxl_synthetic also implies the clip_scores.txt select
        # (reference training/data.py:575-577)
        if isinstance(dataset_map, str):
            dataset_map = DATASET_MAPS[dataset_map]
        self.dataset_map = dataset_map
        # pre-encoded members keyed by the encoder checkpoints that produced
        # them (reference training/data.py:561-573)
        def _norm(name):
            return name.lower().replace("/", ".") if name else None
        self.vae_checkpoint = _norm(vae_checkpoint)
        self.text_encoder_checkpoint = _norm(text_encoder_checkpoint)
        self.batch_size = batch_size
        self.resolution = resolution
        self.shuffle_buffer_size = shuffle_buffer_size
        self.pre_encode = pre_encode
        self.select = select
        self.text_map = text_map
        self.num_batches_per_epoch = num_batches_per_epoch
        self.center_crop = center_crop
        self.require_text = require_text
        self.prefetch_depth = prefetch_depth
        self.use_native = use_native
        self.native_threads = native_threads
        self.rng = random.Random(seed + 1)

    def _raw_samples(self) -> Iterator[Dict[str, bytes]]:
        if self.use_native:
            from .native_io import NativeShardReader, native_available

            if native_available():
                # feed sampled shard urls to the C++ pool in chunks so
                # resample-with-replacement semantics are preserved
                shard_iter = iter(self.shards)
                while True:
                    chunk = list(itertools.islice(shard_iter, 16))
                    if not chunk:
                        return
                    reader = NativeShardReader(chunk,
                                               num_threads=self.native_threads)
                    try:
                        yield from reader
                    finally:
                        reader.close()
        for url in self.shards:
            yield from tar_samples(url)

    def _samples(self) -> Iterator[Dict[str, Any]]:
        for raw in self._raw_samples():
            if self.dataset_map is not None:
                if self.dataset_map is sdxl_synthetic_dataset_map and \
                        "clip_scores.txt" not in raw:
                    continue  # reference wds.select gate (data.py:575-577)
                try:
                    raw = self.dataset_map(raw)
                except Exception as e:  # warn_and_continue semantics
                    from ..utils.logging import get_logger

                    get_logger(__name__).warning(
                        f"dataset_map failed on {raw.get('__key__')}: {e}")
                    continue
            sample = decode_sample(raw, pre_encoded=self.pre_encode)
            if self.require_text and not self.pre_encode and "text" not in sample:
                continue
            if not self.pre_encode and "image" not in sample:
                continue
            if self.select is not None and not self.select(sample):
                continue
            yield sample

    def _shuffled(self) -> Iterator[Dict[str, Any]]:
        buf: List[Dict[str, Any]] = []
        for sample in self._samples():
            if len(buf) < self.shuffle_buffer_size:
                buf.append(sample)
                continue
            idx = self.rng.randrange(len(buf))
            yield buf[idx]
            buf[idx] = sample
        self.rng.shuffle(buf)
        yield from buf

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        it = self._shuffled()
        if self.prefetch_depth:
            it = _prefetch(it, self.prefetch_depth)
        count = 0
        batch: List[Dict[str, Any]] = []
        for sample in it:
            batch.append(sample)
            if len(batch) == self.batch_size:
                yield self._collate(batch)
                batch = []
                count += 1
                if self.num_batches_per_epoch and count >= self.num_batches_per_epoch:
                    return

    def _collate(self, batch: List[Dict[str, Any]]) -> Dict[str, Any]:
        if self.pre_encode:
            out: Dict[str, Any] = {"__keys__": [s["__key__"] for s in batch]}
            tensor_keys = [k for k in batch[0]
                           if k.endswith("pth") or k.endswith("npy")]
            for k in tensor_keys:
                out[k] = np.stack([np.asarray(s[k]) for s in batch])
            # reference dialect: members named after the encoder checkpoint
            # that produced them -> canonical trainer keys
            # (training/data.py:561-573 wds.rename)
            renames = {f"{self.vae_checkpoint}.pth": "image_input_ids",
                       f"{self.text_encoder_checkpoint}.pth":
                           "encoder_hidden_states"}
            for src, dst in renames.items():
                if src in out:
                    out[dst] = out.pop(src)
            return out
        pixels, texts, orig_sizes, crops, aes = [], [], [], [], []
        for s in batch:
            arr, orig, crop = image_transform(s["image"], self.resolution, self.rng,
                                              self.center_crop)
            pixels.append(arr)
            text = s.get("text", "")
            if self.text_map is not None:
                text = self.text_map(text)
            texts.append(person_token_replace(text, self.rng))
            # micro-cond origin size prefers the metadata (reference
            # get_orig_size, training/data.py:96-97) over the decoded size;
            # (width, height) order matches the reference end-to-end
            meta = s.get("metadata") or {}
            if "original_width" in meta and "original_height" in meta:
                orig = (int(meta["original_width"]), int(meta["original_height"]))
            orig_sizes.append(orig)
            crops.append(crop)
            aes.append(get_aesthetic_score(meta))
        return {
            "pixel_values": np.stack(pixels),
            "input_text": texts,
            "orig_sizes": np.asarray(orig_sizes, dtype=np.float32),
            "crop_coords": np.asarray(crops, dtype=np.float32),
            "aesthetic_scores": np.asarray(aes, dtype=np.float32),
        }


class ClassificationDataset(Text2ImageDataset):
    """ImageNet-style class-conditional shards (reference
    training/data.py:148-271); optional class-id -> text mapping json for
    text-conditioned training on ImageNet."""

    def __init__(self, *args, imagenet_class_mapping_path: Optional[str] = None,
                 **kwargs):
        kwargs.setdefault("require_text", False)
        super().__init__(*args, **kwargs)
        self.class_mapping = None
        if imagenet_class_mapping_path:
            with open(imagenet_class_mapping_path) as f:
                self.class_mapping = json.load(f)

    def _collate(self, batch: List[Dict[str, Any]]) -> Dict[str, Any]:
        pixels, class_ids, texts = [], [], []
        for s in batch:
            arr, _, _ = image_transform(s["image"], self.resolution, self.rng,
                                        self.center_crop)
            pixels.append(arr)
            cid = int(s.get("class_id", 0))
            class_ids.append(cid)
            if self.class_mapping is not None:
                texts.append(self.class_mapping.get(str(cid), str(cid)))
        out = {"pixel_values": np.stack(pixels),
               "class_ids": np.asarray(class_ids, dtype=np.int32)}
        if texts:
            out["input_text"] = texts
        return out
