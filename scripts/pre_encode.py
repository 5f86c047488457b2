"""Offline dataset tokenization at scale (TPU-host version).

Reference parity: scripts/pre_encode.py — dual-VAE (Paella f8 + taming f16)
``get_code`` + CLIP penultimate hidden states per sample (:491-497), streamed
from tar shards, written back to tar shards via a threaded ``Uploads`` manager
with bounded open writers and per-writer locks (:82-242), and SLURM shard
splitting (:245-271).

TPU-native changes: encode runs as ONE jitted program per batch (both VQ
encoders + the text tower fused); shard splitting uses --task-id/--num-tasks
or jax.process_index (no SLURM env math); output entries are .npy members
keyed by encoder name (readable by training/data.py pre_encode mode).

Usage:
  python scripts/pre_encode.py \
      --shards 'data/{00000..00099}.tar' --output-dir encoded/ \
      --vae-f16 path/to/vqgan --text-encoder path/to/clip \
      [--vae-f8 path/to/paella] [--batch-size 64] \
      [--task-id 0 --num-tasks 8] [--resolution 256]
"""

from __future__ import annotations

import argparse
import io
import os
import queue
import sys
import tarfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def distribute_shards(shards, task_id: int, num_tasks: int):
    """Contiguous per-task split (reference scripts/pre_encode.py:245-271)."""
    per = (len(shards) + num_tasks - 1) // num_tasks
    return shards[task_id * per:(task_id + 1) * per]


class ShardWriterPool:
    """Threaded tar-shard writer: bounded number of open writers, per-writer
    locks, background flush threads (reference Uploads manager,
    scripts/pre_encode.py:82-242).  Writes locally or to a 'pipe:cmd' sink."""

    def __init__(self, output_pattern: str, max_open: int = 4, queue_depth: int = 64):
        self.output_pattern = output_pattern
        self.max_open = max_open
        self.queues = {}
        self.threads = {}
        self.closed = set()
        self.errors = []
        self.lock = threading.Lock()

    def _writer_loop(self, shard_name: str, q: "queue.Queue"):
        path = self.output_pattern.format(shard=shard_name)
        try:
            if path.startswith("pipe:"):
                import subprocess

                proc = subprocess.Popen(path[5:], shell=True, stdin=subprocess.PIPE)
                stream = proc.stdin
            else:
                os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                stream = open(path, "wb")
            with tarfile.open(fileobj=stream, mode="w|") as tf:
                while True:
                    item = q.get()
                    if item is None:
                        break
                    name, data = item
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    info.mtime = int(time.time())
                    tf.addfile(info, io.BytesIO(data))
            stream.close()
        except Exception as e:  # pragma: no cover
            self.errors.append((shard_name, e))

    def submit(self, shard_name: str, members: dict):
        with self.lock:
            if shard_name not in self.queues:
                if shard_name in self.closed:
                    # reopening would truncate the tar: shards must be
                    # written contiguously (the encode loop guarantees this)
                    raise RuntimeError(
                        f"shard {shard_name} was already finalized; raise "
                        f"max_open or write shards contiguously")
                if len(self.queues) >= self.max_open:
                    # close the oldest writer
                    oldest = next(iter(self.queues))
                    self._close(oldest)
                q = queue.Queue(maxsize=256)
                t = threading.Thread(target=self._writer_loop, args=(shard_name, q),
                                     daemon=True)
                t.start()
                self.queues[shard_name] = q
                self.threads[shard_name] = t
        for name, data in members.items():
            self.queues[shard_name].put((name, data))

    def _close(self, shard_name: str):
        q = self.queues.pop(shard_name)
        t = self.threads.pop(shard_name)
        self.closed.add(shard_name)
        q.put(None)
        t.join()

    def close(self):
        for shard_name in list(self.queues):
            self._close(shard_name)
        if self.errors:
            raise RuntimeError(f"writer errors: {self.errors}")


def _npy_bytes(arr) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr))
    return buf.getvalue()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--shards", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--vae-f16", help="dir of a VQ model checkpoint")
    parser.add_argument("--vae-f8", help="dir of a Paella f8 checkpoint")
    parser.add_argument("--text-encoder", help="dir of a CLIP text encoder")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--task-id", type=int, default=None)
    parser.add_argument("--num-tasks", type=int, default=None)
    parser.add_argument("--max-batches", type=int, default=None)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from open_muse_tpu.models.clip_text import CLIPTextEncoder, SimpleTokenizer
    from open_muse_tpu.pipelines.pipeline_muse import _VAE_CLASSES
    from open_muse_tpu.core.configuration import load_config_dict
    from open_muse_tpu.training.data import ShardSource, tar_samples, decode_sample, \
        image_transform

    def load_vae(path):
        cfg = load_config_dict(path)
        return _VAE_CLASSES[cfg["_class_name"]].from_pretrained(path)

    vae_f16 = load_vae(args.vae_f16) if args.vae_f16 else None
    vae_f8 = load_vae(args.vae_f8) if args.vae_f8 else None
    text_encoder = tokenizer = None
    if args.text_encoder:
        text_encoder = CLIPTextEncoder.from_pretrained(args.text_encoder)
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.text_encoder)
        except Exception:
            tokenizer = SimpleTokenizer(text_encoder.config.vocab_size,
                                        text_encoder.config.max_position_embeddings)

    if args.task_id is not None and args.num_tasks:
        task_id, num_tasks = args.task_id, args.num_tasks
    else:
        import jax

        task_id, num_tasks = jax.process_index(), jax.process_count()

    from open_muse_tpu.training.data import expand_urls

    shards = distribute_shards(expand_urls(args.shards), task_id, num_tasks)
    writer = ShardWriterPool(os.path.join(args.output_dir, "{shard}"))

    import random

    encode_fn = _build_encode_fn(vae_f16, vae_f8, text_encoder)

    t_start = time.time()
    n_samples = 0
    n_batches = 0
    t_steady = None
    # one-deep pipeline: the device encodes batch N while the host reads,
    # decodes and uploads batch N+1 (jax dispatch is async; the fetch of N
    # happens after N+1 is enqueued)
    pending = None
    for url in shards:
        shard_name = os.path.basename(url)
        batch = []
        for raw in tar_samples(url):
            sample = decode_sample(raw)
            if "image" not in sample:
                continue
            batch.append((raw, sample))
            if len(batch) < args.batch_size:
                continue
            t_a = time.perf_counter()
            outs = _encode_batch(batch, args, encode_fn, vae_f16, vae_f8,
                                 text_encoder, tokenizer)
            t_b = time.perf_counter()
            if pending is not None:
                _write_batch(*pending, writer)
            t_c = time.perf_counter()
            if os.environ.get("MUSE_PRE_ENCODE_TIMING"):
                print(f"  batch {n_batches}: dispatch {t_b - t_a:.2f}s "
                      f"write-prev {t_c - t_b:.2f}s", flush=True)
            pending = (batch, shard_name, outs)
            n_batches += 1
            n_samples += len(batch)
            batch = []
            if n_batches == 1:
                # steady-state window starts after the first batch (which
                # pays the jit compile)
                t_steady = time.perf_counter()
            if args.max_batches and n_batches >= args.max_batches:
                break
        if batch:
            outs = _encode_batch(batch, args, encode_fn, vae_f16, vae_f8,
                                 text_encoder, tokenizer)
            if pending is not None:
                _write_batch(*pending, writer)
            pending = (batch, shard_name, outs)
            n_batches += 1
            n_samples += len(batch)
        if args.max_batches and n_batches >= args.max_batches:
            break
    if pending is not None:
        _write_batch(*pending, writer)
    writer.close()
    dt = time.time() - t_start
    stats = {"n_samples": n_samples, "total_s": dt,
             "imgs_per_sec": n_samples / max(dt, 1e-9)}
    if n_batches > 1 and t_steady is not None:
        steady_s = time.perf_counter() - t_steady
        steady_n = n_samples - args.batch_size
        stats["steady_imgs_per_sec"] = steady_n / max(steady_s, 1e-9)
    print(f"encoded {n_samples} samples from {len(shards)} shards in {dt:.1f}s "
          f"({stats['imgs_per_sec']:.1f} samples/s"
          + (f"; steady-state {stats['steady_imgs_per_sec']:.1f} samples/s "
             f"excl. first-batch compile" if "steady_imgs_per_sec" in stats
             else "") + ")")
    return stats


def _build_encode_fn(vae_f16, vae_f8, text_encoder):
    """ALL encoders as ONE jitted program.  uint8 pixels are normalized
    on-device (4x less host->device traffic than fp32 — the dominant cost on
    remote-device hosts) and the CLIP states are cast to fp16 on-device
    before the fetch (2x less device->host)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fused(f16_params, f8_params, te_params, pixels_u8, ids):
        pixels = pixels_u8.astype(jnp.float32) / 255.0
        outs = {}
        if vae_f16 is not None:
            outs["vq_f16.npy"] = vae_f16.module.apply(
                {"params": f16_params}, pixels,
                method=vae_f16.module.get_code).astype(jnp.int32)
        if vae_f8 is not None:
            outs["vq_f8.npy"] = vae_f8.module.apply(
                {"params": f8_params}, pixels,
                method=vae_f8.module.get_code).astype(jnp.int32)
        if text_encoder is not None:
            hs, _, pooled = text_encoder.module.apply({"params": te_params}, ids)
            outs["clip_penultimate.npy"] = hs[-2].astype(jnp.float16)
            outs["clip_pooled.npy"] = pooled.astype(jnp.float16)
        return outs

    return fused


def _encode_batch(batch, args, encode_fn, vae_f16, vae_f8, text_encoder,
                  tokenizer):
    """Host transform + async device dispatch; returns device arrays."""
    import random

    import jax.numpy as jnp

    from open_muse_tpu.training.data import image_transform

    rng = random.Random(0)
    pixels = []
    for _, sample in batch:
        arr, _, _ = image_transform(sample["image"], args.resolution, rng,
                                    center_crop=True, normalize=False)
        pixels.append(arr)
    # pad short tail batches to the full batch shape: one compiled program
    # for the whole run (a tail-shape recompile costs minutes on remote
    # compile services); _write_batch only writes len(batch) entries
    pad = args.batch_size - len(pixels)
    if pad > 0:
        pixels.extend([pixels[-1]] * pad)
    pixels = jnp.asarray(np.stack(pixels))  # uint8 NHWC
    ids = jnp.zeros((len(pixels), 1), jnp.int32)
    if text_encoder is not None:
        texts = [s.get("text", "") for _, s in batch] + [""] * max(pad, 0)
        ids = jnp.asarray(tokenizer(texts, padding="max_length", truncation=True,
                                    max_length=tokenizer.model_max_length,
                                    return_tensors="np")["input_ids"])
    return encode_fn(vae_f16.params if vae_f16 is not None else {},
                     vae_f8.params if vae_f8 is not None else {},
                     text_encoder.params if text_encoder is not None else {},
                     pixels, ids)


def _write_batch(batch, shard_name, outs, writer):
    """Fetch the (compact) device outputs and hand members to the writer."""
    import jax

    # ONE device_get for all outputs: separate np.asarray fetches each pay a
    # full round-trip on remote-device hosts
    fetched = jax.device_get(outs)
    outputs = {}
    for name, host in fetched.items():
        outputs[name] = host.astype(np.int32) if name.startswith("vq_") else host
    for i, (raw, sample) in enumerate(batch):
        key = sample["__key__"]
        members = {}
        for name, arr in outputs.items():
            members[f"{key}.{name}"] = _npy_bytes(arr[i])
        if "text" in sample:
            members[f"{key}.txt"] = sample["text"].encode()
        if "metadata" in sample:
            import json

            members[f"{key}.json"] = json.dumps(sample["metadata"]).encode()
        writer.submit(shard_name, members)


if __name__ == "__main__":
    main()
