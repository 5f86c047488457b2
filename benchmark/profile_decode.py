"""Per-op accounting of the fused text2image decode on the real chip.

Captures a jax.profiler trace of the fused pipeline (same program bench.py /
muse_perf.py time), parses the TensorBoard trace's 'XLA Ops' thread, and
prints a category breakdown + top ops table.  This is the evidence base for
kernel decisions (round-2's per-op accounting was ad hoc; round-4 verdict
item 4 asks for kernel-vs-XLA per-op deltas, so the harness is now in-tree).

Wall-clock through the tunnel includes ~10-50 ms RTT per dispatch, so only
on-device op durations from the trace are meaningful (STATUS.md).

Usage:
  python benchmark/profile_decode.py [--resolution 512] [--batch-size 8]
      [--timesteps 12] [--iters 3] [--out /tmp/muse_trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fused(resolution: int, batch_size: int, timesteps: int):
    """Research-architecture fused pipeline — the same construction
    benchmark/muse_perf.py times (its build() + compile_text2image)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmark.muse_perf import build
    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    transformer, text_encoder, vae, seq_len = build(resolution, jnp.bfloat16)
    rs = np.random.RandomState(0)
    input_ids = jnp.asarray(rs.randint(1, 49000, (batch_size, 77)),
                            dtype=jnp.int32)
    micro = jnp.asarray([[512, 512, 0, 0, 6.0]] * batch_size, jnp.float32)

    class _Tok:
        model_max_length = 77

        def __call__(self, texts, **kw):
            return {"input_ids": np.full((len(texts), 77), 49407, np.int32)}

    pipe = PipelineMuse(vae=vae, transformer=transformer,
                        text_encoder=text_encoder, tokenizer=_Tok())
    call = pipe.compile_text2image(batch_size=batch_size,
                                   timesteps=timesteps, guidance_scale=8.0,
                                   temperature=(2, 0), seq_len=seq_len)
    return call, (input_ids, micro, jax.random.PRNGKey(0))


def parse_trace(trace_dir: str):
    """Aggregate on-device op durations from the newest trace.json.gz."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find the 'XLA Ops' thread ids (one per TPU core)
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and "XLA Ops" in str(e.get("args", {}).get("name", "")):
            op_tids.add((e.get("pid"), e.get("tid")))
    per_op = defaultdict(float)
    per_op_count = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            per_op[e["name"]] += e.get("dur", 0.0)
            per_op_count[e["name"]] += 1
    return per_op, per_op_count


CATEGORIES = (
    ("fusion", "fusion"), ("conv", "convolution"), ("matmul", "dot"),
    ("pallas", "custom-call"), ("copy", "copy"), ("scan/loop", "while"),
    ("dynamic", "dynamic"),
)


def categorize(name: str) -> str:
    low = name.lower()
    for label, key in CATEGORIES:
        if key in low:
            return label
    return "other"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--timesteps", type=int, default=12)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--out", default="/tmp/muse_trace")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_muse")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    fn, inputs = build_fused(args.resolution, args.batch_size, args.timesteps)
    print("warmup/compile ...", flush=True)
    jax.block_until_ready(fn(*inputs))

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        out = fn(*inputs)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    per_op, counts = parse_trace(args.out)
    total = sum(per_op.values())
    by_cat = defaultdict(float)
    for name, dur in per_op.items():
        by_cat[categorize(name)] += dur
    print(f"\ntotal on-device op time: {total / 1e3 / args.iters:.2f} ms/iter "
          f"({args.iters} iters)")
    print("\nby category (ms/iter, % of total):")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:10s} {dur / 1e3 / args.iters:9.2f}  {100 * dur / total:5.1f}%")
    print(f"\ntop {args.top} ops (ms/iter, count/iter):")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {dur / 1e3 / args.iters:8.3f}  {counts[name] // args.iters:5d}  {name[:100]}")
    # the sub-30us tail the 512px analysis names (STATUS.md)
    tail = sum(d for n, d in per_op.items()
               if d / max(counts[n], 1) < 30.0)
    print(f"\nsub-30us-per-instance op tail: {tail / 1e3 / args.iters:.2f} ms/iter")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
