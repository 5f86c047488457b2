"""Per-op accounting of the fused train step on the real chip (round-5
verdict item 1: attack training MFU the way rounds 2-4 attacked decode).

Captures a jax.profiler trace of the fused mask->fwd->bwd->clip->adamw->EMA
step at the research architecture (training/trainer.py make_uvit_train_step,
the same program bench_train_step.py times), parses the 'XLA Ops' thread,
and prints a category breakdown + top-op table + fwd/bwd split heuristics.

Reference hot path being attacked: /root/reference/training/train_muse.py
:733-780 (loss -> backward -> optimizer under torch amp).

Usage:
  python benchmark/profile_train_step.py [--batch-size 32] [--remat off]
      [--iters 3] [--out /tmp/muse_train_trace]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmark.profile_decode import categorize, parse_trace  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--remat", default="off", choices=["off", "dots", "full"])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default="/tmp/muse_train_trace")
    args = p.parse_args(argv)

    import jax

    from benchmark.bench_train_step import _remat_value, build_step_and_state

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_muse")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    step_fn, state, batch, n_params = build_step_and_state(
        args.batch_size, _remat_value(args.remat))
    key = jax.random.PRNGKey(0)
    print(f"params: {n_params / 1e6:.1f}M; warmup/compile ...", flush=True)
    state, m = step_fn(state, batch, jax.random.fold_in(key, 0))
    float(m["loss"])
    state, m = step_fn(state, batch, jax.random.fold_in(key, 1))
    float(m["loss"])

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    for i in range(args.iters):
        state, m = step_fn(state, batch, jax.random.fold_in(key, 2 + i))
    float(m["loss"])
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
        print(f"  {cat:10s} {dur / 1e3 / args.iters:9.2f}  "
              f"{100 * dur / total:5.1f}%")
    print(f"\ntop {args.top} ops (ms/iter, count/iter):")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {dur / 1e3 / args.iters:8.3f}  "
              f"{counts[name] // args.iters:5d}  {name[:110]}")
    tail = sum(d for n, d in per_op.items() if d / max(counts[n], 1) < 30.0)
    print(f"\nsub-30us-per-instance op tail: "
          f"{tail / 1e3 / args.iters:.2f} ms/iter")
    # crude fwd/bwd attribution: XLA names backward fusions after the
    # transpose ops they contain ("transpose" / gradient dots)
    bwd = sum(d for n, d in per_op.items() if "transpose" in n.lower())
    print(f"ops with 'transpose' in the name (bwd-dot heuristic): "
          f"{bwd / 1e3 / args.iters:.2f} ms/iter")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
