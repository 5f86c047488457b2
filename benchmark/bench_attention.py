"""Attention lane microbench: XLA attention vs the Pallas flash kernel at
research shapes (VERDICT round-2 item 7 — measure the before/after that
decides whether the Pallas kernel earns a training-path switch).

Shapes: the v2 trunk (seq 256 @ 16 heads x 64d), the 512px f8 down/up blocks
(seq 1024), cross-attention (kv 77), each at CFG batch 2 and 16.  Timing is
chained-dependent-dispatch with stall discard (same discipline as bench.py).

Usage: python benchmark/bench_attention.py  [--iters 8 --chains 5]
Writes one line per case + a verdict summary to stdout.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = [
    # (label, batch, q_len, kv_len, heads, head_dim)
    ("trunk self 256px bs1(cfg2)", 2, 256, 256, 16, 64),
    ("trunk self 256px bs8(cfg16)", 16, 256, 256, 16, 64),
    ("f8 block self 512px bs1(cfg2)", 2, 1024, 1024, 12, 64),
    ("f8 block self 512px bs8(cfg16)", 16, 1024, 1024, 12, 64),
    ("trunk cross (text 77) bs8(cfg16)", 16, 256, 77, 16, 64),
]


def time_fn(fn, args, iters, chains):
    """Per-call ms with the iteration loop INSIDE one jit: a lax.fori_loop
    feeds each attention output back in as the next query, so the tunnel's
    ~3-5 ms per-dispatch RTT is paid once per chain instead of once per call
    (at these shapes the kernel itself is tens of microseconds — per-call
    dispatch timing would only measure the tunnel)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    q, k, v = args

    @jax.jit
    def chain(q, k, v):
        def body(_, acc):
            return fn(acc, k, v)
        return lax.fori_loop(0, iters, body, q)

    float(jnp.sum(chain(q, k, v)))  # compile + force
    chain_ms = []
    for _ in range(chains):
        t0 = time.perf_counter()
        float(jnp.sum(chain(q, k, v)))
        chain_ms.append((time.perf_counter() - t0) * 1000 / iters)
    med = float(np.median(chain_ms))
    kept = [t for t in chain_ms if t <= 3 * med]
    return float(np.median(kept))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--chains", type=int, default=5)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache
    from open_muse_tpu.ops.layers import dot_product_attention
    from open_muse_tpu.ops.pallas.flash_attention import flash_attention

    _enable_compile_cache()
    dtype = jnp.dtype(args.dtype)
    xla_fn = jax.jit(dot_product_attention)
    results = []
    for label, b, tq, tk, h, d in CASES:
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(b, tq, h, d), dtype)
        k = jnp.asarray(rs.randn(b, tk, h, d), dtype)
        v = jnp.asarray(rs.randn(b, tk, h, d), dtype)
        xla_ms = time_fn(xla_fn, (q, k, v), args.iters, args.chains)
        try:
            pallas_ms = time_fn(flash_attention, (q, k, v), args.iters,
                                args.chains)
        except Exception as e:
            pallas_ms = float("nan")
            print(f"{label}: pallas failed: {e}")
        ratio = xla_ms / pallas_ms if pallas_ms == pallas_ms else float("nan")
        results.append((label, xla_ms, pallas_ms, ratio))
        print(f"{label:36s} xla {xla_ms:7.3f} ms   pallas {pallas_ms:7.3f} ms "
              f"  speedup {ratio:5.2f}x")
    wins = [r for r in results if r[3] == r[3] and r[3] > 1.1]
    print(f"\nverdict: pallas wins {len(wins)}/{len(results)} cases by >10% "
          f"-> {'keep as opt-in' if len(wins) < len(results) else 'promote'}")
    print("caveat: cases under ~0.5 ms sit at the tunnel RTT/iters "
          "measurement floor; the decisive case is large-seq self-attention "
          "(O(S^2) logits in HBM), which this model family never runs — the "
          "f8 down/up blocks cross-attend to 77 text tokens "
          "(models/transformer_v2.py AttentionBlock2D), and trunk self-attn "
          "is 256 tokens.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
