"""GLU-FFN microbench: attack the measured 60%-of-peak down-projection
(round-3 verdict item 2).

The 512px/bs8 per-op profile (STATUS.md) shows the trunk FFN as two fused
matmul ops per layer: the GLU up-pair at ~96% of peak and the ``wo``
down-projection at ~60% — XLA fuses ``gelu(a) * b`` as a *producer* into the
``wo`` matmul, and the elementwise VPU work throttles the MXU feed.  The
candidate fix is an explicit hidden-materialization barrier
(``lax.optimization_barrier``): the multiply then fuses into the up-pair's
epilogue instead, leaving ``wo`` a clean matmul.

Cases measured at the trunk's real shapes (hidden 1024, intermediate 2816,
rows = cfg_batch x seq):

- ``baseline``   — ``wo(gelu(x@wi0) * (x@wi1))`` exactly as the model traces
- ``barrier``    — same with an optimization_barrier on the GLU product
- ``matmul_sol`` — a bare (rows,2816)@(2816,1024) matmul: the down-proj's
  speed-of-light, for the utilization denominator

Timing is in-jit fori_loop chaining (output feeds the next iteration's
input) — the only tunnel-RTT-proof method at sub-millisecond op times (see
bench_attention.py).

Usage: python benchmark/bench_ffn.py [--iters 50 --chains 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HIDDEN = 1024
INTER = 2816

CASES = [
    # (label, rows) — rows = cfg_batch * seq
    ("512px bs8 trunk (16x256)", 16 * 256),
    ("512px bs1 trunk (2x256)", 2 * 256),
    ("512px bs8 f8-block rows (16x1024)", 16 * 1024),
]


def time_fn(fn, x, params, iters, chains):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(x, params):
        def body(_, acc):
            return fn(acc, params)
        return lax.fori_loop(0, iters, body, x)

    float(jnp.sum(chain(x, params)))  # compile + force
    chain_ms = []
    for _ in range(chains):
        t0 = time.perf_counter()
        float(jnp.sum(chain(x, params)))
        chain_ms.append((time.perf_counter() - t0) * 1000 / iters)
    med = float(np.median(chain_ms))
    kept = [t for t in chain_ms if t <= 3 * med]
    return float(np.median(kept))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--chains", type=int, default=5)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import _enable_compile_cache

    _enable_compile_cache()
    peak_tflops = 197.0  # v5e bf16

    rs = np.random.RandomState(0)

    def variants():
        def baseline(x, p):
            wi0, wi1, wo = p
            hidden = jax.nn.gelu(x @ wi0, approximate=False) * (x @ wi1)
            return (hidden @ wo).astype(x.dtype)

        def barrier(x, p):
            wi0, wi1, wo = p
            hidden = jax.nn.gelu(x @ wi0, approximate=False) * (x @ wi1)
            hidden = lax.optimization_barrier(hidden)
            return (hidden @ wo).astype(x.dtype)

        return [("baseline", baseline), ("barrier", barrier)]

    for label, rows in CASES:
        wi0 = jnp.asarray(rs.randn(HIDDEN, INTER) * 0.02, jnp.bfloat16)
        wi1 = jnp.asarray(rs.randn(HIDDEN, INTER) * 0.02, jnp.bfloat16)
        wo = jnp.asarray(rs.randn(INTER, HIDDEN) * 0.02, jnp.bfloat16)
        x = jnp.asarray(rs.randn(rows, HIDDEN), jnp.bfloat16)

        # speed-of-light: the three matmuls alone
        ffn_flops = 2 * rows * HIDDEN * INTER * 3
        sol_ms = ffn_flops / (peak_tflops * 1e12) * 1e3

        print(f"== {label} (rows={rows}; matmul speed-of-light "
              f"{sol_ms:.3f} ms)")
        results = {}
        for name, fn in variants():
            ms = time_fn(fn, x, (wi0, wi1, wo), args.iters, args.chains)
            results[name] = ms
            eff = 100 * sol_ms / ms
            print(f"  {name:10s} {ms:7.3f} ms  ({eff:5.1f}% of matmul SoL)")
        delta = 100 * (results["baseline"] - results["barrier"]) / \
            results["baseline"]
        print(f"  barrier vs baseline: {delta:+.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
