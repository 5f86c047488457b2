"""Attention-sublayer mega-kernel microbench (round-4 verdict item 4).

Measures the fused Pallas attention sublayer (ops/pallas/attn_sublayer) —
residual add + rmsnorm + AdaLN + qkv projection + all-heads attention + out
projection in ONE pallas_call — against the identical pure-XLA expression at
the research trunk's real shapes (hidden 1024, 16 heads of head_dim 64,
rows = cfg_batch x 256 tokens; reference workload
muse/modeling_transformer_v2.py:757-792).

Timing is in-jit fori_loop chaining with the sublayer's own (out, residual)
pair feeding the next iteration — the only tunnel-RTT-proof method at
sub-millisecond op times, and each iteration is one full sublayer (~0.6 ms),
safely above the measured ~0.58 ms per-iteration loop floor (STATUS.md
methodology note; amortize further with --layers to stack several sublayers
per iteration like the 22-layer trunk does).

End-to-end arbiter (the number that decides the default): 512px/bs8/12-step
375.2 -> 336.1 ms with the kernel on (benchmark/artifacts/all.csv).

Usage: python benchmark/bench_attn_sublayer.py [--iters 30 --chains 5 --layers 4]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HIDDEN = 1024
HEADS = 16
# The REAL serving context length: 77 CLIP tokens.  attn_sublayer_cross pads
# to the 128 lane boundary internally and masks the softmax columns — feeding
# an already-aligned kv would skip the where-iota mask branch entirely and
# under-report the production cost (advisor round-4).
KV_LEN = 77

CASES = [
    # (label, cfg_batch, seq)
    ("512px bs8 trunk (16x256)", 16, 256),
    ("512px bs1 trunk (2x256)", 2, 256),
]


def _inputs(batch, seq, key):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    scale = 1.0 / math.sqrt(HIDDEN)
    return dict(
        x=jax.random.normal(ks[0], (batch, seq, HIDDEN), dt),
        res=jax.random.normal(ks[1], (batch, seq, HIDDEN), dt),
        ln=jnp.ones((HIDDEN,), jnp.float32),
        adaln=jax.random.normal(ks[2], (batch, 2 * HIDDEN), dt) * 0.1,
        wqkv=jax.random.normal(ks[3], (HIDDEN, 3 * HIDDEN), dt) * scale,
        wq=jax.random.normal(ks[4], (HIDDEN, HIDDEN), dt) * scale,
        wout=jax.random.normal(ks[5], (HIDDEN, HIDDEN), dt) * scale,
        kv=jax.random.normal(ks[6], (batch, KV_LEN, 2 * HIDDEN), dt),
    )


def time_chain(step, p, iters, chains, layers):
    """step(x, res, p) -> (x, res); chains the pair through iters*layers
    sublayers inside one jit."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(x, res, p):
        def body(_, carry):
            x, res = carry
            for _ in range(layers):
                x, res = step(x, res, p)
            return x, res
        return lax.fori_loop(0, iters, body, (x, res))

    out = chain(p["x"], p["res"], p)
    float(jnp.sum(out[0].astype(jnp.float32)))  # compile + force
    times = []
    for _ in range(chains):
        t0 = time.perf_counter()
        out = chain(p["x"], p["res"], p)
        float(jnp.sum(out[0].astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / (iters * layers))
    med = float(np.median(times))
    times = [t for t in times if t <= 3 * med] or [med]
    return float(np.median(times)) * 1e6  # us per sublayer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chains", type=int, default=5)
    ap.add_argument("--layers", type=int, default=4,
                    help="sublayers per loop iteration (amortizes the "
                         "~0.58 ms in-jit loop floor)")
    args = ap.parse_args(argv)

    import jax

    from bench import _enable_compile_cache
    from open_muse_tpu.ops.pallas import attn_sublayer as A

    _enable_compile_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.PRNGKey(0)

    def self_fused(x, res, p):
        return A.attn_sublayer_self(x, res, p["ln"], p["adaln"], p["wqkv"],
                                    p["wout"], num_heads=HEADS)

    def self_xla(x, res, p):
        return A._xla_ref_self(x, res, p["ln"], p["adaln"], p["wqkv"],
                               p["wout"], HEADS, 1e-6)

    def cross_fused(x, res, p):
        return A.attn_sublayer_cross(x, res, p["ln"], p["adaln"], p["wq"],
                                     p["wout"], p["kv"], num_heads=HEADS)

    def cross_xla(x, res, p):
        return A._xla_ref_cross(x, res, p["ln"], p["adaln"], p["wq"],
                                p["wout"], p["kv"], HEADS, 1e-6, KV_LEN)

    for label, batch, seq in CASES:
        p = _inputs(batch, seq, key)
        for kind, fused, xla in (("self", self_fused, self_xla),
                                 ("cross", cross_fused, cross_xla)):
            us_f = time_chain(fused, p, args.iters, args.chains, args.layers)
            us_x = time_chain(xla, p, args.iters, args.chains, args.layers)
            print(f"{label:34s} {kind:5s}  pallas {us_f:7.1f} us/sublayer  "
                  f"xla {us_x:7.1f}  ({us_x / us_f:.2f}x)")


if __name__ == "__main__":
    main()
