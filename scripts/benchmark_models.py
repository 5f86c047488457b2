"""Micro-benchmark of transformer.generate2 across precision settings.

Reference parity: scripts/benchmark_models.py:10-59 (generate2 fp32/fp16/
xformers sweep).  TPU settings: fp32 vs bf16 params+compute (bf16 is the
TPU analog of fp16 autocast; xformers is replaced by XLA-fused attention).

Usage: python scripts/benchmark_models.py [--timesteps 12] [--batch-size 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_generate(dtype_name: str, timesteps: int, batch_size: int, iters: int = 6):
    import jax
    import jax.numpy as jnp

    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    model = MaskGiTUViT_v2(dtype=dtype)
    rs = np.random.RandomState(0)
    ehs = jnp.asarray(rs.randn(batch_size, 77, 768), dtype=dtype)
    pooled = jnp.asarray(rs.randn(batch_size, 768), dtype=dtype)
    micro = jnp.asarray([[512, 512, 0, 0, 6.0]], dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    def call(k):
        return model.generate2(ehs, pooled, micro, empty_embeds=ehs[:1],
                               empty_cond_embeds=pooled[:1], timesteps=timesteps,
                               guidance_scale=8.0, seq_len=256, key=k)

    float(jnp.sum(call(key)))
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = acc + jnp.sum(call(jax.random.fold_in(key, i)))
    float(acc)
    return (time.perf_counter() - t0) * 1000 / iters


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--timesteps", type=int, default=12)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--iters", type=int, default=6)
    args = parser.parse_args(argv)

    for dtype_name in ["bf16", "fp32"]:
        ms = bench_generate(dtype_name, args.timesteps, args.batch_size, args.iters)
        print(json.dumps({"setting": dtype_name, "timesteps": args.timesteps,
                          "batch_size": args.batch_size,
                          "median_ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
