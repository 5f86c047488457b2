"""Benchmark sweep: wall-clock latency across batch/steps/resolution configs.

Reference parity: benchmark/muse_perf.py — sweeps batch {1,8} x timesteps
{12,20} x resolution {256,512} for muse and writes ``artifacts/all.csv`` with
the same header schema (:41-239, 533-546); the GPU comparators (SD1.5/SDXL/
würstchen/LCM via diffusers) do not exist on TPU and their published A100
numbers live in BASELINE.md for comparison.

Timing note: through the remote-device tunnel, per-call block_until_ready can
return early, so we time N dependent dispatches forced once (see bench.py).

Usage: python benchmark/muse_perf.py [--device tpu] [--out benchmark/artifacts/all.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CSV_FIELDS = ["model", "resolution", "batch_size", "timesteps", "use_xformers",
              "use_fused_residual_norm", "device", "median_ms", "imgs_per_sec",
              "peak_mem_gb", "tflops_per_call", "mfu_pct"]

# TPU v5e (v5 lite) peak bf16 throughput per chip
PEAK_TFLOPS = {"TPU v5 lite": 197.0}


def build(resolution: int, dtype):
    from open_muse_tpu.models.clip_text import CLIPTextEncoder
    from open_muse_tpu.models.taming_vqgan import VQGANModel
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

    force = resolution == 512  # 512px research model downsamples 32x32 -> 16x16
    transformer = MaskGiTUViT_v2(force_down_up_sample=force, dtype=dtype)
    text_encoder = CLIPTextEncoder(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12, max_position_embeddings=77,
        projection_dim=768, dtype=dtype)
    # 256px -> f16 (256 tokens); 512px -> f8 (1024 tokens)
    vae = VQGANModel(resolution=resolution, num_embeddings=8192,
                     channel_mult=(1, 1, 2, 2, 4) if resolution == 256
                     else (1, 1, 2, 4),
                     z_channels=256, quantized_embed_dim=256)
    # bf16 weights (VQ stays fp32 like the reference's fp32 VAE)
    transformer.astype(dtype)
    text_encoder.astype(dtype)
    seq_len = 256 if resolution == 256 else 1024
    return transformer, text_encoder, vae, seq_len


def run_case(transformer, text_encoder, vae, seq_len, batch_size, timesteps,
             iters: int = 12):
    import jax
    import jax.numpy as jnp

    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    rs = np.random.RandomState(0)
    input_ids = jnp.asarray(rs.randint(1, 49000, (batch_size, 77)), dtype=jnp.int32)
    micro = jnp.asarray([[512, 512, 0, 0, 6.0]] * batch_size, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    class _Tok:  # fixed empty-prompt ids (no network/tokenizer files needed)
        model_max_length = 77

        def __call__(self, texts, **kw):
            return {"input_ids": np.full((len(texts), 77), 49407, np.int32)}

    pipe = PipelineMuse(vae=vae, transformer=transformer,
                        text_encoder=text_encoder, tokenizer=_Tok())
    call = pipe.compile_text2image(batch_size=batch_size, timesteps=timesteps,
                                   guidance_scale=8.0, temperature=(2, 0),
                                   seq_len=seq_len)

    float(jnp.sum(call(input_ids, micro, key)))  # compile + force
    # second warm call: the first post-compile dispatch through the tunnel
    # routinely pays extra RTT that poisons small-iters medians
    float(jnp.sum(call(input_ids, micro, jax.random.fold_in(key, 999))))

    # Analytic FLOP count for the MFU column.  XLA's cost_analysis counts the
    # decode while-loop BODY once regardless of trip count, so it can't be
    # used directly; this is the matmul-dominant lower bound: per decode step
    # one CFG-batched (2B) transformer forward at the trunk sequence length,
    # plus one text-encoder forward over [cond|empty] prompts.  (VQ decode
    # and the O(S^2) attention terms are excluded -> MFU is a lower bound.)
    trunk_tokens = 256  # 256px f16 trunk; 512px force_down_up_sample -> 16x16
    p_t = transformer.num_parameters()
    p_te = text_encoder.num_parameters()
    flops = (timesteps * 2 * p_t * (2 * batch_size) * trunk_tokens
             + 2 * p_te * (2 * batch_size) * 77)

    # static peak-memory estimate from the compiled program
    # (device.memory_stats() is unavailable through the tunnel backend)
    peak_gb_static = ""
    try:
        mem = call.lower(input_ids, micro, key).compile().memory_analysis()
        peak_gb_static = round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes) / 1e9, 2)
    except Exception:
        pass
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = acc + jnp.sum(call(input_ids, micro, jax.random.fold_in(key, i)))
    float(acc)
    total = (time.perf_counter() - t0) * 1000
    median_ms = total / iters
    # peak device memory (reference measure_max_memory_allocated,
    # benchmark/muse_perf.py:533-542); live stats when the backend exposes
    # them, else the compiled program's static analysis from above
    peak_gb = peak_gb_static
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            peak_gb = round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)
    except Exception:
        pass
    return median_ms, batch_size / (median_ms / 1000), peak_gb, flops


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "all.csv"))
    parser.add_argument("--resolutions", type=int, nargs="+", default=[256, 512])
    parser.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8])
    parser.add_argument("--timesteps", type=int, nargs="+", default=[12, 20])
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--fresh", action="store_true",
                        help="overwrite the CSV instead of appending")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()
    device = jax.devices()[0].device_kind
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # incremental CSV: remote-compile services can drop mid-sweep; every
    # finished case is persisted immediately
    write_header = not os.path.isfile(args.out) or args.fresh
    mode = "w" if write_header else "a"
    f = open(args.out, mode, newline="")
    writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
    if write_header:
        writer.writeheader()
    for resolution in args.resolutions:
        transformer, text_encoder, vae, seq_len = build(resolution, jnp.bfloat16)
        for batch_size in args.batch_sizes:
            for steps in args.timesteps:
                try:
                    ms, imgs, peak_gb, flops = run_case(
                        transformer, text_encoder, vae, seq_len, batch_size,
                        steps, iters=args.iters)
                except Exception as e:  # keep sweeping past transient failures
                    print(f"case res={resolution} bs={batch_size} steps={steps} "
                          f"failed: {e}")
                    continue
                tflops = round(flops / 1e12, 3) if flops else ""
                mfu = ""
                if flops and device in PEAK_TFLOPS:
                    mfu = round(100 * (flops / 1e12) / (ms / 1e3)
                                / PEAK_TFLOPS[device], 1)
                row = {"model": "muse_tpu", "resolution": resolution,
                       "batch_size": batch_size, "timesteps": steps,
                       "use_xformers": "n/a", "use_fused_residual_norm": "xla-fused",
                       "device": device, "median_ms": round(ms, 1),
                       "imgs_per_sec": round(imgs, 2), "peak_mem_gb": peak_gb,
                       "tflops_per_call": tflops, "mfu_pct": mfu}
                writer.writerow(row)
                f.flush()
                print(row)
        del transformer, text_encoder, vae
    f.close()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
