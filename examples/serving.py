"""Minimal batched serving loop for a MUSE checkpoint.

Demonstrates the intended production serving shape on TPU:

* the WHOLE text2image path (tokenize -> CLIP -> 12-step CFG decode -> VQ
  decode) is compiled ONCE as a single XLA program at a fixed batch size
  (`PipelineMuse.compile_text2image`) — per request there is exactly one
  device dispatch;
* requests are micro-batched up to ``--batch-size`` (short batches are
  padded with empty prompts, so there is never a recompile);
* throughput/latency are reported per batch.

Usage:
  python examples/serving.py --checkpoint CKPT_DIR [--batch-size 4]
  echo "a cat in a spacesuit" | python examples/serving.py --checkpoint CKPT
  python examples/serving.py --checkpoint CKPT --prompts prompts.txt

Works with any reference-layout checkpoint (see
scripts/stage_reference_checkpoint.py for an offline-stageable one).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--timesteps", type=int, default=12)
    p.add_argument("--guidance-scale", type=float, default=8.0)
    p.add_argument("--seq-len", type=int, default=None,
                   help="transformer sequence length (defaults to the "
                        "checkpoint's native 256)")
    p.add_argument("--prompts", default=None,
                   help="file with one prompt per line (default: stdin)")
    p.add_argument("--resolution", type=int, default=None,
                   help="decode resolution for the micro-conds (defaults to "
                        "the resolution implied by --seq-len and the f16 VQ: "
                        "sqrt(seq_len)*16)")
    p.add_argument("--out-dir", default="serve_out")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_muse"))

    pipe = PipelineMuse.from_pretrained(args.checkpoint)
    fused = pipe.compile_text2image(
        batch_size=args.batch_size, timesteps=args.timesteps,
        guidance_scale=args.guidance_scale, seq_len=args.seq_len or 256)

    def tokenize(prompts):
        enc = pipe.tokenizer(prompts, padding="max_length", truncation=True,
                             max_length=pipe.tokenizer.model_max_length,
                             return_tensors="np")
        return jnp.asarray(np.asarray(enc["input_ids"]), jnp.int32)

    # micro-conds condition on the ORIGINAL image size: match the decode
    # resolution unless overridden (a 256px checkpoint served as if 512
    # subtly shifts the output distribution)
    seq_len = args.seq_len or 256
    res = args.resolution or int(seq_len ** 0.5) * 16
    micro = jnp.asarray([[res, res, 0, 0, 6.0]] * args.batch_size,
                        jnp.float32)
    key = jax.random.PRNGKey(args.seed)

    print(f"compiling fused program (batch={args.batch_size}, "
          f"{args.timesteps} steps)...", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(fused(tokenize([""] * args.batch_size), micro, key))
    print(f"compiled in {time.perf_counter() - t0:.1f}s; serving", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    src = open(args.prompts) if args.prompts else sys.stdin
    served = 0
    pending = []

    def flush(pending, served, key):
        real = len(pending)
        batch = pending + [""] * (args.batch_size - real)  # pad, no recompile
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        pixels = np.asarray(jax.block_until_ready(
            fused(tokenize(batch), micro, sub)))
        dt = time.perf_counter() - t0
        for i in range(real):
            path = os.path.join(args.out_dir, f"{served + i:05d}.png")
            PipelineMuse.to_pil_image(pixels[i]).save(path)
        print(f"batch of {real}: {dt * 1e3:.0f} ms "
              f"({real / dt:.2f} img/s) -> {args.out_dir}", flush=True)
        return served + real, key

    for line in src:
        prompt = line.strip()
        if not prompt:
            continue
        pending.append(prompt)
        if len(pending) == args.batch_size:
            served, key = flush(pending, served, key)
            pending = []
    if pending:
        served, key = flush(pending, served, key)
    print(f"served {served} images")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
