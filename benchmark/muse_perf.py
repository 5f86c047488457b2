"""Benchmark sweep: wall-clock latency across batch/steps/resolution configs.

Reference parity: benchmark/muse_perf.py — sweeps batch {1,8} x timesteps
{12,20} x resolution {256,512} for muse and writes ``artifacts/all.csv``
(:41-239, 533-546).  The GPU comparators (SD1.5/SDXL/SSD-1B via diffusers)
cannot run on a TPU host, so their PUBLISHED A100/4090 rows (from the
reference's committed artifact, see BASELINE.md) are merged into the same CSV
with device "... (published)" so one file tells the comparison story.

Timing: through the remote-device tunnel per-call ``block_until_ready`` can
return early and a single stalled dispatch can poison a mean (round-2 verdict:
a 1780 ms headline row next to a 79 ms 20-step row).  We therefore time
CHAINS of dependent dispatches forced once per chain, take the median across
chains, and discard chains > 3x that median as tunnel stalls before the final
median.  The sweep then asserts internal consistency (12-step <= 20-step per
config) and fails loudly instead of committing garbage.

FLOPs: derived from XLA's compiled-executable cost analysis per component
(transformer forward x timesteps + text encode + VQ decode) when the backend
exposes it — this covers convs and O(S^2) attention.  If unavailable, an
analytic matmul-dominant LOWER BOUND is used.  Either way the utilization
column is named ``mfu_est_pct`` and ``flops_source`` records which path
produced it.

Usage: python benchmark/muse_perf.py [--fresh] [--out benchmark/artifacts/all.csv]
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
              "peak_mem_gb", "tflops_per_call_est", "mfu_est_pct",
              "flops_source"]

# TPU v5e (v5 lite) peak bf16 throughput per chip
PEAK_TFLOPS = {"TPU v5 lite": 197.0}

# Published rows from the reference's committed artifact
# (/root/reference/benchmark/artifacts/all.csv, summarized in BASELINE.md) —
# best setting per config (fp16 + xformers + fused norm where applicable).
PUBLISHED_ROWS = [
    # model, resolution, batch, steps, device, median_ms, peak_mem_gb
    ("muse", 256, 1, 12, "A100 (published)", 474.0, 1.97),
    ("muse", 256, 1, 20, "A100 (published)", 762.0, 1.97),
    ("muse", 256, 8, 12, "A100 (published)", 601.8, 3.02),
    ("muse", 256, 8, 20, "A100 (published)", 923.7, 3.02),
    ("muse", 512, 1, 12, "A100 (published)", 538.5, 2.43),
    ("muse", 512, 1, 20, "A100 (published)", 827.4, 2.43),
    ("muse", 512, 8, 12, "A100 (published)", 1004.5, 6.66),
    ("muse", 512, 8, 20, "A100 (published)", 1392.4, 6.66),
    ("muse", 256, 1, 12, "RTX 4090 (published)", 199.0, ""),
    ("muse", 256, 1, 20, "RTX 4090 (published)", 327.8, ""),
    ("muse", 256, 8, 12, "RTX 4090 (published)", 454.1, ""),
    ("muse", 256, 8, 20, "RTX 4090 (published)", 695.4, ""),
    ("muse", 512, 1, 12, "RTX 4090 (published)", 235.8, ""),
    ("muse", 512, 1, 20, "RTX 4090 (published)", 371.8, ""),
    ("muse", 512, 8, 12, "RTX 4090 (published)", 763.3, ""),
    ("muse", 512, 8, 20, "RTX 4090 (published)", 1032.8, ""),
    ("stable_diffusion_1_5", 512, 1, 12, "A100 (published)", 479.1, ""),
    ("sdxl", 1024, 1, 12, "A100 (published)", 1732.2, ""),
    ("ssd_1b", 1024, 1, 12, "A100 (published)", 1210.9, ""),
]


def published_rows():
    rows = []
    for model, res, bs, steps, device, ms, mem in PUBLISHED_ROWS:
        rows.append({
            "model": model, "resolution": res, "batch_size": bs,
            "timesteps": steps, "use_xformers": "published",
            "use_fused_residual_norm": "published", "device": device,
            "median_ms": ms, "imgs_per_sec": round(bs / (ms / 1000), 2),
            "peak_mem_gb": mem, "tflops_per_call_est": "",
            "mfu_est_pct": "", "flops_source": ""})
    return rows


def build(resolution: int, dtype, fullres: bool = False):
    from open_muse_tpu.models.clip_text import CLIPTextEncoder
    from open_muse_tpu.models.taming_vqgan import VQGANModel
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2

    # 512px benchmark default downsamples 32x32 -> 16x16 like the reference's
    # benchmarked variant; ``fullres`` keeps the 1024-token trunk
    # (configs/research_run_512.yaml, "NO down/up-sample") — the seq-1024
    # shape the staged attn_sublayer kernel gained in round 5.
    force = resolution == 512 and not fullres
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


def _xla_flops(fn, *args):
    """FLOPs of one call from XLA's cost analysis.  Prefers the LOWERED
    module's analysis (no device compile — important through the tunnel,
    where each compile costs minutes); falls back to the compiled
    executable's; None when neither is exposed."""
    import jax

    try:
        lowered = jax.jit(fn).lower(*args)
    except Exception:
        return None
    for get in (lambda: lowered.cost_analysis(),
                lambda: lowered.compile().cost_analysis()):
        try:
            ca = get()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            flops = float(ca.get("flops", 0.0))
            if flops > 0:
                return flops
        except Exception:
            pass
    return None


def component_flops(transformer, text_encoder, vae, seq_len, batch_size,
                    cfg_mult: int = 2):
    """Per-component FLOPs from cost analysis: (per_step, fixed, source).
    per_step = one CFG-batched transformer forward; fixed = text encode
    (cond+empty) + VQ decode.  Falls back to an analytic matmul-dominant
    LOWER BOUND (trunk tokens only; convs and O(S^2) attention excluded).
    ``cfg_mult=1`` measures the distilled no-CFG decode (single forward,
    single text encode)."""
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    b2 = cfg_mult * batch_size  # CFG doubles the batch inside the decode loop
    hs = transformer.config.encoder_hidden_size
    ids = jnp.asarray(rs.randint(0, 100, (b2, seq_len)), jnp.int32)
    ehs = jnp.zeros((b2, 77, hs), jnp.float32)
    cond = jnp.zeros((b2, transformer.config.cond_embed_dim), jnp.float32)
    micro = jnp.zeros((b2, 5), jnp.float32)

    fwd = _xla_flops(
        lambda i, e, c, m: transformer.module.apply(
            {"params": transformer.params}, i, e, c, m), ids, ehs, cond, micro)
    te_ids = jnp.zeros((b2, 77), jnp.int32)
    te = _xla_flops(
        lambda i: text_encoder.module.apply(
            {"params": text_encoder.params}, i), te_ids)
    codes = jnp.asarray(rs.randint(0, 100, (batch_size, seq_len)), jnp.int32)
    vq = _xla_flops(
        lambda c: vae.module.apply({"params": vae.params}, c,
                                   method=type(vae.module).decode_code), codes)
    if fwd is not None:
        return fwd, (te or 0.0) + (vq or 0.0), "xla-cost-analysis"
    trunk_tokens = 256
    per_step = 2 * transformer.num_parameters() * b2 * trunk_tokens
    fixed = 2 * text_encoder.num_parameters() * b2 * 77
    return per_step, fixed, "analytic-matmul-lb"


def run_case(transformer, text_encoder, vae, seq_len, batch_size, timesteps,
             iters: int = 4, chains: int = 5, guidance_scale: float = 8.0):
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
                                   guidance_scale=guidance_scale,
                                   temperature=(2, 0), seq_len=seq_len)

    float(jnp.sum(call(input_ids, micro, key)))  # compile + force
    # second warm call: the first post-compile dispatch through the tunnel
    # routinely pays extra RTT that poisons small-iters medians
    float(jnp.sum(call(input_ids, micro, jax.random.fold_in(key, 999))))

    # static peak-memory estimate from the compiled program
    # (device.memory_stats() is unavailable through the tunnel backend)
    peak_gb = ""
    try:
        mem = call.lower(input_ids, micro, key).compile().memory_analysis()
        peak_gb = round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes) / 1e9, 2)
    except Exception:
        pass
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            peak_gb = round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)
    except Exception:
        pass

    # chained timing with stall discard (see module docstring)
    chain_ms = []
    for c in range(chains):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for i in range(iters):
            acc = acc + jnp.sum(call(input_ids, micro,
                                     jax.random.fold_in(key, c * 1000 + i)))
        float(acc)
        chain_ms.append((time.perf_counter() - t0) * 1000 / iters)
    med = float(np.median(chain_ms))
    kept = [t for t in chain_ms if t <= 3 * med]
    dropped = len(chain_ms) - len(kept)
    if dropped:
        print(f"  discarded {dropped}/{chains} chains as tunnel stalls "
              f"(median {med:.1f} ms, all: {[round(t, 1) for t in chain_ms]})")
    median_ms = float(np.median(kept))
    return median_ms, batch_size / (median_ms / 1000), peak_gb


def validate_rows(rows):
    """Internal consistency: more decode steps can't be faster.  Returns a
    list of violation strings (empty = consistent)."""
    by_config = {}
    for r in rows:
        key = (r["model"], r["device"], int(r["resolution"]),
               int(r["batch_size"]))
        by_config.setdefault(key, {})[int(r["timesteps"])] = float(r["median_ms"])
    problems = []
    for key, steps in by_config.items():
        ordered = sorted(steps.items())
        for (s1, ms1), (s2, ms2) in zip(ordered, ordered[1:]):
            if ms1 > ms2:
                problems.append(f"{key}: {s1}-step {ms1} ms > {s2}-step {ms2} ms")
    return problems


def flops_via_cpu_subprocess(resolution, batch_size, cfg_mult: int = 2,
                             fullres: bool = False):
    """XLA cost analysis needs a backend that exposes it — the axon tunnel
    returns None for both lowered and compiled analyses, the CPU backend
    answers instantly from the lowered module (no compile).  Run the analysis
    in a CPU-forced subprocess; the FLOP count is backend-independent."""
    import json
    import subprocess

    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "artifacts", ".flops_cache.json")
    key = (f"{resolution}-{batch_size}" if cfg_mult == 2
           else f"{resolution}-{batch_size}-cfg{cfg_mult}")
    if fullres:
        key += "-fullres"
    cache = {}
    if os.path.isfile(cache_path):
        try:
            with open(cache_path) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    if key in cache:
        d = cache[key]
        return d["per_step"], d["fixed"], d["source"]

    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops",
             str(resolution), str(batch_size),
             "--flops-cfg-mult", str(cfg_mult)]
            + (["--fullres"] if fullres else []),
            env=env, capture_output=True, text=True, timeout=900)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                cache[key] = d
                os.makedirs(os.path.dirname(cache_path), exist_ok=True)
                with open(cache_path, "w") as f:
                    json.dump(cache, f)
                return d["per_step"], d["fixed"], d["source"]
    except Exception:
        pass
    return None


def run_one_case(resolution, batch_size, steps, iters, chains, out_path,
                 distilled: bool = False, fullres: bool = False):
    """Measure one config and append its row to the CSV.

    ``distilled=True`` measures the step/guidance-distilled serving config
    (training/distill.py): no CFG batch-double, typically half the steps —
    the weights differ from the teacher but the program/latency does not
    depend on values, so the measurement uses the same staged weights.

    ``fullres=True`` measures the no-downsample 1024-token trunk
    (configs/research_run_512.yaml) — rows land as model=muse_tpu_fullres
    and the ``use_fused_residual_norm`` column records whether the Pallas
    attn-sublayer kernel was enabled (env MUSE_TPU_PALLAS_ATTN_SUBLAYER)."""
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()
    device = jax.devices()[0].device_kind
    cfg_mult = 1 if distilled else 2
    transformer, text_encoder, vae, seq_len = build(resolution, jnp.bfloat16,
                                                    fullres=fullres)
    ms, imgs, peak_gb = run_case(transformer, text_encoder, vae, seq_len,
                                 batch_size, steps, iters=iters, chains=chains,
                                 guidance_scale=0.0 if distilled else 8.0)
    parts = flops_via_cpu_subprocess(resolution, batch_size, cfg_mult,
                                     fullres=fullres)
    if parts is None:
        parts = component_flops(transformer, text_encoder, vae, seq_len,
                                batch_size, cfg_mult)
    per_step, fixed, source = parts
    total_flops = steps * per_step + fixed
    model_name = ("muse_tpu_distilled" if distilled
                  else "muse_tpu_fullres" if fullres else "muse_tpu")
    kernel_col = "xla-fused"
    if fullres:
        kernel_col = ("pallas-sublayer"
                      if os.environ.get("MUSE_TPU_PALLAS_ATTN_SUBLAYER",
                                        "1") != "0"
                      else "xla-only")
    row = {"model": model_name,
           "resolution": resolution,
           "batch_size": batch_size, "timesteps": steps,
           "use_xformers": "n/a", "use_fused_residual_norm": kernel_col,
           "device": device, "median_ms": round(ms, 1),
           "imgs_per_sec": round(imgs, 2), "peak_mem_gb": peak_gb,
           "tflops_per_call_est": round(total_flops / 1e12, 3),
           "mfu_est_pct": "", "flops_source": source}
    if device in PEAK_TFLOPS:
        row["mfu_est_pct"] = round(
            100 * (total_flops / 1e12) / (ms / 1e3) / PEAK_TFLOPS[device], 1)
    write_header = not os.path.isfile(out_path) or \
        os.path.getsize(out_path) == 0
    with open(out_path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
        if write_header:
            writer.writeheader()
        writer.writerow(row)
    print(row)
    return row


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "all.csv"))
    parser.add_argument("--resolutions", type=int, nargs="+", default=[256, 512])
    parser.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8])
    parser.add_argument("--timesteps", type=int, nargs="+", default=[12, 20])
    parser.add_argument("--iters", type=int, default=4,
                        help="dispatches per timing chain")
    parser.add_argument("--chains", type=int, default=5,
                        help="independent timing chains (median + stall discard)")
    parser.add_argument("--fresh", action="store_true",
                        help="overwrite the CSV instead of appending")
    parser.add_argument("--no-published", action="store_true",
                        help="skip merging the published baseline rows")
    parser.add_argument("--case", type=int, nargs=3, metavar=("RES", "BS", "STEPS"),
                        help="run exactly one case in-process and append")
    parser.add_argument("--flops", type=int, nargs=2, metavar=("RES", "BS"),
                        help="print per-component FLOPs as JSON and exit "
                             "(run with JAX_PLATFORM_NAME=cpu)")
    parser.add_argument("--flops-cfg-mult", type=int, default=2,
                        help="CFG batch multiplier for --flops (1 = distilled "
                             "no-CFG decode)")
    parser.add_argument("--distilled", action="store_true",
                        help="measure the distilled serving config: no CFG "
                             "batch-double, default timesteps [6]; rows land "
                             "as model=muse_tpu_distilled")
    parser.add_argument("--fullres", action="store_true",
                        help="measure the no-downsample 1024-token trunk "
                             "(configs/research_run_512.yaml); rows land as "
                             "model=muse_tpu_fullres and record whether the "
                             "Pallas attn-sublayer kernel was on")
    parser.add_argument("--case-timeout", type=int, default=2400,
                        help="per-case subprocess timeout, seconds")
    parser.add_argument("--retries", type=int, default=2)
    args = parser.parse_args(argv)

    if args.flops:
        import jax.numpy as jnp
        import json as _json

        transformer, text_encoder, vae, seq_len = build(args.flops[0],
                                                        jnp.bfloat16,
                                                        fullres=args.fullres)
        per_step, fixed, source = component_flops(
            transformer, text_encoder, vae, seq_len, args.flops[1],
            args.flops_cfg_mult)
        print(_json.dumps({"per_step": per_step, "fixed": fixed,
                           "source": source}))
        return 0

    if args.distilled and args.timesteps == [12, 20]:
        args.timesteps = [6]

    if args.case:
        # in-process single case (the unit the orchestrator spawns)
        return 0 if run_one_case(args.case[0], args.case[1], args.case[2],
                                 args.iters, args.chains, args.out,
                                 distilled=args.distilled,
                                 fullres=args.fullres) else 1

    # Orchestrator: one SUBPROCESS per case with timeout + retry.  The remote
    # compile service can wedge indefinitely (a hung XLA call is
    # uninterruptible in-process, STATUS.md round 1); a fresh process per
    # case bounds the damage and the persistent compile cache makes retries
    # cheap for whatever did finish compiling.
    import subprocess

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if args.fresh and os.path.isfile(args.out):
        os.remove(args.out)
    model_name = ("muse_tpu_distilled" if args.distilled
                  else "muse_tpu_fullres" if args.fullres else "muse_tpu")
    done = set()
    if os.path.isfile(args.out):
        with open(args.out) as f:
            done = {(r["model"], r["resolution"], r["batch_size"],
                     r["timesteps"])
                    for r in csv.DictReader(f)
                    if "published" not in r["device"]}
    for resolution in args.resolutions:
        for batch_size in args.batch_sizes:
            for steps in args.timesteps:
                if (model_name, str(resolution), str(batch_size),
                        str(steps)) in done:
                    print(f"case {resolution}/{batch_size}/{steps} already "
                          f"measured — skipping (use --fresh to redo)")
                    continue
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--case", str(resolution), str(batch_size), str(steps),
                       "--iters", str(args.iters), "--chains", str(args.chains),
                       "--out", args.out]
                if args.distilled:
                    cmd.append("--distilled")
                if args.fullres:
                    cmd.append("--fullres")
                for attempt in range(args.retries + 1):
                    try:
                        proc = subprocess.run(cmd, timeout=args.case_timeout,
                                              capture_output=True, text=True)
                        if proc.returncode == 0:
                            print(proc.stdout.strip().splitlines()[-1])
                            break
                        print(f"case {resolution}/{batch_size}/{steps} rc="
                              f"{proc.returncode}: {proc.stderr[-500:]}",
                              file=sys.stderr)
                    except subprocess.TimeoutExpired:
                        print(f"case {resolution}/{batch_size}/{steps} timed "
                              f"out after {args.case_timeout}s (compile "
                              f"service wedged?) attempt {attempt + 1}",
                              file=sys.stderr)

    measured, have_published = [], False
    if os.path.isfile(args.out):
        with open(args.out) as f:
            for r in csv.DictReader(f):
                if "published" in r["device"]:
                    have_published = True
                else:
                    measured.append(r)
    if not args.no_published and not have_published:
        with open(args.out, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
            for row in published_rows():
                writer.writerow(row)
    problems = validate_rows(measured)
    for p in problems:
        print(f"INCONSISTENT: {p}", file=sys.stderr)
    print(f"wrote {args.out}")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
