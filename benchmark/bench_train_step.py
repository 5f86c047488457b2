"""Training-step throughput benchmark: the fused GSPMD train step at the
research-run architecture on one chip.

The reference never published a training benchmark (training was validated
operationally on SLURM + wandb, SURVEY §4); this gives the TPU framework a
measured number: steps/s, imgs/s, tokens/s and est-MFU for the
MaskGiTUViT_v2 research config (hidden 1024 / 22 layers / vocab 8256) with
bf16 compute, fp32 params/optimizer, fused mask->fwd->bwd->clip->adamw->EMA
step (training/trainer.py make_uvit_train_step, donated state).

FLOPs come from XLA cost analysis of the lowered step on the CPU backend
(backend-independent; the remote TPU backend exposes no cost analysis) —
run in a subprocess exactly like benchmark/muse_perf.py.

Usage:
  python benchmark/bench_train_step.py [--batch-sizes 64 256] [--steps 8]
  python benchmark/bench_train_step.py --flops 64   # internal (CPU backend)
  python benchmark/bench_train_step.py --sweep      # bs x remat curve ->
                                                    # artifacts/train_throughput.csv
Prints one JSON line per batch size.

The --sweep mode (round-3 verdict item 3: a curve, not a point) runs each
(batch, remat) case in its own subprocess with a timeout — the remote AOT
compile helper reproducibly crashes on some large programs (bs128+, and
historically the bs64 dots-policy); a crash or hang is recorded as an error
row and the sweep continues.  Existing CSV rows are skipped, so an
interrupted sweep resumes.  MFU is reported two ways: ``mfu_exec_pct`` from
the FLOPs of the program as executed (recompute included — hardware
utilization) and ``mfu_model_pct`` from the no-remat FLOPs of the same batch
(useful work — the number comparable across remat policies).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = {"TPU v5 lite": 197.0}
SEQ = 256
TEXT_LEN = 77
TEXT_DIM = 768


def build_step_and_state(batch_size: int, remat: bool = False,
                         accum: int = 1, optimizer: str = "adamw"):
    """``accum > 1`` wraps the optimizer in ``optax.MultiSteps``: the jitted
    program is the MICRO-batch (batch_size // accum) fwd+bwd plus an
    accumulator update, and every ``accum``-th call applies adamw.  This is
    the round-5 workaround for the remote AOT compile helper crashing on the
    monolithic bs64/bs128 programs (HTTP 500 since round 2): the compiled
    module stays at a size the helper accepts while the measured effective
    batch matches the monolithic case."""
    import jax
    import jax.numpy as jnp
    import optax

    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2
    from open_muse_tpu.ops.sampling import get_mask_schedule
    from open_muse_tpu.training.trainer import (create_train_state,
                                                make_uvit_train_step)

    if batch_size % accum:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"accum {accum}")
    batch_size //= accum
    model = MaskGiTUViT_v2(dtype=jnp.bfloat16, remat=remat)
    cfg = model.config
    if optimizer == "adamw8bit":
        # blockwise int8 moments (training/quant8.py, the bitsandbytes
        # AdamW8bit analog the reference dispatches in train_muse.py:413-420):
        # drops the optimizer-state HBM traffic from ~9.6 GB to ~2.4 GB per
        # step at 603.5M params, paying searchsorted/gather VPU work to
        # (de)quantize inside the fused step.  Measured head-to-head against
        # the fp32-moment row to settle whether the train step is
        # bandwidth-bound enough for the trade to win.
        from open_muse_tpu.training.quant8 import adamw8bit

        tx = adamw8bit(1e-4, b1=0.9, b2=0.999, weight_decay=0.01)
    else:
        tx = optax.adamw(1e-4, b1=0.9, b2=0.999, weight_decay=0.01)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    state = create_train_state(model.params, tx, with_ema=True)
    step_fn = make_uvit_train_step(
        model.module, tx, get_mask_schedule("cosine"), cfg.mask_token_id,
        codebook_size=cfg.codebook_size, cond_dropout_prob=0.1,
        max_grad_norm=1.0)

    rs = np.random.RandomState(0)
    batch = {
        "image_tokens": jnp.asarray(
            rs.randint(0, cfg.codebook_size, (batch_size, SEQ)), jnp.int32),
        "encoder_hidden_states": jnp.asarray(
            rs.randn(batch_size, TEXT_LEN, TEXT_DIM), jnp.float32),
        "cond_embeds": jnp.asarray(
            rs.randn(batch_size, cfg.cond_embed_dim), jnp.float32),
        "micro_conds": jnp.asarray(
            np.tile([256, 256, 0, 0, 6.0], (batch_size, 1)), jnp.float32),
        "empty_embeds": jnp.zeros((1, TEXT_LEN, TEXT_DIM), jnp.float32),
        "empty_cond_embeds": jnp.zeros((1, cfg.cond_embed_dim), jnp.float32),
    }
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(model.params))
    return step_fn, state, batch, n_params


def _remat_value(flag):
    return {"full": True, "dots": "dots"}.get(flag, False)


def flops_via_cpu_subprocess(batch_size: int, remat=None, optimizer="adamw"):
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "artifacts", ".flops_cache.json")
    key = (f"train-{batch_size}" + (f"-remat-{remat}" if remat else "")
           + (f"-opt-{optimizer}" if optimizer != "adamw" else ""))
    cache = {}
    if os.path.isfile(cache_path):
        try:
            with open(cache_path) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    if key in cache:
        return cache[key]["per_step"], cache[key]["source"]
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops",
             str(batch_size)] + (["--remat", remat] if remat else [])
            + (["--optimizer", optimizer] if optimizer != "adamw" else []),
            env=env, capture_output=True, text=True, timeout=1800)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                cache[key] = d
                os.makedirs(os.path.dirname(cache_path), exist_ok=True)
                with open(cache_path, "w") as f:
                    json.dump(cache, f)
                return d["per_step"], d["source"]
    except Exception:
        pass
    return None, None


def measure(batch_size: int, steps: int, remat: bool = False,
            accum: int = 1, optimizer: str = "adamw"):
    import jax
    import jax.numpy as jnp

    step_fn, state, batch, n_params = build_step_and_state(batch_size, remat,
                                                           accum, optimizer)
    key = jax.random.PRNGKey(0)
    # warmup: compile + one settled optimizer update (accum micro-calls)
    for i in range(2 * accum):
        state, m = step_fn(state, batch, jax.random.fold_in(key, i))
    float(m["loss"])
    # timing: the donated-state chain is naturally dependent; one "step"
    # = one optimizer update = ``accum`` micro-calls
    t0 = time.perf_counter()
    for i in range(steps * accum):
        state, m = step_fn(state, batch, jax.random.fold_in(key, 99 + i))
    float(m["loss"])  # force
    dt = (time.perf_counter() - t0) / steps
    return dt, n_params


SWEEP_CASES = [  # (batch_size, remat, accum, optimizer) — cheap-to-expensive
    (16, "off", 1, "adamw"), (16, "dots", 1, "adamw"), (16, "full", 1, "adamw"),
    (32, "off", 1, "adamw"), (32, "dots", 1, "adamw"), (32, "full", 1, "adamw"),
    (64, "off", 1, "adamw"), (64, "dots", 1, "adamw"), (64, "full", 1, "adamw"),
    (128, "full", 1, "adamw"),
    # grad-accumulation workaround rows for the compile-helper-blocked
    # monolithic programs (round-5 verdict item 2): micro-program = bs32/bs64
    (64, "off", 2, "adamw"), (128, "off", 4, "adamw"),
    (128, "full", 2, "adamw"),
    # int8-moment optimizer head-to-head vs the fp32-moment bs32 row
    # (round-5: measure the adamw+EMA HBM floor trade)
    (32, "off", 1, "adamw8bit"),
]
SWEEP_FIELDS = ["batch_size", "remat", "accum", "optimizer", "device",
                "step_ms", "imgs_per_sec", "tokens_per_sec", "params_m",
                "tflops_exec_est", "tflops_model_est", "mfu_exec_pct",
                "mfu_model_pct", "flops_source", "error"]


def run_sweep(csv_path: str, steps: int, timeout_s: int) -> int:
    """Each case in a fresh subprocess (crash/hang isolation), resumable."""
    import csv

    existing = {}
    if os.path.isfile(csv_path):
        with open(csv_path, newline="") as f:
            for r in csv.DictReader(f):
                # pre-optimizer-column rows were all fp32-moment adamw
                r["optimizer"] = r.get("optimizer") or "adamw"
                r["accum"] = r.get("accum") or "1"
                existing[(r["batch_size"], r["remat"], r["accum"],
                          r["optimizer"])] = r

    def append(row):
        existing[(str(row["batch_size"]), row["remat"],
                  str(row.get("accum") or 1),
                  row.get("optimizer") or "adamw")] = row
        os.makedirs(os.path.dirname(csv_path), exist_ok=True)
        tmp = csv_path + ".tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=SWEEP_FIELDS,
                               extrasaction="ignore")
            w.writeheader()
            for r in sorted(existing.values(),
                            key=lambda r: (int(r["batch_size"]), r["remat"],
                                           int(r.get("accum") or 1),
                                           r.get("optimizer") or "adamw")):
                w.writerow(r)
        os.replace(tmp, csv_path)

    for bs, remat, accum, opt in SWEEP_CASES:
        if (str(bs), remat, str(accum), opt) in existing:
            print(f"# skip bs={bs} remat={remat} accum={accum} opt={opt} "
                  "(already measured)")
            continue
        cmd = [sys.executable, os.path.abspath(__file__),
               "--batch-sizes", str(bs), "--steps", str(steps)]
        if remat != "off":
            cmd += ["--remat", remat]
        if accum > 1:
            cmd += ["--accum", str(accum)]
        if opt != "adamw":
            cmd += ["--optimizer", opt]
        print(f"# running bs={bs} remat={remat} accum={accum} opt={opt} ...",
              flush=True)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=timeout_s)
            row = None
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    row = json.loads(line)
            if row is None:
                row = {"batch_size": bs, "remat": remat, "accum": accum,
                       "optimizer": opt,
                       "error": f"no output (rc={proc.returncode}): "
                                f"{proc.stderr[-200:]}"}
        except subprocess.TimeoutExpired:
            row = {"batch_size": bs, "remat": remat, "accum": accum,
                   "optimizer": opt,
                   "error": f"timeout after {timeout_s}s (compile wedged?)"}
        row.setdefault("remat", remat)
        row.setdefault("accum", accum)
        row.setdefault("optimizer", opt)
        row.setdefault("error", "")
        append(row)
        print(json.dumps(row), flush=True)
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-sizes", type=int, nargs="+", default=[64, 256])
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--sweep", action="store_true",
                        help="run the (batch x remat) curve into "
                             "artifacts/train_throughput.csv")
    parser.add_argument("--sweep-csv", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        "train_throughput.csv"))
    parser.add_argument("--case-timeout", type=int, default=2700)
    parser.add_argument("--remat", nargs="?", const="full",
                        choices=["full", "dots"], default=None,
                        help="gradient checkpointing: 'full' recomputes the "
                             "whole layer, 'dots' saves matmul outputs and "
                             "recomputes only elementwise (production "
                             "configs use one of these; remat also shrinks "
                             "the compile, which the remote AOT helper needs "
                             "at research scale)")
    parser.add_argument("--accum", type=int, default=1,
                        help="gradient accumulation (optax.MultiSteps): the "
                             "jitted program is the micro-batch "
                             "(batch/accum) step; batch sizes whose "
                             "monolithic program crashes the remote AOT "
                             "compile helper measure through accum micro-"
                             "calls per optimizer update")
    parser.add_argument("--optimizer", choices=["adamw", "adamw8bit"],
                        default="adamw",
                        help="adamw8bit = blockwise int8 Adam moments "
                             "(training/quant8.py): ~4x less optimizer-state "
                             "HBM traffic per step, paying (de)quantize VPU "
                             "work inside the fused program")
    parser.add_argument("--flops", type=int, metavar="BS",
                        help="print train-step FLOPs as JSON (CPU backend)")
    args = parser.parse_args(argv)

    if args.sweep:
        return run_sweep(args.sweep_csv, args.steps, args.case_timeout)

    if args.flops:
        import jax

        step_fn, state, batch, _ = build_step_and_state(
            args.flops, _remat_value(args.remat), optimizer=args.optimizer)
        key = jax.random.PRNGKey(0)
        lowered = step_fn.lower(state, batch, key)
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        print(json.dumps({"per_step": flops, "source": "xla-cost-analysis"}))
        return 0

    import jax

    from bench import _enable_compile_cache

    _enable_compile_cache()
    device = jax.devices()[0].device_kind
    for bs in args.batch_sizes:
        try:
            dt, n_params = measure(bs, args.steps, _remat_value(args.remat),
                                   args.accum, args.optimizer)
        except Exception as e:
            print(json.dumps({"metric": "train_step", "batch_size": bs,
                              "accum": args.accum,
                              "optimizer": args.optimizer,
                              "error": str(e)[:300]}))
            continue
        # FLOPs of the program(s) actually executed: accum micro-programs
        # per optimizer update (the MultiSteps accumulator adds are not in
        # the CPU-lowered micro module; they are O(params), negligible
        # against the fwd+bwd)
        micro = bs // args.accum
        flops_exec, source = flops_via_cpu_subprocess(micro, args.remat,
                                                      args.optimizer)
        # model FLOPs (useful work) always come from the fp32-moment adamw
        # program: the quantize/dequantize element ops are overhead of the
        # representation, not model compute
        flops_model = (flops_via_cpu_subprocess(micro, None, "adamw")[0]
                       if (args.remat or args.optimizer != "adamw")
                       else flops_exec)
        if flops_exec:
            flops_exec *= args.accum
        if flops_model:
            flops_model *= args.accum
        row = {"metric": "train_step", "batch_size": bs,
               "remat": args.remat or "off", "accum": args.accum,
               "optimizer": args.optimizer,
               "device": device, "step_ms": round(dt * 1e3, 1),
               "imgs_per_sec": round(bs / dt, 1),
               "tokens_per_sec": round(bs * SEQ / dt),
               "params_m": round(n_params / 1e6, 1)}
        peak = PEAK_TFLOPS.get(device)
        if flops_exec:
            row["tflops_exec_est"] = round(flops_exec / 1e12, 2)
            if peak:
                row["mfu_exec_pct"] = round(
                    100 * flops_exec / 1e12 / dt / peak, 1)
            row["flops_source"] = source
        if flops_model:
            row["tflops_model_est"] = round(flops_model / 1e12, 2)
            if peak:
                row["mfu_model_pct"] = round(
                    100 * flops_model / 1e12 / dt / peak, 1)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
