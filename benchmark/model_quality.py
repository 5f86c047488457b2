"""Quality-vs-CFG reference curves and plotting.

Reference parity: benchmark/model_quality.py — hard-coded FID / CLIP-score /
Inception-score curves measured on 10k COCO samples for muse-256 and muse-512
at a range of classifier-free-guidance scales (:18-88), plotted with
matplotlib.  The arrays below are the reference's published measurements
(they characterize the *checkpoints*, which our framework loads bit-exactly,
so the curves carry over); regenerate with scripts/calculate_fid.py.
"""

from __future__ import annotations

import json

# (cfg scale, value) — reference benchmark/model_quality.py:18-88
MUSE_512_FID = [(1.5, 47.19), (2, 44.29), (3, 42.43), (4, 41.58), (5, 41.06),
                (6, 40.81), (7, 40.77), (8, 40.51), (10, 40.00), (15, 39.18),
                (20, 38.57)]
MUSE_512_CLIP = [(1.5, 23.36), (2, 24.34), (3, 25.19), (4, 25.66), (5, 25.90),
                 (6, 26.06), (7, 26.13), (8, 26.16), (10, 26.25), (15, 26.40),
                 (20, 26.40)]
MUSE_512_ISC = [(1.5, 19.13), (2, 21.63), (3, 23.77), (4, 25.11), (5, 25.82),
                (6, 26.22), (7, 26.49), (8, 26.50), (10, 26.89), (15, 27.46),
                (20, 27.42)]
MUSE_256_FID = [(1.5, 43.38), (2, 41.02), (3, 39.89), (4, 39.30), (5, 39.31),
                (6, 39.58), (7, 39.66), (8, 39.82), (10, 40.23)]
MUSE_256_CLIP = [(1.5, 24.42), (2, 25.21), (3, 25.82), (4, 26.03), (5, 26.12),
                 (6, 26.17), (7, 26.21), (8, 26.23), (10, 26.27)]
MUSE_256_ISC = [(1.5, 20.79), (2, 22.52), (3, 23.68), (4, 24.14), (5, 24.06),
                (6, 23.93), (7, 23.81), (8, 23.72), (10, 23.25)]

CURVES = {
    "muse-512": {"fid": MUSE_512_FID, "clip": MUSE_512_CLIP, "isc": MUSE_512_ISC},
    "muse-256": {"fid": MUSE_256_FID, "clip": MUSE_256_CLIP, "isc": MUSE_256_ISC},
}


def best(metric: str, model: str):
    curve = CURVES[model][metric]
    pick = min if metric == "fid" else max
    return pick(curve, key=lambda cv: cv[1])


def plot(out_path: str = "benchmark/artifacts/model_quality.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for metric, ax in zip(["fid", "clip", "isc"], axes):
        for model, curves in CURVES.items():
            xs, ys = zip(*curves[metric])
            ax.plot(xs, ys, marker="o", label=model)
        ax.set_xlabel("cfg scale")
        ax.set_ylabel(metric.upper())
        ax.legend()
    fig.tight_layout()
    import os

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.savefig(out_path, dpi=120)
    return out_path


def load_measured(path: str = "benchmark/artifacts/quality_ours.csv"):
    """THIS framework's measured quality rows (written by
    benchmark/measure_quality.py); [] when the artifact doesn't exist."""
    import csv
    import os

    if not os.path.isfile(path):
        return []
    with open(path) as f:
        return list(csv.DictReader(f))


if __name__ == "__main__":
    for model in CURVES:
        summary = {m: best(m, model) for m in ("fid", "clip", "isc")}
        print(model, json.dumps(summary), "(reference published curves)")
    measured = load_measured()
    if measured:
        print("-- measured by THIS framework (benchmark/measure_quality.py):")
        for row in measured:
            print(f"  {row['protocol']} {row['metric']}={row['value']} "
                  f"[{row['extractor']}]")
    else:
        print("no measured artifact yet — run benchmark/measure_quality.py")
    try:
        print("plot:", plot())
    except ImportError:
        print("matplotlib unavailable; skipped plot")
