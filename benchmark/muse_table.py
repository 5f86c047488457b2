"""Render benchmark/artifacts/all.csv as markdown tables (reference
benchmark/muse_table.py renders its all.csv into tables; muse_chart.py does
plotly charts — we emit matplotlib PNG charts when available)."""

from __future__ import annotations

import argparse
import os
import sys

import pandas as pd

BASELINES_A100_MS = {
    # (resolution, batch_size, timesteps) -> best published A100 ms
    # (benchmark/artifacts/all.csv in the reference; see BASELINE.md)
    (256, 1, 12): 474.0,
    (512, 1, 12): 538.5,
    (256, 8, 12): 601.8,
    (512, 8, 12): 1004.5,
    (256, 1, 20): 762.0,
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "all.csv"))
    parser.add_argument("--chart", action="store_true")
    args = parser.parse_args(argv)

    df = pd.read_csv(args.csv)
    df["a100_baseline_ms"] = df.apply(
        lambda r: BASELINES_A100_MS.get((r.resolution, r.batch_size, r.timesteps)),
        axis=1)
    df["speedup_vs_a100"] = (df["a100_baseline_ms"] / df["median_ms"]).round(2)
    cols = ["model", "device", "resolution", "batch_size", "timesteps",
            "median_ms", "imgs_per_sec", "a100_baseline_ms", "speedup_vs_a100"]
    print(df[cols].to_markdown(index=False))

    if args.chart:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        for (res, steps), grp in df.groupby(["resolution", "timesteps"]):
            ax.plot(grp["batch_size"], grp["median_ms"], marker="o",
                    label=f"{res}px/{steps} steps")
        ax.set_xlabel("batch size")
        ax.set_ylabel("median ms")
        ax.legend()
        out = os.path.join(os.path.dirname(args.csv), "perf_chart.png")
        fig.savefig(out, dpi=120)
        print(f"chart: {out}")


if __name__ == "__main__":
    main()
