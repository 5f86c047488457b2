"""Render benchmark/artifacts/all.csv into perf_chart.png.

Reference parity: benchmark/muse_chart.py draws plotly latency charts from
all.csv (:1-123, artifacts embedded in benchmark/README.md:4-13).  plotly is
unavailable here, so this is a matplotlib renderer: panel 1 compares OUR
measured latency against the published A100/4090 rows per config (grouped
bars, lower = better); panel 2 shows our estimated model-FLOPs utilization.

Colors are the dataviz reference palette's first categorical slots in fixed
order (validated set; color follows the DEVICE entity).
"""

from __future__ import annotations

import argparse
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# validated categorical palette, fixed slot order (dataviz reference instance)
SERIES_COLORS = {
    "ours": "#2a78d6",       # slot 1 blue
    "A100 (published)": "#eb6834",   # slot 2 orange
    "RTX 4090 (published)": "#1baf7a",  # slot 3 aqua
}
TEXT_PRIMARY, TEXT_SECONDARY, SURFACE = "#0b0b0b", "#52514e", "#fcfcfb"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "all.csv"))
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    df = pd.read_csv(args.csv)
    muse = df[df["model"].isin(["muse", "muse_tpu"])].copy()
    muse["config"] = (muse["resolution"].astype(int).astype(str) + "px/bs"
                      + muse["batch_size"].astype(int).astype(str))
    # 12-step rows: the headline decode budget for every device
    m12 = muse[muse["timesteps"] == 12]
    configs = sorted(m12["config"].unique(),
                     key=lambda c: (int(c.split("px")[0]), int(c.split("bs")[1])))

    ours_dev = [d for d in m12["device"].unique() if "published" not in d]
    groups = [("ours", ours_dev[0] if ours_dev else None),
              ("A100 (published)", "A100 (published)"),
              ("RTX 4090 (published)", "RTX 4090 (published)")]
    groups = [(label, dev) for label, dev in groups
              if dev is not None and (m12["device"] == dev).any()]

    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(11, 4.4), facecolor=SURFACE,
        gridspec_kw={"width_ratios": [3, 2]})
    for ax in (ax1, ax2):
        ax.set_facecolor(SURFACE)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(TEXT_SECONDARY)
        ax.tick_params(colors=TEXT_SECONDARY, labelcolor=TEXT_PRIMARY)
        ax.grid(axis="y", color=TEXT_SECONDARY, alpha=0.15, linewidth=0.8,
                zorder=0)

    x = np.arange(len(configs))
    width = 0.8 / max(len(groups), 1)
    for gi, (label, dev) in enumerate(groups):
        rows = m12[m12["device"] == dev].set_index("config")
        vals = [float(rows.loc[c, "median_ms"]) if c in rows.index else np.nan
                for c in configs]
        display = ("TPU v5e (ours)" if label == "ours" else label)
        bars = ax1.bar(x + (gi - (len(groups) - 1) / 2) * width, vals,
                       width * 0.92, label=display,
                       color=SERIES_COLORS[label], zorder=3)
        for b, v in zip(bars, vals):
            if np.isfinite(v):
                ax1.annotate(f"{v:.0f}", (b.get_x() + b.get_width() / 2, v),
                             textcoords="offset points", xytext=(0, 2),
                             ha="center", fontsize=7.5, color=TEXT_SECONDARY)
    ax1.set_xticks(x, configs)
    ax1.set_ylabel("median latency, ms (12-step decode — lower is better)",
                   color=TEXT_PRIMARY, fontsize=9)
    ax1.set_title("MUSE text→image latency: ours vs published",
                  color=TEXT_PRIMARY, fontsize=11)
    ax1.legend(frameon=False, fontsize=8, labelcolor=TEXT_PRIMARY)

    # panel 2: single series (ours) — no legend needed, title names it
    mine = muse[(~muse["device"].str.contains("published"))
                & muse["mfu_est_pct"].notna()].copy()
    if len(mine):
        mine["cfg_steps"] = mine["config"] + "/" + \
            mine["timesteps"].astype(int).astype(str) + "st"
        mine = mine.sort_values(["resolution", "batch_size", "timesteps"])
        x2 = np.arange(len(mine))
        bars = ax2.bar(x2, mine["mfu_est_pct"].astype(float), 0.62,
                       color=SERIES_COLORS["ours"], zorder=3)
        for b, v in zip(bars, mine["mfu_est_pct"].astype(float)):
            ax2.annotate(f"{v:.0f}", (b.get_x() + b.get_width() / 2, v),
                         textcoords="offset points", xytext=(0, 2),
                         ha="center", fontsize=7.5, color=TEXT_SECONDARY)
        ax2.set_xticks(x2, mine["cfg_steps"], rotation=45, ha="right",
                       fontsize=7.5)
        ax2.set_ylim(0, 100)
        ax2.set_ylabel("est. model-FLOPs utilization, %", color=TEXT_PRIMARY,
                       fontsize=9)
        ax2.set_title("Ours: est. MFU per config (TPU v5e)",
                      color=TEXT_PRIMARY, fontsize=11)

    fig.tight_layout()
    out = args.out or os.path.join(os.path.dirname(args.csv), "perf_chart.png")
    fig.savefig(out, dpi=130, facecolor=SURFACE)
    plt.close(fig)
    print(f"chart: {out}")
    return out


if __name__ == "__main__":
    main()
