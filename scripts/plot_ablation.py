#!/usr/bin/env python
"""Ablation figure renderer — the data-driven equivalent of the
reference's one-off figure scripts (maxingan2412/Signal
`zablation/tiaoxing.py` grouped-bar hyperparameter sweep,
`zablation/zhexian.py` metric-vs-knob line chart). Those scripts
hardcode their numbers; this one reads them from a sweep JSON or
scrapes them from `scripts/run_ablation.sh` output logs, so a re-run
regenerates the figures.

Usage:
  # grouped bars / lines from a sweep JSON
  #   {"x": [0.1, 0.2], "xlabel": "keep ratio",
  #    "series": {"mAP": [75.2, 79.0], "R-1": [78.5, 82.8]}}
  python scripts/plot_ablation.py bars  --json sweep.json -o fig.png
  python scripts/plot_ablation.py lines --json sweep.json -o fig.png
  # bar chart of Best mAP / Rank-1 scraped from ablation run logs
  python scripts/plot_ablation.py from-logs logs/ablation_*/ -o fig.png
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from typing import Dict, List, Sequence

# Okabe–Ito CVD-safe categorical order, assigned fixed (never cycled).
PALETTE = ["#0072B2", "#E69F00", "#009E73", "#CC79A7",
           "#56B4E9", "#D55E00", "#F0E442"]
_MARKERS = ["o", "s", "^", "D", "v", "P", "X"]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _style_axes(ax):
    # recessive grid/axes: dashed light y-grid under the marks
    ax.grid(axis="y", linestyle="--", linewidth=0.6, color="#cccccc",
            alpha=0.8, zorder=0)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)


def plot_bars(x: Sequence, series: Dict[str, List[float]], save_path: str,
              xlabel: str = "", ylabel: str = "%", annotate: bool = True,
              title: str = "") -> str:
    """Grouped bar chart (`tiaoxing.py` form): one bar group per swept
    value, one color per metric series. Small sweeps get direct value
    labels; identity always carried by the legend, not color alone."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=200)
    _style_axes(ax)
    n = len(series)
    width = min(0.8 / max(n, 1), 0.22)
    import numpy as np

    idx = np.arange(len(x))
    for i, (name, ys) in enumerate(series.items()):
        pos = idx + (i - (n - 1) / 2) * width
        bars = ax.bar(pos, ys, width=width * 0.92, color=PALETTE[i % len(PALETTE)],
                      label=name, zorder=2, edgecolor="white", linewidth=0.8)
        if annotate and len(x) * n <= 24:
            for b in bars:
                if not np.isfinite(b.get_height()):
                    continue  # scraped run missing this metric
                ax.annotate(f"{b.get_height():.1f}",
                            xy=(b.get_x() + b.get_width() / 2, b.get_height()),
                            xytext=(0, 2), textcoords="offset points",
                            ha="center", va="bottom", fontsize=8,
                            color="#444444")
    ax.set_xticks(idx)
    ax.set_xticklabels([str(v) for v in x])
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title)
    # NaN marks a scraped run missing a metric — it must not poison ylim
    finite = [v for ys in series.values() for v in ys if np.isfinite(v)]
    lo, hi = (min(finite), max(finite)) if finite else (0.0, 1.0)
    pad = max(1.0, 0.1 * (hi - lo))
    ax.set_ylim(max(0.0, lo - pad), hi + 2 * pad)
    if len(series) >= 2:
        ax.legend(frameon=False, ncol=min(n, 4), loc="upper left")
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)
    return save_path


def plot_lines(x: Sequence, series: Dict[str, List[float]], save_path: str,
               xlabel: str = "", ylabel: str = "%", title: str = "") -> str:
    """Metric-vs-knob line chart (`zhexian.py` form). Equidistant x
    positions labeled with the swept values (the reference does the
    same so log-spaced sweeps read evenly); only each series' best
    point gets a direct label."""
    plt = _plt()
    import numpy as np

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=200)
    _style_axes(ax)
    idx = np.arange(len(x))
    for i, (name, ys) in enumerate(series.items()):
        c = PALETTE[i % len(PALETTE)]
        ax.plot(idx, ys, color=c, marker=_MARKERS[i % len(_MARKERS)],
                linewidth=2, markersize=6, markeredgewidth=1.2,
                markeredgecolor="white", label=name, zorder=2)
        j = int(np.argmax(ys))
        ax.annotate(f"{ys[j]:.1f}", xy=(idx[j], ys[j]), xytext=(0, 6),
                    textcoords="offset points", ha="center", fontsize=8,
                    color="#444444")
    ax.set_xticks(idx)
    ax.set_xticklabels([str(v) for v in x])
    ax.set_xlim(-0.4, len(x) - 0.6)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title)
    if len(series) >= 2:
        ax.legend(frameon=False, ncol=min(len(series), 4))
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)
    return save_path


_BEST_RE = re.compile(r"Best (mAP|Rank-1|Rank-5|Rank-10): ([0-9.]+)%")


def scrape_logs(paths: Sequence[str]) -> Dict[str, Dict[str, float]]:
    """{run name: {metric: value}} from `Best mAP: 78.8%`-style lines
    (the LAST occurrence wins — it reflects the finished run). Accepts
    log files or directories (searched for *.log and */train_log.txt)."""
    files: List[str] = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(glob.glob(os.path.join(p, "*.log")))
            files += sorted(glob.glob(os.path.join(p, "*", "train_log.txt")))
        else:
            files.append(p)
    out: Dict[str, Dict[str, float]] = {}
    for f in files:
        name = os.path.basename(os.path.dirname(f)) if os.path.basename(
            f) == "train_log.txt" else os.path.splitext(os.path.basename(f))[0]
        metrics: Dict[str, float] = {}
        with open(f, errors="replace") as fh:
            for line in fh:
                m = _BEST_RE.search(line)
                if m:
                    metrics[m.group(1)] = float(m.group(2))
        if metrics:
            # two runs can share a basename (sweepA/sign1, sweepB/sign1):
            # prefix parent directories until the key is unique rather
            # than silently overwriting the earlier run
            parent = os.path.dirname(
                os.path.dirname(f) if os.path.basename(f) == "train_log.txt"
                else f)
            while name in out:
                parent, seg = os.path.split(parent)
                if not seg:
                    name = "_" + name
                else:
                    name = f"{seg}/{name}"
            out[name] = metrics
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for c in ("bars", "lines"):
        p = sub.add_parser(c)
        p.add_argument("--json", required=True,
                       help="sweep JSON: {x, xlabel?, ylabel?, series}")
        p.add_argument("-o", "--out", required=True)
        p.add_argument("--title", default="")
    p = sub.add_parser("from-logs")
    p.add_argument("paths", nargs="+")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--metrics", default="mAP,Rank-1")
    args = ap.parse_args(argv)

    if args.cmd in ("bars", "lines"):
        with open(args.json) as fh:
            d = json.load(fh)
        fn = plot_bars if args.cmd == "bars" else plot_lines
        path = fn(d["x"], d["series"], args.out,
                  xlabel=d.get("xlabel", ""), ylabel=d.get("ylabel", "%"),
                  title=args.title)
    else:
        runs = scrape_logs(args.paths)
        if not runs:
            sys.exit("no 'Best <metric>' lines found in the given logs")
        metrics = args.metrics.split(",")
        series = {m: [runs[r].get(m, float("nan")) for r in runs]
                  for m in metrics}
        path = plot_bars(list(runs), series, args.out, xlabel="run",
                         ylabel="%")
    print(path)


if __name__ == "__main__":
    main()
