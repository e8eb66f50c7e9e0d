"""Offline metrics analysis (parity with the reference's tools/wandb.ipynb).

Reads one or more run directories' ``metrics.jsonl`` (written by
``cp2_tpu.utils.MetricLogger``), prints final/best values for the headline
metrics, and optionally renders loss/IoU curves for run comparison.

Usage:
  python tools/analyze_metrics.py RUN_DIR [RUN_DIR ...] [--plot out.png]
  python tools/analyze_metrics.py /tmp/logs/* --keys train/loss_step val_BinaryJaccardIndex
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

DEFAULT_KEYS = (
    "train/loss_step",
    "train/loss_ins_step",
    "train/loss_dense_step",
    "train/acc_ins_step",
    "val_BinaryJaccardIndex",
    "val_Dice",
    "test_BinaryJaccardIndex",
    "test_Dice",
)


def load_run(run_dir):
    path = os.path.join(run_dir, "metrics.jsonl")
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def series(rows, key):
    xs, ys = [], []
    for r in rows:
        if key in r and isinstance(r[key], (int, float)):
            xs.append(r.get("_step", len(xs)))
            ys.append(r[key])
    return xs, ys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("runs", nargs="+", help="run directories")
    parser.add_argument("--keys", nargs="+", default=list(DEFAULT_KEYS))
    parser.add_argument("--plot", default=None, help="save curves to this PNG")
    args = parser.parse_args(argv)

    table = defaultdict(dict)
    all_series = {}
    for run_dir in args.runs:
        name = os.path.basename(os.path.normpath(run_dir))
        rows = load_run(run_dir)
        if not rows:
            print(f"[warn] no metrics.jsonl in {run_dir}", file=sys.stderr)
            continue
        for key in args.keys:
            xs, ys = series(rows, key)
            if not ys:
                continue
            all_series[(name, key)] = (xs, ys)
            stat = "max" if ("Jaccard" in key or "Dice" in key or "acc" in key) else "min"
            best = max(ys) if stat == "max" else min(ys)
            table[name][key] = (ys[-1], best)

    for name, metrics in table.items():
        print(f"\n== {name} ==")
        for key, (last, best) in metrics.items():
            print(f"  {key:45s} last={last:10.4f} best={best:10.4f}")

    if args.plot and all_series:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = sorted({k for _, k in all_series})
        fig, axes = plt.subplots(len(keys), 1, figsize=(8, 3 * len(keys)),
                                 squeeze=False)
        for i, key in enumerate(keys):
            ax = axes[i][0]
            for (name, k), (xs, ys) in all_series.items():
                if k == key:
                    ax.plot(xs, ys, label=name)
            ax.set_title(key)
            ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"\nsaved curves to {args.plot}")


if __name__ == "__main__":
    main()
