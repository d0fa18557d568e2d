"""Cross-validation epoch aggregation.

Parity target: /root/reference/src/compute_best_mean_epoch_from_splits.py
(:1-232, which reads visdom logs) — reads the per-split
`vis/epoch_metrics.jsonl` files written by our trainer, averages metrics
per epoch across splits and reports the best epoch per metric.

Usage:
  python tools/compute_best_mean_epoch_from_splits.py out/split1 out/split2
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np


def load_epoch_metrics(output_dir: Path):
    path = output_dir / "vis" / "epoch_metrics.jsonl"
    rows = [json.loads(line) for line in open(path)]
    return {r["epoch"]: r for r in rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--metrics", nargs="+",
                    default=["AP", "AP50", "MOTA", "IDF1"])
    args = ap.parse_args()

    splits = [load_epoch_metrics(Path(d)) for d in args.dirs]
    epochs = sorted(set.intersection(*(set(s) for s in splits)))
    means = defaultdict(dict)
    for e in epochs:
        for m in args.metrics:
            vals = [s[e][m] for s in splits if m in s[e]]
            if len(vals) == len(splits):
                means[m][e] = float(np.mean(vals))

    for m, per_epoch in means.items():
        if not per_epoch:
            continue
        best_epoch = max(per_epoch, key=per_epoch.get)
        print(f"{m}: best epoch {best_epoch} "
              f"(mean {per_epoch[best_epoch]:.4f}) over {len(splits)} splits")
    return means


if __name__ == "__main__":
    main()
