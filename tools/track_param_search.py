"""Tracker hyper-parameter grid search.

Parity target: /root/reference/src/track_param_search.py (:1-122) — re-runs
the tracking experiment over a grid of tracker_cfg values and reports the
best MOTA/IDF1 combination.

Usage:
  python tools/track_param_search.py with dataset_name=MOT17-TRAIN-ALL \
      obj_detect_checkpoint_file=... output_dir=/tmp/search
"""
from __future__ import annotations

import itertools
import json
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

GRID = {
    "tracker_cfg.detection_obj_score_thresh": [0.3, 0.4, 0.5],
    "tracker_cfg.track_obj_score_thresh": [0.3, 0.4, 0.5],
    "tracker_cfg.detection_nms_thresh": [0.9],
    "tracker_cfg.track_nms_thresh": [0.9],
}


def main(argv=None):
    from trackformer_tpu.cli import track as track_cli

    base_argv = list(argv or sys.argv[1:])
    keys = sorted(GRID)
    best = None
    results = []
    for combo in itertools.product(*(GRID[k] for k in keys)):
        overrides = [f"{k}={v}" for k, v in zip(keys, combo)]
        print("RUN:", overrides)
        summary = track_cli.main(base_argv + overrides)
        if not summary or "OVERALL" not in summary:
            continue
        mota = summary["OVERALL"]["mota"]
        idf1 = summary["OVERALL"]["idf1"]
        results.append({"params": dict(zip(keys, combo)),
                        "mota": mota, "idf1": idf1})
        if best is None or mota > best["mota"]:
            best = results[-1]
        print(f"  -> MOTA {mota:.1%} IDF1 {idf1:.1%}")
    print(json.dumps({"best": best, "all": results}, indent=2))
    return best


if __name__ == "__main__":
    main()
