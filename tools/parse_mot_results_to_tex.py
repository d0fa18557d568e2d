"""MOT metric summaries -> LaTeX table rows.

Parity target: /root/reference/src/parse_mot_results_to_tex.py (:1-128).
Reads result directories (MOTChallenge txt files), evaluates against GT and
emits one LaTeX row per run.

Usage:
  python tools/parse_mot_results_to_tex.py results_dir1 results_dir2 \
      --dataset MOT17-TRAIN-ALL --data-root data
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    from trackformer_tpu.datasets.tracking import TrackDatasetFactory
    from trackformer_tpu.utils.mot_metrics import summarize
    from trackformer_tpu.utils.track_utils import get_mot_accum

    ap = argparse.ArgumentParser()
    ap.add_argument("results_dirs", nargs="+")
    ap.add_argument("--dataset", default="MOT17-TRAIN-ALL")
    ap.add_argument("--data-root", default="data")
    args = ap.parse_args()

    print(r"run & MOTA & IDF1 & MT & ML & FP & FN & IDSW \\")
    print(r"\midrule")
    for rdir in args.results_dirs:
        dataset = TrackDatasetFactory(args.dataset,
                                      root_dir=args.data_root,
                                      img_transform=None)
        accums = []
        for seq in dataset:
            results = seq.load_results(rdir)
            if seq.no_gt or not results:
                continue
            accums.append(get_mot_accum(results, seq))
        if not accums:
            print(f"% {rdir}: no evaluable sequences")
            continue
        m = summarize(accums)["OVERALL"]
        print(f"{osp.basename(rdir)} & {m['mota'] * 100:.1f} & "
              f"{m['idf1'] * 100:.1f} & {m['mostly_tracked']} & "
              f"{m['mostly_lost']} & {m['num_false_positives']} & "
              f"{m['num_misses']} & {m['num_switches']} \\\\")


if __name__ == "__main__":
    main()
