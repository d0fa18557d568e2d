"""Training visualization: JSONL metric streams + matplotlib plots + example
detection images.

Parity target: /root/reference/src/trackformer/vis.py — iter/epoch metric
windows and example-result windows with track-query color coding (:101-374).
Visdom (a network service) is replaced with files under `output_dir/vis/`:
`iter_metrics.jsonl`, `epoch_metrics.jsonl`, PNG plots, and rendered example
frames — TPU-pod friendly (rank-0 writes, no server).
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, Optional

import numpy as np


class FileVis:
    def __init__(self, output_dir: str):
        self.dir = osp.join(output_dir, "vis")
        os.makedirs(self.dir, exist_ok=True)
        self._iter = open(osp.join(self.dir, "iter_metrics.jsonl"), "a")
        self._epoch = open(osp.join(self.dir, "epoch_metrics.jsonl"), "a")
        self._step = 0
        # window handle for utils/plot_utils.get_vis_win_names parity
        # (reference vis.py LineVis.win); here: the vis directory
        self.win = self.dir

    def log_iter(self, metrics: Dict[str, float]):
        self._step += 1
        rec = {"step": self._step}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._iter.write(json.dumps(rec) + "\n")
        self._iter.flush()

    def log_epoch(self, epoch: int, metrics: Dict[str, float]):
        rec = {"epoch": epoch}
        # ndarray has .item too — require 0-d, else float() throws
        rec.update({k: float(v) for k, v in metrics.items()
                    if np.isscalar(v)
                    or (hasattr(v, "item") and np.ndim(v) == 0)})
        self._epoch.write(json.dumps(rec) + "\n")
        self._epoch.flush()
        self.plot_curves()

    def plot_curves(self):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        path = osp.join(self.dir, "epoch_metrics.jsonl")
        if not osp.exists(path):
            return
        rows = [json.loads(line) for line in open(path)]
        if not rows:
            return
        keys = sorted({k for r in rows for k in r if k != "epoch"})
        n = len(keys)
        if not n:
            return
        cols = min(4, n)
        fig, axes = plt.subplots((n + cols - 1) // cols, cols,
                                 figsize=(4 * cols,
                                          3 * ((n + cols - 1) // cols)),
                                 squeeze=False)
        for i, k in enumerate(keys):
            ax = axes[i // cols][i % cols]
            xs = [r["epoch"] for r in rows if k in r]
            ys = [r[k] for r in rows if k in r]
            ax.plot(xs, ys)
            ax.set_title(k, fontsize=9)
        fig.tight_layout()
        fig.savefig(osp.join(self.dir, "epoch_metrics.png"))
        plt.close(fig)

    def vis_results(self, image: np.ndarray, pred_boxes, pred_scores,
                    gt_boxes, tq_mask=None, tq_fal_pos=None,
                    name: str = "example"):
        """Render one example: GT green, detections blue, track queries
        orange, false-positive track queries red (reference vis.py:101-243).
        Boxes are xyxy absolute on the given image."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        h, w = image.shape[:2]
        fig, ax = plt.subplots(figsize=(w / 96, h / 96), dpi=96)
        ax.imshow(np.clip(image, 0, 1))
        ax.axis("off")
        for b in np.asarray(gt_boxes).reshape(-1, 4):
            ax.add_patch(plt.Rectangle((b[0], b[1]), b[2] - b[0],
                                       b[3] - b[1], fill=False,
                                       color="lime", lw=2))
        pred_boxes = np.asarray(pred_boxes).reshape(-1, 4)
        for i, b in enumerate(pred_boxes):
            color = "deepskyblue"
            if tq_mask is not None and i < len(tq_mask) and tq_mask[i]:
                color = "red" if (tq_fal_pos is not None
                                  and tq_fal_pos[i]) else "orange"
            ax.add_patch(plt.Rectangle((b[0], b[1]), b[2] - b[0],
                                       b[3] - b[1], fill=False,
                                       color=color, lw=1))
            if pred_scores is not None and i < len(pred_scores):
                ax.text(b[0], b[1] - 2, f"{pred_scores[i]:.2f}",
                        color=color, fontsize=6)
        fig.savefig(osp.join(self.dir, f"{name}.jpg"),
                    bbox_inches="tight", pad_inches=0)
        plt.close(fig)


def build_visualizers(args) -> Optional[FileVis]:
    if getattr(args, "no_vis", False) or not getattr(args, "output_dir", ""):
        return None
    if getattr(args, "eval_only", False) or getattr(args, "debug", False):
        return None
    return FileVis(args.output_dir)
