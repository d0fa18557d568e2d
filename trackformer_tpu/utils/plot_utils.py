"""Standalone training-log / PR-curve plotting helpers.

Parity target: /root/reference/src/trackformer/util/plot_utils.py:1-122 —
`fig_to_numpy` (:14-21), `get_vis_win_names` (:24-32), `plot_logs`
(:35-90) and `plot_precision_recall` (:93-122). Differences are
environment-native: logs are the JSONL streams FileVis writes
(vis.py `epoch_metrics.jsonl`; the reference reads the torch engine's
`log.txt`, same line-per-epoch JSON layout), the EWM smoothing is a
numpy implementation instead of pandas, and PR dumps are the .npz files
CocoEvaluator.dump_eval writes instead of torch.save'd pycocotools evals.
"""
from __future__ import annotations

import json
from pathlib import Path, PurePath
from typing import Dict, Sequence

import numpy as np


def fig_to_numpy(fig) -> np.ndarray:
    """Rasterize a matplotlib figure to an (H, W, 3) uint8 RGB array
    (reference plot_utils.py:14-21; buffer_rgba is the non-deprecated
    Agg API — tostring_rgb was removed in matplotlib>=3.8)."""
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    canvas = FigureCanvasAgg(fig)
    canvas.draw()
    w, h = (int(v) for v in canvas.get_width_height(physical=True))
    buf = np.frombuffer(canvas.buffer_rgba(), dtype=np.uint8)
    return buf.reshape(h, w, 4)[..., :3].copy()


def get_vis_win_names(vis_dict: Dict[str, Dict]) -> Dict[str, Dict]:
    """{outer: {inner: vis.win}} for a nested visualizer dict (reference
    plot_utils.py:24-32; our FileVis exposes `win` as the stream name)."""
    return {outer_k: {inner_k: getattr(inner_v, "win", None)
                      for inner_k, inner_v in outer_v.items()}
            for outer_k, outer_v in vis_dict.items()}


def _ewm(values: np.ndarray, com: float) -> np.ndarray:
    """Exponentially weighted mean, pandas `ewm(com=...).mean()` parity
    (adjust=True): y_t = sum_i w_i x_i / sum_i w_i, w_i = (1-alpha)^(t-i)."""
    if com <= 0:
        return values.astype(np.float64)
    alpha = 1.0 / (1.0 + com)
    out = np.empty(len(values), np.float64)
    num = den = 0.0
    decay = 1.0 - alpha
    for i, v in enumerate(values):
        num = num * decay + v
        den = den * decay + 1.0
        out[i] = num / den
    return out


def _read_jsonl(path: Path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def plot_logs(logs, fields: Sequence[str] = ("class_error",
                                             "loss_bbox_unscaled", "mAP"),
              ewm_col: float = 0,
              log_name: str = "vis/epoch_metrics.jsonl"):
    """Plot selected fields from one or more training-log directories
    (reference plot_utils.py:35-90): one subplot per field, one color per
    log dir; `train_<field>` solid and `test_<field>` dashed when both
    exist, otherwise the raw field. Returns (fig, axs)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    func_name = "plot_utils.plot_logs"
    if not isinstance(logs, list):
        if isinstance(logs, (str, PurePath)):
            logs = [logs]
        else:
            raise ValueError(
                f"{func_name} - invalid logs argument of {type(logs)}")
    logs = [Path(p) for p in logs]
    for d in logs:
        if not d.exists():
            raise ValueError(f"{func_name} - invalid directory: {d}")

    dfs = [_read_jsonl(p / log_name if (p / log_name).exists()
                       else p / "log.txt") for p in logs]
    fields = list(fields)
    fig, axs = plt.subplots(ncols=len(fields), figsize=(16, 5),
                            squeeze=False)
    axs = axs[0]
    cmap = plt.get_cmap("tab10")
    for li, rows in enumerate(dfs):
        color = cmap(li % 10)
        for j, field in enumerate(fields):
            def series(key):
                return np.array([r[key] for r in rows if key in r
                                 and np.isscalar(r[key])])

            tr, te = series(f"train_{field}"), series(f"test_{field}")
            if len(tr) or len(te):
                if len(tr):
                    axs[j].plot(_ewm(tr, ewm_col), "-", color=color)
                if len(te):
                    axs[j].plot(_ewm(te, ewm_col), "--", color=color)
            else:  # raw field fallback (our epoch_metrics.jsonl layout)
                raw = series(field)
                if len(raw):
                    axs[j].plot(_ewm(raw, ewm_col), "-", color=color)
    for ax, field in zip(axs, fields):
        ax.legend([p.name for p in logs])
        ax.set_title(field)
    return fig, axs


def plot_precision_recall(files, naming_scheme: str = "iter"):
    """PR and score/recall curves from CocoEvaluator.dump_eval .npz dumps
    (reference plot_utils.py:93-122, which reads torch.save'd pycocotools
    evals). precision/scores are (T, R, K, A, M); row 0 of T is IoU=0.5,
    area slice 0 = all, last max-det column. Returns (fig, axs)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    files = [Path(f) for f in files]
    if naming_scheme == "exp_id":
        names = [f.parts[-3] for f in files]
    elif naming_scheme == "iter":
        names = [f.stem for f in files]
    else:
        raise ValueError(f"not supported {naming_scheme}")
    fig, axs = plt.subplots(ncols=2, figsize=(16, 5))
    cmap = plt.get_cmap("Blues")
    for i, (f, name) in enumerate(zip(files, names)):
        data = np.load(f)
        precision = data["precision"]  # (T, R, K, A, M)
        recall = data["recThrs"]
        scores = data["scores"]
        precision = precision[0, :, :, 0, -1].mean(1)
        scores = scores[0, :, :, 0, -1].mean(1)
        prec = precision.mean()
        rec = data["recall"][0, :, 0, -1].mean()
        print(f"{naming_scheme} {name}: mAP@50={prec * 100: 05.1f}, "
              f"score={scores.mean():0.3f}, "
              f"f1={2 * prec * rec / (prec + rec + 1e-8):0.3f}")
        color = cmap(0.3 + 0.7 * (i + 1) / len(files))
        axs[0].plot(recall, precision, c=color)
        axs[1].plot(recall, scores, c=color)

    axs[0].set_title("Precision / Recall")
    axs[0].legend(names)
    axs[1].set_title("Scores / Recall")
    axs[1].legend(names)
    return fig, axs
