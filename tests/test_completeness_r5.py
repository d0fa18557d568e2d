"""Round-5 completeness closures: MOT17Det det-file writer, COCOeval
keypoints protocol, plot-utils parity, profiler trace integration."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from trackformer_tpu.datasets.coco_eval import (CocoEvaluator,
                                                convert_to_xywh, kpt_oks)

sys.path.insert(0, str(Path(__file__).parent))


class FakeGT:
    def __init__(self, anns_by_image):
        self.anns_by_image = anns_by_image


# --- MOT17Det detection-file writer (reference mot.py:76-111) -----------

def test_mot_write_result_files(tmp_path):
    from synth_data import make_synth_mot
    from trackformer_tpu.datasets import transforms as TT
    from trackformer_tpu.datasets.mot import MOT

    root = make_synth_mot(tmp_path / "mot", n_seqs=2, n_frames=3)
    tr = TT.Compose([TT.FixedResize(128, max_size=160)])
    ds = MOT(root / "train", root / "annotations" / "synth_train.json",
             tr, TT.Normalize())
    # image ids 0..2 = SYN-01 frames 1..3; ids 3..5 = SYN-02
    results = {
        0: {"boxes": np.array([[10., 20., 30., 50.], [0., 0., 5., 5.]]),
            "scores": np.array([0.9, 0.3])},   # 0.3 below the 0.7 cut
        1: {"boxes": np.array([[12., 22., 32., 52.]]),
            "scores": np.array([0.8])},
        3: {"boxes": np.array([[40., 40., 80., 90.]]),
            "scores": np.array([0.95])},
    }
    out = tmp_path / "dets"
    files = ds.write_result_files(results, str(out))
    assert sorted(Path(f).name for f in files) == ["SYN-01.txt",
                                                   "SYN-02.txt"]
    rows = [line.split(",") for line in
            (out / "SYN-01.txt").read_text().strip().splitlines()]
    # low-score det dropped; xyxy -> x,y,w,h; frame from the file name
    assert len(rows) == 2
    assert [int(rows[0][0]), int(rows[0][1])] == [1, -1]
    assert [float(v) for v in rows[0][2:6]] == [10., 20., 20., 30.]
    assert float(rows[0][6]) == pytest.approx(0.9)
    assert [int(v) for v in rows[0][7:]] == [-1, -1, -1]
    assert int(rows[1][0]) == 2
    rows2 = (out / "SYN-02.txt").read_text().strip().splitlines()
    assert len(rows2) == 1 and rows2[0].startswith("1,-1,40")


# --- COCOeval keypoints protocol (reference coco_eval.py:75+) ------------

def kp_ann(x, y, w, h, kpts):
    return {"bbox": [x, y, w, h], "category_id": 1, "iscrowd": 0,
            "area": w * h, "keypoints": np.asarray(kpts).ravel().tolist(),
            "num_keypoints": int((np.asarray(kpts)[:, 2] > 0).sum())}


def grid_kpts(x0, y0, n=17, visible=2):
    xs = x0 + np.arange(n) * 3.0
    ys = y0 + (np.arange(n) % 5) * 3.0
    return np.stack([xs, ys, np.full(n, visible)], 1)


def test_kpt_oks_exact_match_is_one():
    g = grid_kpts(50, 50)
    a = kp_ann(40, 40, 60, 60, g)
    det = np.concatenate([g[:, :2], np.ones((17, 1))], 1).reshape(1, -1)
    oks = kpt_oks(det, [a])
    assert oks[0, 0] == pytest.approx(1.0)


def test_keypoints_ap_thresholded():
    g = grid_kpts(50, 50)
    a = kp_ann(40, 40, 60, 60, g)
    # shift all keypoints by a constant so OKS lands strictly inside (.5,.95)
    shift = 5.0
    d = np.concatenate([g[:, :2] + shift, np.ones((17, 1))], 1)
    oks = kpt_oks(d.reshape(1, -1), [a])[0, 0]
    assert 0.5 < oks < 0.95
    gt = FakeGT({1: [a]})
    ev = CocoEvaluator(gt, iou_types=("keypoints",))
    ev.update({1: {"boxes": np.array([[40., 40., 100., 100.]]),
                   "scores": np.array([0.9]), "labels": np.array([1]),
                   "keypoints": d[None]}})
    stats = ev.summarize()["keypoints"]
    thrs = np.linspace(0.5, 0.95, 10)
    frac = float((thrs <= oks).mean())
    assert stats[0] == pytest.approx(frac, abs=1e-6)  # AP = matched frac
    assert stats[1] == pytest.approx(1.0)             # AP50
    # perfect keypoints -> everything 1 on the "all" slices
    ev2 = CocoEvaluator(gt, iou_types=("keypoints",))
    ev2.update({1: {"boxes": np.array([[40., 40., 100., 100.]]),
                    "scores": np.array([0.9]), "labels": np.array([1]),
                    "keypoints": np.concatenate(
                        [g[:, :2], np.ones((17, 1))], 1)[None]}})
    s2 = ev2.summarize()["keypoints"]
    assert s2[0] == pytest.approx(1.0) and s2[5] == pytest.approx(1.0)


def test_keypoints_unlabeled_gt_ignored():
    g = grid_kpts(50, 50, visible=0)
    a = kp_ann(40, 40, 60, 60, g)      # no labeled keypoints -> ignored GT
    gt = FakeGT({1: [a]})
    ev = CocoEvaluator(gt, iou_types=("keypoints",))
    ev.update({1: {"boxes": np.array([[40., 40., 100., 100.]]),
                   "scores": np.array([0.9]), "labels": np.array([1]),
                   "keypoints": np.concatenate(
                       [g[:, :2], np.ones((17, 1))], 1)[None]}})
    stats = ev.summarize()["keypoints"]
    assert np.isnan(stats[0])  # no evaluable GT at all


def test_prepare_result_formats():
    preds = {
        7: {"boxes": np.array([[10., 20., 30., 60.]]),
            "scores": np.array([0.5]), "labels": np.array([3]),
            "masks": [np.pad(np.ones((4, 4), bool), ((2, 94), (2, 94)))],
            "keypoints": grid_kpts(10, 10)[None]},
    }
    ev = CocoEvaluator(FakeGT({}), iou_types=("bbox",))
    det = ev.prepare(preds, "bbox")
    assert det == [{"image_id": 7, "category_id": 3,
                    "bbox": [10., 20., 20., 40.], "score": 0.5}]
    seg = ev.prepare(preds, "segm")
    assert seg[0]["image_id"] == 7 and "segmentation" in seg[0]
    assert isinstance(seg[0]["segmentation"]["counts"], str)
    kp = ev.prepare(preds, "keypoints")
    assert len(kp[0]["keypoints"]) == 17 * 3
    with pytest.raises(ValueError):
        ev.prepare(preds, "nope")
    np.testing.assert_allclose(
        convert_to_xywh(np.array([[1., 2., 4., 7.]])), [[1., 2., 3., 5.]])


# --- plot-utils parity (reference util/plot_utils.py:1-122) --------------

def test_fig_to_numpy():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from trackformer_tpu.utils.plot_utils import fig_to_numpy
    fig, ax = plt.subplots(figsize=(2, 1), dpi=50)
    ax.plot([0, 1], [0, 1])
    arr = fig_to_numpy(fig)
    plt.close(fig)
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    assert arr.shape[0] == 50 and arr.shape[1] == 100


def test_get_vis_win_names():
    from trackformer_tpu.utils.plot_utils import get_vis_win_names

    class V:
        def __init__(self, w):
            self.win = w

    d = {"train": {"loss": V("w1"), "ap": V("w2")}, "val": {"x": V(None)}}
    assert get_vis_win_names(d) == {"train": {"loss": "w1", "ap": "w2"},
                                    "val": {"x": None}}


def test_plot_logs(tmp_path):
    from trackformer_tpu.utils.plot_utils import plot_logs
    vis = tmp_path / "run1" / "vis"
    vis.mkdir(parents=True)
    with open(vis / "epoch_metrics.jsonl", "w") as f:
        for e in range(5):
            f.write(json.dumps({"epoch": e, "loss": 5.0 - e,
                                "train_AP": 0.1 * e,
                                "test_AP": 0.08 * e}) + "\n")
    fig, axs = plot_logs([tmp_path / "run1"], fields=("loss", "AP"),
                         ewm_col=1)
    assert len(axs) == 2
    assert len(axs[0].lines) == 1      # raw field
    assert len(axs[1].lines) == 2      # train_ + test_ pair
    with pytest.raises(ValueError):
        plot_logs([tmp_path / "missing"])
    with pytest.raises(ValueError):
        plot_logs(42)


def test_dump_eval_and_plot_precision_recall(tmp_path, capsys):
    from trackformer_tpu.utils.plot_utils import plot_precision_recall
    gt = FakeGT({1: [{"bbox": [0, 0, 10, 10], "category_id": 1,
                      "iscrowd": 0, "ignore": 0, "area": 100}]})
    ev = CocoEvaluator(gt)
    ev.update({1: {"boxes": np.array([[0., 0., 10., 10.]]),
                   "scores": np.array([0.9]), "labels": np.array([1])}})
    p = tmp_path / "eval_000.npz"
    ev.dump_eval(str(p))
    data = np.load(p)
    assert data["precision"].shape == (10, 101, 1, 1, 1)
    assert data["precision"][0, :, 0, 0, 0].mean() == pytest.approx(1.0)
    fig, axs = plot_precision_recall([p])
    out = capsys.readouterr().out
    assert "mAP@50= 100" in out.replace("100.0", "100")


# --- profiler trace integration (SURVEY §5) ------------------------------

def test_train_profile_trace(tmp_path):
    import jax.numpy as jnp

    from trackformer_tpu.engine.loop import train_one_epoch

    def train_step(state, pack, rng):
        return state + 1, {"loss": jnp.float32(1.0)}

    loader = [0] * 6
    state, stats = train_one_epoch(
        train_step, jnp.float32(0), loader, lambda x: x, 0, None, {},
        print_freq=100, profile_dir=str(tmp_path / "trace"),
        profile_steps=2)
    assert float(state) == 6.0
    dumped = list((tmp_path / "trace").rglob("*.xplane.pb"))
    assert dumped, "no xplane trace written"
