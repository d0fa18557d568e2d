"""FileVis (visdom replacement) semantics: JSONL streams, epoch plots,
example-frame rendering with track-query color coding, and the
build_visualizers gating (reference /root/reference/src/trackformer/vis.py
:101-374 and its build_visualizers in train.py)."""
import json
from types import SimpleNamespace

import numpy as np

from trackformer_tpu.vis import FileVis, build_visualizers


def test_filevis_streams_and_plots(tmp_path):
    vis = FileVis(str(tmp_path))
    vis.log_iter({"loss": 2.0, "loss_bbox": 1.0})
    vis.log_iter({"loss": np.float32(1.5)})
    vis.log_epoch(0, {"AP": 0.1, "skipme": np.zeros(3)})
    vis.log_epoch(1, {"AP": 0.3})

    rows = [json.loads(line)
            for line in open(tmp_path / "vis" / "iter_metrics.jsonl")]
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[1]["loss"] == 1.5  # numpy scalars serialized as floats

    erows = [json.loads(line)
             for line in open(tmp_path / "vis" / "epoch_metrics.jsonl")]
    assert [r["epoch"] for r in erows] == [0, 1]
    assert "skipme" not in erows[0]  # non-scalars dropped
    assert (tmp_path / "vis" / "epoch_metrics.png").exists()


def test_filevis_example_render(tmp_path):
    vis = FileVis(str(tmp_path))
    img = np.random.RandomState(0).uniform(0, 1, (40, 60, 3))
    vis.vis_results(
        img,
        pred_boxes=np.array([[5, 5, 20, 20], [25, 8, 40, 30],
                             [10, 25, 30, 38]], np.float32),
        pred_scores=np.array([0.9, 0.8, 0.7]),
        gt_boxes=np.array([[6, 6, 21, 21]], np.float32),
        tq_mask=np.array([False, True, True]),
        tq_fal_pos=np.array([False, False, True]),
        name="ex0")
    out = tmp_path / "vis" / "ex0.jpg"
    assert out.exists() and out.stat().st_size > 0


def test_build_visualizers_gating(tmp_path):
    mk = lambda **kw: SimpleNamespace(**{
        "no_vis": False, "output_dir": str(tmp_path), "eval_only": False,
        "debug": False, **kw})
    assert isinstance(build_visualizers(mk()), FileVis)
    assert build_visualizers(mk(no_vis=True)) is None
    assert build_visualizers(mk(output_dir="")) is None
    assert build_visualizers(mk(eval_only=True)) is None
    assert build_visualizers(mk(debug=True)) is None
