"""Panoptic postprocess + PQ evaluator round trip (reference
detr_segmentation.py:256-388 PostProcessPanoptic and
datasets/panoptic_eval.py:13-46), previously unexercised.

Builds a synthetic GT panoptic PNG + JSON, produces predictions through
`postprocess_panoptic` from crafted logits/masks, and checks PQ = 1.0 for
a perfect prediction and PQ < 1 when one segment's class is wrong.
"""
import json

import numpy as np
import pytest
from PIL import Image

from trackformer_tpu.datasets.panoptic_eval import PanopticEvaluator
from trackformer_tpu.models.panoptic import id2rgb, postprocess_panoptic

H, W = 64, 64
IS_THING = {i: i <= 90 for i in range(250)}


def write_gt(tmp_path):
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    # two segments: id 7 (cat 1, left half), id 9 (cat 2, right half)
    seg_map = np.full((H, W), 7, np.int64)
    seg_map[:, W // 2:] = 9
    Image.fromarray(id2rgb(seg_map)).save(gt_dir / "000001.png")
    gt_json = {
        "annotations": [{
            "image_id": 1, "file_name": "000001.png",
            "segments_info": [
                {"id": 7, "category_id": 1, "iscrowd": 0,
                 "area": H * W // 2},
                {"id": 9, "category_id": 2, "iscrowd": 0,
                 "area": H * W // 2},
            ],
        }],
    }
    path = tmp_path / "gt.json"
    path.write_text(json.dumps(gt_json))
    return path, gt_dir


def make_outputs(classes):
    """Two queries, one per half; classes[i] is the 0-based class column
    (category_id = column + 1 would be off — postprocess uses the raw
    argmax column as category_id, matching the reference)."""
    q, c = 4, 5  # 4 queries, 4 classes + no-object
    logits = np.full((1, q, c), -10.0, np.float32)
    logits[0, 0, classes[0]] = 10.0
    logits[0, 1, classes[1]] = 10.0
    logits[0, 2, c - 1] = 10.0  # no-object
    logits[0, 3, c - 1] = 10.0
    masks = np.full((1, q, H, W), -10.0, np.float32)
    masks[0, 0, :, :W // 2] = 10.0
    masks[0, 1, :, W // 2:] = 10.0
    return {"pred_logits": logits, "pred_masks": masks}


def run(tmp_path, classes):
    gt_json, gt_dir = write_gt(tmp_path)
    ev = PanopticEvaluator(str(gt_json), str(gt_dir),
                           output_dir=str(tmp_path / "out"))
    preds = postprocess_panoptic(make_outputs(classes),
                                 processed_sizes=[(H, W)],
                                 is_thing_map=IS_THING,
                                 target_sizes=[(H, W)])
    preds[0]["image_id"] = 1
    ev.update(preds)
    return ev.summarize()


def test_perfect_prediction_pq_one(tmp_path):
    res = run(tmp_path, classes=[1, 2])
    assert res["PQ"] == pytest.approx(1.0)
    assert res["SQ"] == pytest.approx(1.0)
    assert res["RQ"] == pytest.approx(1.0)


def test_wrong_class_lowers_pq(tmp_path):
    # second segment predicted with the wrong class: cat 2 becomes FN +
    # the wrong-class segment an FP
    res = run(tmp_path, classes=[1, 3])
    assert res["PQ"] < 0.6
