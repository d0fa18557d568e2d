"""COCO evaluator on hand-computed PR scenarios."""
import numpy as np
import pytest

from trackformer_tpu.datasets.coco_eval import CocoEvaluator


class FakeGT:
    def __init__(self, anns_by_image):
        self.anns_by_image = anns_by_image


def ann(x, y, w, h, cat=1, crowd=0, ignore=0):
    return {"bbox": [x, y, w, h], "category_id": cat, "iscrowd": crowd,
            "ignore": ignore, "area": w * h}


def test_ap_two_gt_one_fp():
    # GT A at (0,0,10,10), B at (50,50,10,10)
    gt = FakeGT({1: [ann(0, 0, 10, 10), ann(50, 50, 10, 10)]})
    ev = CocoEvaluator(gt)
    ev.update({1: {
        "boxes": np.array([[0, 0, 10, 10],      # perfect match A, s=0.9
                           [100, 100, 110, 110],  # FP, s=0.8
                           [50, 50, 60, 60]],     # perfect match B, s=0.7
                          np.float64),
        "scores": np.array([0.9, 0.8, 0.7]),
        "labels": np.array([1, 1, 1]),
    }})
    stats = ev.summarize()["bbox"]
    # tp=[1,0,1]: prec envelope [1, 2/3, 2/3]; AP = (51*1 + 50*2/3)/101
    expected = (51 * 1.0 + 50 * 2 / 3) / 101
    assert stats[0] == pytest.approx(expected, abs=1e-6)  # AP
    assert stats[1] == pytest.approx(expected, abs=1e-6)  # AP50
    assert stats[2] == pytest.approx(expected, abs=1e-6)  # AP75


def test_perfect_detection_ap_one():
    gt = FakeGT({1: [ann(0, 0, 10, 10)]})
    ev = CocoEvaluator(gt)
    ev.update({1: {"boxes": np.array([[0, 0, 10, 10]], np.float64),
                   "scores": np.array([1.0]), "labels": np.array([1])}})
    stats = ev.summarize()["bbox"]
    assert stats[0] == pytest.approx(1.0)
    assert stats[8] == pytest.approx(1.0)  # AR100


def test_ignored_gt_not_counted():
    # one real GT + one ignored GT; a det matching the ignored one is
    # neither TP nor FP
    gt = FakeGT({1: [ann(0, 0, 10, 10), ann(50, 50, 10, 10, ignore=1)]})
    ev = CocoEvaluator(gt)
    ev.update({1: {
        "boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float64),
        "scores": np.array([0.9, 0.8]),
        "labels": np.array([1, 1]),
    }})
    stats = ev.summarize()["bbox"]
    assert stats[0] == pytest.approx(1.0)


def test_iou_threshold_sensitivity():
    # det IoU ~0.68 with gt: counts at IoU<=0.65, misses at >=0.7
    gt = FakeGT({1: [ann(0, 0, 10, 10)]})
    ev = CocoEvaluator(gt)
    ev.update({1: {"boxes": np.array([[0, 0, 10, 8.1]], np.float64),
                   "scores": np.array([0.9]), "labels": np.array([1])}})
    stats = ev.summarize()["bbox"]
    # IoU = 81/100 = 0.81 -> matches at thresholds .5-.8, misses .85-.95
    assert stats[1] == pytest.approx(1.0)       # AP50
    assert 0.0 < stats[0] < 1.0                 # mean over thresholds
    assert stats[0] == pytest.approx(7 / 10, abs=1e-6)
