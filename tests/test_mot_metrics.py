"""Hand-computed CLEAR-MOT / IDF1 scenarios + RLE codec round-trips."""
import numpy as np

from trackformer_tpu.utils import rle
from trackformer_tpu.utils.mot_metrics import (MOTAccumulator, iou_distance,
                                               summarize)


def box(x, y, s=10):
    return np.array([x, y, x + s, y + s], np.float32)


def run_frames(frames):
    acc = MOTAccumulator("t")
    for gt, hyp in frames:
        gt_ids = list(gt.keys())
        hyp_ids = list(hyp.keys())
        d = iou_distance(
            np.asarray([gt[i] for i in gt_ids]).reshape(-1, 4),
            np.asarray([hyp[i] for i in hyp_ids]).reshape(-1, 4))
        acc.update(gt_ids, hyp_ids, d)
    return acc


def test_perfect_tracking():
    frames = [({1: box(0, 0)}, {5: box(0, 0)}) for _ in range(4)]
    s = summarize([run_frames(frames)])["OVERALL"]
    assert s["mota"] == 1.0
    assert s["idf1"] == 1.0
    assert s["num_switches"] == 0
    assert s["mostly_tracked"] == 1


def test_id_switch():
    # hyp id changes mid-track: 1 switch, IDF1 = 0.5
    frames = [({1: box(0, 0)}, {5: box(0, 0)}),
              ({1: box(0, 0)}, {5: box(0, 0)}),
              ({1: box(0, 0)}, {6: box(0, 0)}),
              ({1: box(0, 0)}, {6: box(0, 0)})]
    s = summarize([run_frames(frames)])["OVERALL"]
    assert s["num_switches"] == 1
    np.testing.assert_allclose(s["mota"], 1 - 1 / 4)
    np.testing.assert_allclose(s["idf1"], 0.5)


def test_fp_and_fn():
    frames = [({1: box(0, 0)}, {}),                      # miss
              ({1: box(0, 0)}, {5: box(0, 0)}),          # match
              ({}, {5: box(0, 0)}),                      # fp
              ({1: box(0, 0)}, {5: box(0, 0)})]          # match
    s = summarize([run_frames(frames)])["OVERALL"]
    assert s["num_misses"] == 1
    assert s["num_false_positives"] == 1
    np.testing.assert_allclose(s["mota"], 1 - 2 / 3)


def test_match_carryover_beats_hungarian():
    # two gts cross paths: carried-over pairing persists even if the other
    # hyp is closer (motmetrics semantics)
    g1, g2 = box(0, 0), box(8, 0)
    frames = [({1: g1, 2: g2}, {5: g1, 6: g2}),
              # both move toward each other's previous spot but stay within
              # IoU 0.5 of both; carry-over must keep 1-5, 2-6
              ({1: box(3, 0), 2: box(5, 0)}, {5: box(4, 0), 6: box(4, 0)})]
    acc = run_frames(frames)
    assert acc.events[1]["matches"] == {1: 5, 2: 6}
    s = summarize([acc])["OVERALL"]
    assert s["num_switches"] == 0


def test_mostly_lost():
    frames = [({1: box(0, 0)}, {})] * 9 + [({1: box(0, 0)},
                                            {5: box(0, 0)})]
    s = summarize([run_frames(frames)])["OVERALL"]
    assert s["mostly_lost"] == 1


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.rand(37, 53) > 0.7
    enc = rle.encode_mask(mask)
    dec = rle.decode_mask(enc)
    np.testing.assert_array_equal(mask, dec)
    assert rle.mask_area(enc) == mask.sum()


def test_rle_empty_and_full():
    for mask in (np.zeros((5, 7), bool), np.ones((5, 7), bool)):
        np.testing.assert_array_equal(rle.decode_mask(rle.encode_mask(mask)),
                                      mask)


def test_polygon_rasterize():
    poly = [[1, 1, 8, 1, 8, 8, 1, 8]]
    m = rle.polygons_to_mask(poly, 10, 10)
    assert m[4, 4] and not m[0, 0] and not m[9, 9]
