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


# ---------------------------------------------------------------------------
# segm (mask AP) — reference coco_eval.py:75+ prepares segm via pycocotools;
# ours computes mask IoU directly (utils/rle.py codec)
# ---------------------------------------------------------------------------

from trackformer_tpu.utils import rle  # noqa: E402


def sq_mask(y0, x0, h, w, size=(100, 100)):
    m = np.zeros(size, bool)
    m[y0:y0 + h, x0:x0 + w] = True
    return m


def seg_ann(mask, cat=1, crowd=0):
    ys, xs = np.nonzero(mask)
    return {"bbox": [float(xs.min()), float(ys.min()),
                     float(xs.max() - xs.min() + 1),
                     float(ys.max() - ys.min() + 1)],
            "category_id": cat, "iscrowd": crowd,
            "area": int(mask.sum()),
            "segmentation": rle.encode_mask(mask)}


def det(boxes, scores, masks=None):
    d = {"boxes": np.asarray(boxes, np.float64),
         "scores": np.asarray(scores, np.float64),
         "labels": np.ones(len(scores), np.int64)}
    if masks is not None:
        d["masks"] = [rle.encode_mask(m) for m in masks]
    return d


def test_segm_perfect_match():
    g = sq_mask(0, 0, 10, 10)
    gt = FakeGT({1: [seg_ann(g)]})
    ev = CocoEvaluator(gt, iou_types=("bbox", "segm"))
    ev.update({1: det([[0, 0, 10, 10]], [0.9], [g])})
    stats = ev.summarize()
    assert stats["segm"][0] == pytest.approx(1.0)
    assert stats["bbox"][0] == pytest.approx(1.0)


def test_segm_iou_threshold_sensitivity():
    # det mask covers 8 of the GT's 10 rows: IoU = 80/100 = 0.8 ->
    # matches at thresholds .5-.8, misses .85-.95 (AP mean = 7/10)
    gt = FakeGT({1: [seg_ann(sq_mask(0, 0, 10, 10))]})
    ev = CocoEvaluator(gt, iou_types=("segm",))
    ev.update({1: det([[0, 0, 10, 10]], [0.9], [sq_mask(0, 0, 8, 10)])})
    stats = ev.summarize()["segm"]
    assert stats[1] == pytest.approx(1.0)
    assert stats[0] == pytest.approx(7 / 10, abs=1e-6)


def test_segm_differs_from_bbox():
    # same bbox, but the mask is an L-shape with low IoU against the
    # square GT: bbox AP = 1, segm AP = 0
    g = sq_mask(0, 0, 10, 10)
    pred_mask = sq_mask(0, 0, 10, 10) & ~sq_mask(0, 0, 8, 8)  # 36 px rim
    gt = FakeGT({1: [seg_ann(g)]})
    ev = CocoEvaluator(gt, iou_types=("bbox", "segm"))
    ev.update({1: det([[0, 0, 10, 10]], [0.9], [pred_mask])})
    stats = ev.summarize()
    assert stats["bbox"][0] == pytest.approx(1.0)
    assert stats["segm"][0] == pytest.approx(0.0)  # IoU 36/100 < 0.5


def test_segm_crowd_region_ignored():
    # a det inside a crowd GT mask matches it (inter / det area = 1) and
    # is ignored rather than counted as FP; the real GT still scores 1.0
    real = sq_mask(0, 0, 10, 10)
    crowd = sq_mask(40, 40, 40, 40)
    gt = FakeGT({1: [seg_ann(real), seg_ann(crowd, crowd=1)]})
    ev = CocoEvaluator(gt, iou_types=("segm",))
    ev.update({1: det([[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.8],
                      [real, sq_mask(50, 50, 10, 10)])})
    stats = ev.summarize()["segm"]
    assert stats[0] == pytest.approx(1.0)


def test_segm_polygon_gt():
    # GT given as a COCO polygon; det mask rasterized the same way
    poly = [[10.0, 10.0, 30.0, 10.0, 30.0, 30.0, 10.0, 30.0]]
    gt_mask = rle.polygons_to_mask(poly, 100, 100)
    gt = FakeGT({1: [{"bbox": [10, 10, 20, 20], "category_id": 1,
                      "iscrowd": 0, "area": int(gt_mask.sum()),
                      "segmentation": poly}]})
    ev = CocoEvaluator(gt, iou_types=("segm",))
    ev.update({1: det([[10, 10, 30, 30]], [0.9], [gt_mask])})
    assert ev.summarize()["segm"][0] == pytest.approx(1.0)


def test_make_results_mask_rle_pipeline():
    """make_results' segm branch: crop to the valid region, rescale to the
    original size, RLE-encode (reference PostProcessSegm +
    engine.make_results)."""
    import jax.numpy as jnp

    from trackformer_tpu.engine.loop import make_results
    from trackformer_tpu.models.segmentation import postprocess_segm
    from trackformer_tpu.structures import FrameBatch, empty_targets

    b, q, hm, wm = 1, 2, 16, 20  # mask-head resolution (stride 4 of 64x80)
    pred_masks = np.full((b, q, hm, wm), -10.0, np.float32)
    pred_masks[0, 0, :8, :10] = 10.0  # query 0: top-left quadrant
    outputs = {
        "pred_logits": jnp.zeros((b, q, 2)),
        "pred_boxes": jnp.full((b, q, 4), 0.25),
        "pred_masks": jnp.asarray(pred_masks),
        "hs_embed": jnp.zeros((b, q, 4)),
    }
    targets = empty_targets(b, 1).replace(
        orig_size=jnp.array([[128, 160]]),  # 2x the valid region
        size=jnp.array([[64, 80]]),
        image_id=jnp.array([5]))
    batch = FrameBatch.from_images(jnp.zeros((b, 64, 80, 3)),
                                   jnp.array([[64, 80]]))

    def post(out, sizes):
        return {"boxes": out["pred_boxes"], "scores": jnp.ones((b, q)),
                "labels": jnp.zeros((b, q), jnp.int32)}

    res = make_results(outputs, targets, post, num_object_queries=q,
                       postprocess_segm=postprocess_segm, batch=batch)
    masks = res[5]["masks"]
    assert len(masks) == q
    m0 = rle.decode_mask(masks[0])
    assert m0.shape == (128, 160)  # original resolution
    # top-left quadrant of the image, up to interpolation at the boundary
    assert m0[:60, :70].mean() > 0.95
    assert m0[68:, 90:].mean() < 0.05
    assert rle.decode_mask(masks[1]).sum() == 0
