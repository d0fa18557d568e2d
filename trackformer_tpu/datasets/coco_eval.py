"""COCO-style detection mAP evaluation, pycocotools-free.

Parity target: /root/reference/src/trackformer/datasets/coco_eval.py (which
wraps pycocotools COCOeval) — per-image update (:36-56), cross-process merge
(:58-64, here a simple gather of per-image results since hosts each evaluate
their shard), and the standard 12 COCO AP/AR statistics.

Implements the COCOeval matching protocol: per (image, category), greedy
score-ordered matching against GT at 10 IoU thresholds with crowd/ignore
handling, 101-point interpolated PR curves, area-range and max-det variants.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def box_iou_xywh(det: np.ndarray, gt: np.ndarray,
                 iscrowd: np.ndarray) -> np.ndarray:
    """IoU with crowd handling (intersection over det area for crowd GT)."""
    if len(det) == 0 or len(gt) == 0:
        return np.zeros((len(det), len(gt)))
    dx1, dy1 = det[:, 0], det[:, 1]
    dx2, dy2 = det[:, 0] + det[:, 2], det[:, 1] + det[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    ix = np.clip(np.minimum(dx2[:, None], gx2[None]) -
                 np.maximum(dx1[:, None], gx1[None]), 0, None)
    iy = np.clip(np.minimum(dy2[:, None], gy2[None]) -
                 np.maximum(dy1[:, None], gy1[None]), 0, None)
    inter = ix * iy
    da = (det[:, 2] * det[:, 3])[:, None]
    ga = (gt[:, 2] * gt[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), da, da + ga - inter)
    return inter / np.maximum(union, 1e-12)


class CocoEvaluator:
    """Accumulates per-image detections and computes COCO AP stats."""

    def __init__(self, gt_dataset, iou_types: Sequence[str] = ("bbox",)):
        """gt_dataset: CocoDetection-like with .anns_by_image / .images."""
        self.gt = gt_dataset
        self.iou_types = list(iou_types)
        self.predictions: Dict[int, dict] = {}

    def update(self, predictions: Dict[int, dict]) -> None:
        """predictions: {image_id: {'boxes' xyxy, 'scores', 'labels'}}."""
        self.predictions.update(predictions)

    def synchronize_between_processes(self):
        """Merge per-process predictions (reference coco_eval.py:58-64).
        Unlike round 1 this does NOT swallow failures — a multi-host eval
        that fails to merge must not silently report per-host AP."""
        import jax
        if jax.process_count() <= 1:
            return
        from ..parallel import all_gather_objects
        merged = {}
        for shard in all_gather_objects(self.predictions):
            merged.update(shard)
        self.predictions = merged

    def _mask_iou(self, pred, det_idx, anns, g_crowd, img_id):
        """Mask IoU matrix + det mask areas for `segm` evaluation
        (pycocotools maskUtils.iou equivalent: crowd GT uses det area as
        the denominator)."""
        from ..utils import rle

        img_info = getattr(self.gt, "images", {}).get(img_id, {})
        pred_masks = pred["masks"]
        d_masks = []
        for i in det_idx:
            m = pred_masks[int(i)]
            d_masks.append(rle.decode_mask(m) if isinstance(m, dict)
                           else np.asarray(m, bool))
        if d_masks:
            h, w = d_masks[0].shape
        else:
            h = img_info.get("height", 1)
            w = img_info.get("width", 1)
        g_masks = [rle.segmentation_to_mask(a["segmentation"], h, w)
                   for a in anns]
        d_area = np.array([m.sum() for m in d_masks], np.float64)
        ious = np.zeros((len(d_masks), len(g_masks)))
        for di, dm in enumerate(d_masks):
            for gj, gm in enumerate(g_masks):
                inter = np.logical_and(dm, gm).sum()
                union = dm.sum() if g_crowd[gj] else \
                    dm.sum() + gm.sum() - inter
                ious[di, gj] = inter / max(union, 1e-12)
        return ious, d_area

    def _evaluate_images(self, cat_id: Optional[int], area_rng, max_det,
                         iou_type: str = "bbox"):
        """Per-image COCOeval-style matching -> flat tp/fp/score arrays."""
        tps, scores, n_gt = [], [], 0
        lo, hi = area_rng
        for img_id, pred in self.predictions.items():
            anns = self.gt.anns_by_image.get(img_id, [])
            if cat_id is not None:
                anns = [a for a in anns if a["category_id"] == cat_id]
            g_boxes = np.array([a["bbox"] for a in anns],
                               np.float64).reshape(-1, 4)
            g_crowd = np.array(
                [a.get("iscrowd", 0) or a.get("ignore", 0) for a in anns],
                np.int64)
            g_area = np.array([a.get("area", b[2] * b[3])
                               for a, b in zip(anns, g_boxes)], np.float64)
            g_ignore = g_crowd.astype(bool) | (g_area < lo) | (g_area > hi)
            order_g = np.argsort(g_ignore, kind="stable")
            anns = [anns[j] for j in order_g]
            g_boxes, g_crowd, g_ignore = (g_boxes[order_g], g_crowd[order_g],
                                          g_ignore[order_g])

            boxes = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
            all_scores = np.asarray(pred["scores"], np.float64)
            labels = np.asarray(pred["labels"])
            det_idx = np.arange(len(all_scores))
            if cat_id is not None:
                det_idx = det_idx[labels == cat_id]
            order = np.argsort(-all_scores[det_idx], kind="stable")[:max_det]
            det_idx = det_idx[order]
            boxes, d_scores = boxes[det_idx], all_scores[det_idx]
            d_xywh = np.stack([boxes[:, 0], boxes[:, 1],
                               boxes[:, 2] - boxes[:, 0],
                               boxes[:, 3] - boxes[:, 1]], 1) \
                if len(boxes) else boxes
            d_area = d_xywh[:, 2] * d_xywh[:, 3] if len(boxes) else \
                np.zeros(0)

            if iou_type == "segm":
                ious, d_area = self._mask_iou(pred, det_idx, anns, g_crowd,
                                              img_id)
            else:
                ious = box_iou_xywh(d_xywh, g_boxes, g_crowd)
            t = len(IOU_THRS)
            tp = np.zeros((t, len(boxes)), bool)
            d_ig = np.zeros((t, len(boxes)), bool)
            for ti, thr in enumerate(IOU_THRS):
                matched_g = np.zeros(len(g_boxes), bool)
                for di in range(len(boxes)):
                    best, best_j = min(thr, 1 - 1e-10), -1
                    for gj in range(len(g_boxes)):
                        if matched_g[gj] and not g_crowd[gj]:
                            continue
                        if best_j > -1 and not g_ignore[best_j] \
                                and g_ignore[gj]:
                            break
                        if ious[di, gj] < best:
                            continue
                        best, best_j = ious[di, gj], gj
                    if best_j >= 0:
                        matched_g[best_j] = True
                        tp[ti, di] = not g_ignore[best_j]
                        d_ig[ti, di] = g_ignore[best_j]
                # unmatched dets outside area range are ignored
                out_rng = (d_area < lo) | (d_area > hi)
                d_ig[ti] |= (~tp[ti]) & (~d_ig[ti]) & out_rng
            tps.append((tp, d_ig))
            scores.append(d_scores)
            n_gt += int((~g_ignore).sum())
        return tps, scores, n_gt

    def _ap_ar(self, cat_ids, area: str = "all", max_det: int = 100,
               iou_type: str = "bbox"):
        ap_list, ar_list = [], []
        for cat in cat_ids:
            tps, scores, n_gt = self._evaluate_images(
                cat, AREA_RANGES[area], max_det, iou_type)
            if n_gt == 0:
                continue
            all_scores = np.concatenate(scores) if scores else np.zeros(0)
            order = np.argsort(-all_scores, kind="mergesort")
            tp = np.concatenate([t[0] for t in tps], 1)[:, order] \
                if tps else np.zeros((len(IOU_THRS), 0), bool)
            ig = np.concatenate([t[1] for t in tps], 1)[:, order] \
                if tps else np.zeros((len(IOU_THRS), 0), bool)
            aps, ars = [], []
            for ti in range(len(IOU_THRS)):
                t_row = tp[ti][~ig[ti]]
                tp_cum = np.cumsum(t_row)
                fp_cum = np.cumsum(~t_row)
                rec = tp_cum / n_gt
                prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
                # monotone precision envelope + 101-pt interpolation
                for i in range(len(prec) - 1, 0, -1):
                    prec[i - 1] = max(prec[i - 1], prec[i])
                idx = np.searchsorted(rec, REC_THRS, side="left")
                q = np.zeros(len(REC_THRS))
                valid = idx < len(prec)
                q[valid] = prec[idx[valid]]
                aps.append(q.mean())
                ars.append(rec[-1] if len(rec) else 0.0)
            ap_list.append(aps)
            ar_list.append(ars)
        if not ap_list:
            return np.full(len(IOU_THRS), np.nan), \
                np.full(len(IOU_THRS), np.nan)
        return np.mean(ap_list, 0), np.mean(ar_list, 0)

    def summarize(self) -> Dict[str, List[float]]:
        """The standard 12 COCO statistics per iou_type (reference
        coco_eval.py:75+ prepares bbox AND segm when masks are on)."""
        cat_ids = sorted({a["category_id"]
                          for anns in self.gt.anns_by_image.values()
                          for a in anns})
        names = ["AP", "AP50", "AP75", "APs", "APm", "APl",
                 "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"]
        out = {}
        for iou_type in self.iou_types:
            ap, _ = self._ap_ar(cat_ids, "all", 100, iou_type)
            stats = [float(np.nanmean(ap)), float(ap[0]), float(ap[5])]
            for area in ("small", "medium", "large"):
                a, _ = self._ap_ar(cat_ids, area, 100, iou_type)
                stats.append(float(np.nanmean(a)))
            for md in (1, 10, 100):
                _, ar = self._ap_ar(cat_ids, "all", md, iou_type)
                stats.append(float(np.nanmean(ar)))
            for area in ("small", "medium", "large"):
                _, ar = self._ap_ar(cat_ids, area, 100, iou_type)
                stats.append(float(np.nanmean(ar)))
            print(f"COCO eval ({iou_type}):")
            for n, s in zip(names, stats):
                print(f"  {n:6s} = {s:.3f}")
            out[iou_type] = stats
        return out
