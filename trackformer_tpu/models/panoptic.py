"""Panoptic post-processing (host-side numpy).

Parity target: /root/reference/src/trackformer/models/detr_segmentation.py
PostProcessPanoptic (:256-388): threshold + no-object filtering, per-pixel
argmax over query masks, merging of same-class stuff segments, iterative
removal of tiny segments, id2rgb PNG payloads.
"""
from __future__ import annotations

import io
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np
from PIL import Image


def id2rgb(id_map: np.ndarray) -> np.ndarray:
    rgb = np.zeros(id_map.shape + (3,), np.uint8)
    for i in range(3):
        rgb[..., i] = (id_map >> (8 * i)) & 255
    return rgb


def rgb2id(color: np.ndarray) -> np.ndarray:
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 65536 * color[..., 2]


def postprocess_panoptic(outputs: Dict, processed_sizes: List,
                         is_thing_map: Dict[int, bool],
                         target_sizes: Optional[List] = None,
                         threshold: float = 0.85) -> List[Dict]:
    """outputs: pred_logits (B, Q, C+1), pred_masks (B, Q, h, w) (numpy or
    device arrays). Returns per-image {png_string, segments_info}."""
    logits = np.asarray(outputs["pred_logits"])
    raw_masks = np.asarray(outputs["pred_masks"])
    target_sizes = target_sizes or processed_sizes
    preds = []
    for b in range(logits.shape[0]):
        lg = logits[b]
        e = np.exp(lg - lg.max(-1, keepdims=True))
        prob = e / e.sum(-1, keepdims=True)
        scores = prob.max(-1)
        labels = prob.argmax(-1)
        keep = (labels != lg.shape[-1] - 1) & (scores > threshold)

        cur_scores = scores[keep]
        cur_classes = labels[keep]
        size = tuple(int(v) for v in processed_sizes[b])
        masks = raw_masks[b][keep]
        resized = np.stack([
            np.asarray(Image.fromarray(m).resize(
                (size[1], size[0]), Image.BILINEAR)) for m in masks]) \
            if len(masks) else np.zeros((0,) + size, np.float32)

        h, w = size
        stuff_equiv = defaultdict(list)
        for k, lab in enumerate(cur_classes):
            if not is_thing_map.get(int(lab), True):
                stuff_equiv[int(lab)].append(k)

        def get_ids_area(msk, dedup=False):
            if len(msk) == 0:
                m_id = np.zeros((h, w), np.int64)
            else:
                m_id = msk.reshape(len(msk), -1).argmax(0).reshape(h, w)
            if dedup:
                for equiv in stuff_equiv.values():
                    if len(equiv) > 1:
                        for eid in equiv:
                            m_id[m_id == eid] = equiv[0]
            fh, fw = (int(v) for v in target_sizes[b])
            seg_img = Image.fromarray(id2rgb(m_id)).resize(
                (fw, fh), Image.NEAREST)
            m_id_final = rgb2id(np.asarray(seg_img))
            area = [int((m_id_final == i).sum()) for i in range(len(msk))]
            return area, seg_img

        area, seg_img = get_ids_area(resized, dedup=True)
        if len(cur_classes):
            while True:
                small = np.array([a <= 4 for a in area], bool)
                if small.any():
                    cur_scores = cur_scores[~small]
                    cur_classes = cur_classes[~small]
                    resized = resized[~small]
                    area, seg_img = get_ids_area(resized)
                else:
                    break
        else:
            cur_classes = np.ones(1, np.int64)

        segments_info = [
            {"id": i, "isthing": is_thing_map.get(int(c), True),
             "category_id": int(c), "area": a}
            for i, (a, c) in enumerate(zip(area, cur_classes))]
        with io.BytesIO() as out:
            seg_img.save(out, format="PNG")
            preds.append({"png_string": out.getvalue(),
                          "segments_info": segments_info})
    return preds
