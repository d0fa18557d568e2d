"""Box geometry ops (cxcywh/xyxy conversions, IoU, GIoU, masks→boxes).

Capability parity with the reference `util/box_ops.py`
(/root/reference/src/trackformer/util/box_ops.py:9-88), written as pure jnp
functions that are jit/vmap-friendly and safe on padded (degenerate) boxes.
All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; clamped at 0 so padded boxes stay harmless."""
    w = jnp.maximum(b[..., 2] - b[..., 0], 0.0)
    h = jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    return w * h


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 0.0):
    """Pairwise IoU of two xyxy box sets: (..., N, 4) x (..., M, 4) → (..., N, M).

    Returns (iou, union) like the reference `box_ops.box_iou`.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]

    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / (union + eps) if eps else inter / union
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                        eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/) on xyxy boxes → (..., N, M).

    Unlike the reference (which asserts x1>=x0), degenerate padded boxes are
    tolerated via the eps in the denominators; callers mask padded entries.
    """
    iou, union = box_iou(boxes1, boxes2, eps=eps)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]

    return iou - (area - union) / (area + eps)


def elementwise_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                                    eps: float = 1e-7) -> jnp.ndarray:
    """GIoU between aligned box pairs (..., 4) x (..., 4) → (...).

    Used by the box loss where we only need the matched diagonal — avoids
    materialising the full N×M matrix the reference takes the diag of
    (/root/reference/src/trackformer/models/detr.py:306-308).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / (union + eps)

    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.maximum(rb_c - lt_c, 0.0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / (area_c + eps)


def clip_boxes_to_image(boxes: jnp.ndarray, size) -> jnp.ndarray:
    """Clip xyxy boxes to [0, w] x [0, h]; `size` is (h, w)."""
    h, w = size[0], size[1]
    x0 = jnp.clip(boxes[..., 0], 0, w)
    y0 = jnp.clip(boxes[..., 1], 0, h)
    x1 = jnp.clip(boxes[..., 2], 0, w)
    y1 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes (xyxy) around binary masks [N, H, W] → [N, 4].

    Fixed-shape equivalent of the reference `masks_to_boxes`
    (/root/reference/src/trackformer/util/box_ops.py:64-88): empty masks
    produce zero boxes.
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    big = 1e8
    x_min = jnp.min(jnp.where(m > 0, xs, big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m > 0, ys, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(m > 0, xs, -big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m > 0, ys, -big), axis=(1, 2))
    empty = jnp.sum(m, axis=(1, 2)) == 0
    box = jnp.stack([x_min, y_min, x_max + 1, y_max + 1], axis=-1)
    return jnp.where(empty[:, None], jnp.zeros_like(box), box)
