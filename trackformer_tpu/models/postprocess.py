"""Output post-processing to absolute-coordinate detections.

Parity targets: PostProcess (softmax scores,
/root/reference/src/trackformer/models/detr.py:446-490) and
DeformablePostProcess (sigmoid scores incl. the no-object column in the max,
/root/reference/src/trackformer/models/deformable_detr.py:286-334).

Batched fixed shapes: results are dicts of (B, Q, ...) arrays rather than
per-image lists; downstream consumers mask with `query_valid`.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import box_ops


def _scale_boxes(out_bbox: jnp.ndarray, target_sizes: jnp.ndarray):
    boxes = box_ops.box_cxcywh_to_xyxy(out_bbox)
    img_h = target_sizes[:, 0].astype(jnp.float32)
    img_w = target_sizes[:, 1].astype(jnp.float32)
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)
    return boxes * scale[:, None, :]


def postprocess_softmax(outputs: Dict, target_sizes: jnp.ndarray) -> Dict:
    """Vanilla DETR: softmax over classes, no-object column excluded."""
    prob = jax.nn.softmax(outputs["pred_logits"], axis=-1)
    scores = jnp.max(prob[..., :-1], axis=-1)
    labels = jnp.argmax(prob[..., :-1], axis=-1)
    return {
        "scores": scores,
        "labels": labels,
        "boxes": _scale_boxes(outputs["pred_boxes"], target_sizes),
        "scores_no_object": prob[..., -1],
    }


def postprocess_sigmoid(outputs: Dict, target_sizes: jnp.ndarray) -> Dict:
    """Deformable/focal: per-class sigmoid, max over ALL columns (keeps the
    reference's inclusion of the no-object column, deformable_detr.py:316)."""
    prob = jax.nn.sigmoid(outputs["pred_logits"])
    scores = jnp.max(prob, axis=-1)
    labels = jnp.argmax(prob, axis=-1)
    return {
        "scores": scores,
        "labels": labels,
        "boxes": _scale_boxes(outputs["pred_boxes"], target_sizes),
        "scores_no_object": 1.0 - scores,
    }
