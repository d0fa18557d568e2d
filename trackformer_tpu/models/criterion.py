"""SetCriterion: Hungarian-matched detection/tracking losses on padded targets.

Parity target: /root/reference/src/trackformer/models/detr.py:139-443 —
loss_labels (:172, incl. the track-query false-positive eos reweighting
:190-197), loss_labels_focal (:213), loss_cardinality (:276), loss_boxes
(:290), aux/enc loss recursion (:410-441), distributed num_boxes
normalization (:396-401, psum here instead of torch all_reduce).

All losses are masked fixed-shape reductions: invalid query slots and padded
target slots contribute exactly zero, so numerics match the reference's
ragged computation.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import box_ops
from ..ops.losses import dice_loss, sigmoid_binary_cross_entropy, \
    sigmoid_focal_loss
from ..structures import Targets
from .matcher import MatcherConfig, match


@struct.dataclass
class CriterionConfig:
    num_classes: int  # dataset classes (no-object index == num_classes)
    matcher: MatcherConfig = MatcherConfig()
    weight_dict: dict = struct.field(pytree_node=False, default=None)
    eos_coef: float = 0.1
    focal_loss: bool = False
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    tracking: bool = False
    track_query_false_positive_eos_weight: bool = True
    losses: Tuple[str, ...] = ("labels", "boxes", "cardinality")


def _scatter_target_classes(outputs, targets: Targets, match_q: jnp.ndarray,
                            num_classes: int) -> jnp.ndarray:
    """(B, Qt) class targets: matched queries get their target's label,
    everything else no-object (== num_classes)."""
    b, qt, _ = outputs["pred_logits"].shape
    tc = jnp.full((b, qt), num_classes, jnp.int32)
    values = jnp.where(targets.valid, targets.labels, num_classes)
    bidx = jnp.arange(b)[:, None]
    return tc.at[bidx, match_q].set(values.astype(jnp.int32))


def _fal_pos_rows(outputs, targets: Targets) -> Optional[jnp.ndarray]:
    if targets.tq_valid is None:
        return None
    qt = outputs["pred_logits"].shape[1]
    k = targets.tq_valid.shape[1]
    fal_pos = targets.tq_fal_pos & targets.tq_valid
    return jnp.concatenate(
        [fal_pos, jnp.zeros((fal_pos.shape[0], qt - k), bool)], axis=1)


def loss_labels_ce(outputs, targets: Targets, match_q, num_boxes,
                   cfg: CriterionConfig) -> Dict[str, jnp.ndarray]:
    logits = outputs["pred_logits"]
    q_valid = outputs["query_valid"]
    tc = _scatter_target_classes(outputs, targets, match_q, cfg.num_classes)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]

    empty_weight = jnp.ones((cfg.num_classes + 1,)).at[-1].set(cfg.eos_coef)
    w = empty_weight[tc]
    loss = nll * w

    if cfg.tracking and cfg.track_query_false_positive_eos_weight:
        fal_pos = _fal_pos_rows(outputs, targets)
        if fal_pos is not None:
            # undo eos down-weighting for injected false positives
            # (reference detr.py:190-197)
            loss = jnp.where(fal_pos, loss / cfg.eos_coef, loss)
            tc_denom = jnp.where(fal_pos, 0, tc)
            w = empty_weight[tc_denom]

    loss = jnp.where(q_valid, loss, 0.0)
    denom = jnp.sum(jnp.where(q_valid, w, 0.0))
    out = {"loss_ce": jnp.sum(loss) / jnp.maximum(denom, 1e-6)}

    # class_error on matched real targets (logging)
    pred = jnp.argmax(logits, axis=-1)
    pred_at = jnp.take_along_axis(pred, match_q, axis=1)
    correct = (pred_at == targets.labels) & targets.valid
    n = jnp.maximum(jnp.sum(targets.valid), 1)
    out["class_error"] = 100.0 * (1.0 - jnp.sum(correct) / n)
    return out


def loss_labels_focal(outputs, targets: Targets, match_q, num_boxes,
                      cfg: CriterionConfig) -> Dict[str, jnp.ndarray]:
    logits = outputs["pred_logits"]  # (B, Qt, C)
    q_valid = outputs["query_valid"]
    tc = _scatter_target_classes(outputs, targets, match_q, cfg.num_classes)

    c = logits.shape[-1]
    # Reference focal semantics (detr.py:225-229 + __init__.py:109: the
    # criterion gets num_classes-1, so unmatched queries scatter a ONE at
    # the LAST logit column — an explicit background class under sigmoid
    # focal, not an all-zero row; the +1 column their scatter drops is one
    # past the head width).  Background index is always c-1 (CE heads are
    # c = classes+1 wide with no-object == classes == c-1, focal heads are
    # c = classes wide with background == c-1).
    tc = jnp.where(tc >= c, c - 1, tc)
    onehot = jax.nn.one_hot(tc, c, dtype=logits.dtype)
    prob = jax.nn.sigmoid(logits)
    ce = sigmoid_binary_cross_entropy(logits, onehot)
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    loss = ce * (1 - p_t) ** cfg.focal_gamma
    alpha_t = cfg.focal_alpha * onehot + (1 - cfg.focal_alpha) * (1 - onehot)
    loss = alpha_t * loss
    loss = jnp.where(q_valid[..., None], loss, 0.0)
    # reference reduction: loss.sum over (Q, C, B) / num_boxes
    out = {"loss_ce": jnp.sum(loss) / num_boxes}

    pred = jnp.argmax(logits, axis=-1)
    pred_at = jnp.take_along_axis(pred, match_q, axis=1)
    correct = (pred_at == targets.labels) & targets.valid
    n = jnp.maximum(jnp.sum(targets.valid), 1)
    out["class_error"] = 100.0 * (1.0 - jnp.sum(correct) / n)
    return out


def loss_cardinality(outputs, targets: Targets, match_q, num_boxes,
                     cfg: CriterionConfig) -> Dict[str, jnp.ndarray]:
    logits = outputs["pred_logits"]
    q_valid = outputs["query_valid"]
    not_empty = (jnp.argmax(logits, axis=-1) != logits.shape[-1] - 1) & q_valid
    card_pred = jnp.sum(not_empty, axis=1).astype(jnp.float32)
    tgt_len = jnp.sum(targets.valid, axis=1).astype(jnp.float32)
    return {"cardinality_error": jnp.mean(jnp.abs(card_pred - tgt_len))}


def loss_boxes(outputs, targets: Targets, match_q, num_boxes,
               cfg: CriterionConfig) -> Dict[str, jnp.ndarray]:
    boxes = outputs["pred_boxes"]  # (B, Qt, 4)
    src = jnp.take_along_axis(boxes, match_q[..., None], axis=1)  # (B, T, 4)
    tgt = targets.boxes
    valid = targets.valid

    l1 = jnp.sum(jnp.abs(src - tgt), axis=-1)
    l1 = jnp.where(valid, l1, 0.0)

    giou = box_ops.elementwise_generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(src), box_ops.box_cxcywh_to_xyxy(tgt))
    giou_loss = jnp.where(valid, 1.0 - giou, 0.0)

    return {"loss_bbox": jnp.sum(l1) / num_boxes,
            "loss_giou": jnp.sum(giou_loss) / num_boxes}


def loss_masks(outputs, targets: Targets, match_q, num_boxes,
               cfg: CriterionConfig):
    """Mask focal + dice on matched query slots (reference detr.py:330-358).
    Predicted masks are upsampled to the target mask resolution."""
    pred = outputs["pred_masks"]  # (B, Q, h, w)
    b = pred.shape[0]
    src = jnp.take_along_axis(pred, match_q[:, :, None, None], axis=1)
    tgt = targets.masks.astype(jnp.float32)  # (B, T, Hm, Wm)
    src = jax.image.resize(src, (b, src.shape[1]) + tuple(tgt.shape[-2:]),
                           method="bilinear")
    valid = targets.valid
    n, t = valid.shape
    src_f = src.reshape(n * t, -1)
    tgt_f = tgt.reshape(n * t, -1)
    v = valid.reshape(n * t)
    focal = sigmoid_focal_loss(
        jnp.where(v[:, None], src_f, 0.0)[None],
        jnp.where(v[:, None], tgt_f, 0.0)[None],
        num_boxes, alpha=0.25, gamma=2.0)
    dice = dice_loss(src_f, tgt_f, num_boxes, valid=v)
    return {"loss_mask": focal, "loss_dice": dice}


LOSS_MAP = {
    "boxes": loss_boxes,
    "cardinality": loss_cardinality,
    "masks": loss_masks,
}


def compute_losses(outputs: Dict, targets: Targets, cfg: CriterionConfig,
                   num_boxes: Optional[jnp.ndarray] = None
                   ) -> Dict[str, jnp.ndarray]:
    """Full criterion: match + losses for final, aux, and enc outputs.

    `num_boxes` should be the cross-device-normalized target count
    (train step: clamp(psum(valid)/n_dev, 1)); defaults to the local count.
    """
    if num_boxes is None:
        num_boxes = jnp.maximum(jnp.sum(targets.valid).astype(jnp.float32),
                                1.0)
    label_fn = loss_labels_focal if cfg.focal_loss else loss_labels_ce

    def run(outs, tgts, prefix="", with_masks=False, log=True):
        match_q = match(outs, tgts, cfg.matcher)
        d = {}
        for name in cfg.losses:
            if name == "labels":
                ld = label_fn(outs, tgts, match_q, num_boxes, cfg)
                if not log:
                    ld.pop("class_error", None)
            elif name == "masks":
                # aux/enc outputs carry no masks (reference detr.py:414-416)
                if not with_masks or "pred_masks" not in outs:
                    continue
                ld = loss_masks(outs, tgts, match_q, num_boxes, cfg)
            else:
                ld = LOSS_MAP[name](outs, tgts, match_q, num_boxes, cfg)
            d.update({k + prefix: v for k, v in ld.items()})
        return d

    losses = run(outputs, targets, with_masks=True)
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        losses.update(run(aux, targets, prefix=f"_{i}", log=False))
    if "enc_outputs" in outputs:
        enc = dict(outputs["enc_outputs"])
        enc.setdefault("query_valid",
                       jnp.ones(enc["pred_logits"].shape[:2], bool))
        bin_targets = targets.replace(labels=jnp.zeros_like(targets.labels))
        losses.update(run(enc, bin_targets, prefix="_enc", log=False))
    return losses
