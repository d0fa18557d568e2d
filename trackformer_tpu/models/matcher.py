"""Hungarian matcher on padded targets, fully on-device.

Parity target: /root/reference/src/trackformer/models/matcher.py:41-131 —
class/L1/GIoU cost matrix with track-query constraints (:108-125): false
positive track queries are unmatchable; a matched track query is pinned to
its target (cost -1) and that target is blocked for every other query.

The reference moves the cost matrix to CPU and runs scipy per image; here the
cost matrix stays on device, constraints are applied as vectorized masks over
fixed (Qt, T) shapes, and the exact JV solver (ops/assignment.py) runs under
vmap inside the jitted step. Padded target slots get constant cost (provably
neutral to the optimum); padded/invalid query slots are blocked from real
targets.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import box_ops
from ..ops.assignment import BIG, hungarian
from ..structures import Targets


@struct.dataclass
class MatcherConfig:
    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    focal_loss: bool = False
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


def _cost_matrix(outputs: Dict, targets: Targets,
                 cfg: MatcherConfig) -> jnp.ndarray:
    """(B, Qt, T) combined cost, before track-query/padding constraints."""
    logits = outputs["pred_logits"]  # (B, Qt, C)
    boxes = outputs["pred_boxes"]  # (B, Qt, 4)
    tgt_ids = targets.labels  # (B, T)
    tgt_boxes = targets.boxes  # (B, T, 4)

    if cfg.focal_loss:
        prob = jax.nn.sigmoid(logits)
        neg = (1 - cfg.focal_alpha) * (prob ** cfg.focal_gamma) * (
            -jnp.log1p(-prob + 1e-8))
        pos = cfg.focal_alpha * ((1 - prob) ** cfg.focal_gamma) * (
            -jnp.log(prob + 1e-8))
        cost_class = (jnp.take_along_axis(pos, tgt_ids[:, None, :], axis=2)
                      - jnp.take_along_axis(neg, tgt_ids[:, None, :], axis=2))
    else:
        prob = jax.nn.softmax(logits, axis=-1)
        cost_class = -jnp.take_along_axis(prob, tgt_ids[:, None, :], axis=2)

    cost_bbox = jnp.sum(
        jnp.abs(boxes[:, :, None, :] - tgt_boxes[:, None, :, :]), axis=-1)
    cost_giou = -box_ops.generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(boxes),
        box_ops.box_cxcywh_to_xyxy(tgt_boxes))

    return (cfg.cost_bbox * cost_bbox + cfg.cost_class * cost_class
            + cfg.cost_giou * cost_giou)


def _apply_constraints(cost: jnp.ndarray, query_valid: jnp.ndarray,
                       targets: Targets) -> jnp.ndarray:
    """Apply padding + track-query constraints to one batch of costs."""
    b, qt, t = cost.shape
    t_valid = targets.valid  # (B, T)

    # padded target slots: constant 0 (neutral); invalid queries can't take
    # real targets
    cost = jnp.where(t_valid[:, None, :], cost, 0.0)
    cost = jnp.where((~query_valid[:, :, None]) & t_valid[:, None, :],
                     BIG, cost)

    if targets.tq_valid is not None:
        k = targets.tq_valid.shape[1]
        fal_pos = targets.tq_fal_pos & targets.tq_valid  # (B, K)
        pad = jnp.zeros((b, qt - k), bool)
        fal_pos_rows = jnp.concatenate([fal_pos, pad], axis=1)
        cost = jnp.where(fal_pos_rows[:, :, None] & t_valid[:, None, :],
                         BIG, cost)

        pinned = (targets.tq_valid & ~targets.tq_fal_pos
                  & (targets.tq_match_idx >= 0))  # (B, K)
        pin_t = jnp.clip(targets.tq_match_idx, 0, t - 1)
        onehot_k = jax.nn.one_hot(pin_t, t, dtype=bool) & pinned[..., None]
        pin_onehot = jnp.concatenate(
            [onehot_k, jnp.zeros((b, qt - k, t), bool)], axis=1)  # (B,Qt,T)
        pinned_rows = jnp.concatenate([pinned, pad], axis=1)  # (B, Qt)
        pinned_cols = jnp.any(onehot_k, axis=1)  # (B, T)

        cost = jnp.where(pinned_rows[:, :, None] & ~pin_onehot, BIG, cost)
        cost = jnp.where(pinned_cols[:, None, :] & ~pin_onehot, BIG, cost)
        cost = jnp.where(pin_onehot, -1.0, cost)
    return cost


def match(outputs: Dict, targets: Targets,
          cfg: MatcherConfig) -> jnp.ndarray:
    """Return (B, T) int32: query index matched to each target slot.

    Entries for invalid target slots are meaningless (mask with
    targets.valid). Requires T <= Qt.
    """
    query_valid = outputs.get("query_valid")
    if query_valid is None:
        query_valid = jnp.ones(outputs["pred_logits"].shape[:2], bool)
    cost = _cost_matrix(outputs, targets, cfg)
    cost = _apply_constraints(cost, query_valid, targets)
    # orient rows = targets (R <= C) and solve exactly
    cost_tq = jnp.swapaxes(cost, 1, 2)  # (B, T, Qt)
    assert cost_tq.shape[1] <= cost_tq.shape[2], (
        f"max_objects ({cost_tq.shape[1]}) must be <= total queries "
        f"({cost_tq.shape[2]})")
    return jax.vmap(hungarian)(cost_tq)
