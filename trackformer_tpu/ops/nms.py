"""Fixed-shape greedy NMS and greedy assignment ops for the tracker.

The reference uses torchvision `nms` / `box_iou` plus Python loops
(/root/reference/src/trackformer/models/tracker.py:395-412, 485-503,
124-165). Here they are masked O(N^2) lax loops over fixed slot counts so
the whole tracker step stays inside one jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .box_ops import box_iou


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS; returns keep mask (N,). Matches torchvision semantics:
    highest score first, suppress valid boxes with IoU > threshold."""
    n = boxes.shape[0]
    iou, _ = box_iou(boxes, boxes, eps=1e-9)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(i, carry):
        keep, suppressed = carry
        idx = order[i]
        is_live = valid[idx] & ~suppressed[idx]
        keep = keep.at[idx].set(is_live)
        sup_new = (iou[idx] > iou_threshold) & valid & is_live
        sup_new = sup_new.at[idx].set(False)
        return keep, suppressed | sup_new

    # fully unrolled: n is a small static slot count (<=128) and each step
    # is a handful of vector ops, so the sequential fori_loop was pure
    # per-iteration dispatch latency; unrolling fuses it into one kernel
    keep, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((n,), bool), jnp.zeros((n,), bool)),
        unroll=True)
    return keep


def greedy_assign_by_column(score_matrix: jnp.ndarray,
                            row_valid: jnp.ndarray,
                            col_valid: jnp.ndarray,
                            accept_fn,
                            maximize: bool = True) -> jnp.ndarray:
    """Greedy per-column assignment (reference public-detection filters,
    tracker.py:124-165): for each valid column j, pick the best remaining
    row i; if accept_fn(value, i) the row is marked and removed.

    Returns (R,) bool mask of rows that won some column.
    """
    r, c = score_matrix.shape
    bad = -jnp.inf if maximize else jnp.inf

    def body(j, carry):
        assigned, taken = carry
        col = jnp.where(row_valid & ~taken, score_matrix[:, j], bad)
        i = (jnp.argmax(col) if maximize else jnp.argmin(col)).astype(jnp.int32)
        val = col[i]
        ok = col_valid[j] & accept_fn(val, i) & jnp.isfinite(val)
        assigned = assigned.at[i].max(ok)
        taken = taken.at[i].max(ok)
        return assigned, taken

    assigned, _ = jax.lax.fori_loop(
        0, c, body, (jnp.zeros((r,), bool), jnp.zeros((r,), bool)),
        unroll=8)
    return assigned
