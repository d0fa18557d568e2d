"""Loss primitives: sigmoid focal loss, dice loss, inverse sigmoid.

Semantics match the reference `util/misc.py`
(/root/reference/src/trackformer/util/misc.py:515-571) but are written as
masked fixed-shape jnp ops: instead of boolean indexing over ragged targets,
every function takes an optional validity mask and zeroes padded entries.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1) - jnp.log(x2)


def sigmoid_binary_cross_entropy(logits: jnp.ndarray,
                                 labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE-with-logits, numerically stable."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits: jnp.ndarray,
                       targets: jnp.ndarray,
                       num_boxes: jnp.ndarray,
                       alpha: float = 0.25,
                       gamma: float = 2.0,
                       query_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """RetinaNet focal loss, reduced as `loss.mean(axis=1).sum() / num_boxes`.

    logits/targets: [B, Q, C]; query_mask: optional [B, Q] bool marking valid
    query slots (padded slots contribute 0 and are excluded from the mean).
    """
    prob = jax.nn.sigmoid(logits)
    ce = sigmoid_binary_cross_entropy(logits, targets)
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss

    if query_mask is not None:
        loss = loss * query_mask[..., None]
        denom = jnp.maximum(jnp.sum(query_mask, axis=1), 1.0)
        per_image = jnp.sum(loss, axis=(1, 2)) / denom
    else:
        per_image = jnp.mean(jnp.sum(loss, axis=2), axis=1)
    return jnp.sum(per_image) / num_boxes


def dice_loss(logits: jnp.ndarray,
              targets: jnp.ndarray,
              num_boxes: jnp.ndarray,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """DICE/F-1 loss for masks. logits/targets: [N, ...] flattened per row.

    `valid`: optional [N] bool; invalid rows contribute 0 (reference sums all
    rows then divides by num_boxes, /root/reference/src/trackformer/util/misc.py:522-537).
    """
    probs = jax.nn.sigmoid(logits).reshape(logits.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    numerator = 2.0 * jnp.sum(probs * targets, axis=1)
    denominator = jnp.sum(probs, axis=1) + jnp.sum(targets, axis=1)
    loss = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    if valid is not None:
        loss = loss * valid
    return jnp.sum(loss) / num_boxes
