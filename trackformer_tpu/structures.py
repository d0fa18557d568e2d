"""Static-shape batch structures.

The reference batches ragged images with `NestedTensor` (pad-to-batch-max,
/root/reference/src/trackformer/util/misc.py:309-365) and keeps per-image
targets as ragged dicts. On TPU both become fixed-shape pytrees:

  * `FrameBatch` — images padded to a bucketed (H, W) with a bool pad mask
    (True = padding, matching the reference mask convention);
  * `Targets` — per-image object annotations padded to `max_objects` slots
    with a validity mask;
  * track-query fields padded to a fixed `max_track_queries` capacity.

Everything is a flax.struct dataclass, so the whole batch flows through jit
/ shard_map as one pytree.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class FrameBatch:
    """A batch of padded frames. images: (B, H, W, 3) NHWC; mask: (B, H, W)
    bool, True on padded pixels."""
    images: jnp.ndarray
    mask: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]

    @classmethod
    def from_images(cls, images: jnp.ndarray,
                    valid_hw: Optional[jnp.ndarray] = None) -> "FrameBatch":
        """Build from (B, H, W, 3) images; valid_hw (B, 2) gives the unpadded
        (h, w) of each image (defaults to fully valid)."""
        b, h, w, _ = images.shape
        if valid_hw is None:
            mask = jnp.zeros((b, h, w), dtype=bool)
        else:
            ys = jnp.arange(h)[None, :, None]
            xs = jnp.arange(w)[None, None, :]
            mask = (ys >= valid_hw[:, 0][:, None, None]) | (
                xs >= valid_hw[:, 1][:, None, None])
        return cls(images=images, mask=mask)


@struct.dataclass
class Targets:
    """Padded per-image ground truth + track-query state.

    Object slots (T = max_objects):
      labels (B, T) int32; boxes (B, T, 4) normalized cxcywh; valid (B, T);
      track_ids (B, T) int32 (-1 when absent); area (B, T); iscrowd (B, T);
      masks optional (B, T, Hm, Wm) binary.

    Track-query slots (K = max_track_queries), populated in tracking mode
    (reference ragged equivalents: detr_tracking.py:162-183):
      tq_hs_embeds (B, K, C); tq_boxes (B, K, 4) cxcywh;
      tq_valid (B, K) — slot carries a track query;
      tq_fal_pos (B, K) — injected false positive;
      tq_match_idx (B, K) int32 — target slot this query is pinned to (-1).
    """
    labels: jnp.ndarray
    boxes: jnp.ndarray
    valid: jnp.ndarray
    track_ids: jnp.ndarray
    orig_size: jnp.ndarray  # (B, 2) original (h, w) pre-augmentation
    size: jnp.ndarray  # (B, 2) valid (h, w) after augmentation, pre-bucket-pad
    image_id: jnp.ndarray  # (B,)
    area: Optional[jnp.ndarray] = None
    iscrowd: Optional[jnp.ndarray] = None
    masks: Optional[jnp.ndarray] = None

    tq_hs_embeds: Optional[jnp.ndarray] = None
    tq_boxes: Optional[jnp.ndarray] = None
    tq_valid: Optional[jnp.ndarray] = None
    tq_fal_pos: Optional[jnp.ndarray] = None
    tq_match_idx: Optional[jnp.ndarray] = None

    @property
    def batch_size(self) -> int:
        return self.labels.shape[0]

    @property
    def max_objects(self) -> int:
        return self.labels.shape[1]

    @property
    def num_track_queries(self) -> int:
        return 0 if self.tq_valid is None else self.tq_valid.shape[1]

    def with_track_queries(self, hs_embeds, boxes, valid, fal_pos=None,
                           match_idx=None) -> "Targets":
        k = hs_embeds.shape[1]
        b = self.batch_size
        if fal_pos is None:
            fal_pos = jnp.zeros((b, k), dtype=bool)
        if match_idx is None:
            match_idx = jnp.full((b, k), -1, dtype=jnp.int32)
        return self.replace(tq_hs_embeds=hs_embeds, tq_boxes=boxes,
                            tq_valid=valid, tq_fal_pos=fal_pos,
                            tq_match_idx=match_idx)


def empty_targets(batch_size: int, max_objects: int,
                  mask_hw: Optional[tuple] = None) -> Targets:
    """All-padding Targets (used for pure-detection forward passes)."""
    b, t = batch_size, max_objects
    return Targets(
        labels=jnp.zeros((b, t), jnp.int32),
        boxes=jnp.zeros((b, t, 4), jnp.float32),
        valid=jnp.zeros((b, t), bool),
        track_ids=jnp.full((b, t), -1, jnp.int32),
        orig_size=jnp.ones((b, 2), jnp.int32),
        size=jnp.ones((b, 2), jnp.int32),
        image_id=jnp.zeros((b,), jnp.int32),
        area=jnp.zeros((b, t), jnp.float32),
        iscrowd=jnp.zeros((b, t), jnp.int32),
        masks=None if mask_hw is None else jnp.zeros((b, t) + tuple(mask_hw), bool),
    )
