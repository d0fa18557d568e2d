"""Batched multi-sequence tracking: vmap the jitted tracker step over B
sequences for offline evaluation throughput.

The per-frame step (tracking/tracker.py) is a pure function of
(state, frame, ...) — vmapping it batches the model forward (backbone /
encoder / decoder run at batch B, far better MXU utilization than the
reference's one-sequence-at-a-time loop) while every sequence keeps its own
slot state, ids and results. Sequences are grouped by padded frame shape;
shorter sequences keep stepping on their last frame with results discarded.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .tracker import TrackerConfig, init_state, make_tracker_step


class BatchedTracker:
    def __init__(self, params, apply_fn, postprocess, tracker_cfg: dict,
                 hidden_dim: int, num_object_queries: int,
                 overflow_boxes: bool = False):
        self.cfg = TrackerConfig.from_dict(
            {**tracker_cfg, "num_object_queries": num_object_queries,
             "overflow_boxes": overflow_boxes})
        self.params = params
        self.hidden_dim = hidden_dim
        # natively-batched model call + vmapped per-sequence logic
        # (vmapping the WHOLE step de-optimizes the fused MSDA gather)
        self._step = make_tracker_step(apply_fn, postprocess, self.cfg,
                                       batched=True)

    def run(self, sequences: List, frame_range=(0.0, 1.0),
            logger: Optional[Callable] = None) -> List[Dict]:
        """Track all sequences (must share padded frame shape) in lockstep.
        Returns per-sequence results dicts."""
        b = len(sequences)
        spans = []
        for seq in sequences:
            n = len(seq)
            spans.append((int(n * frame_range[0]), int(n * frame_range[1])))
        lengths = [e - s for s, e in spans]
        max_len = max(lengths)

        states = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[init_state(self.cfg.max_tracks, self.hidden_dim)
              for _ in range(b)])
        results = [dict() for _ in range(b)]
        prev_feats = None
        p_max = 128

        for t in range(max_len):
            imgs, masks, sizes, pubs, pubv = [], [], [], [], []
            for i, seq in enumerate(sequences):
                s, e = spans[i]
                blob = seq[min(s + t, e - 1)]
                imgs.append(np.asarray(blob["batch"].images))
                masks.append(np.asarray(blob["batch"].mask))
                sizes.append(np.asarray(blob["orig_size"]))
                dets = np.asarray(blob.get("dets",
                                           np.zeros((0, 4))),
                                  np.float32).reshape(-1, 4)[:p_max]
                pb = np.zeros((p_max, 4), np.float32)
                pv = np.zeros((p_max,), bool)
                pb[:len(dets)] = dets
                pv[:len(dets)] = True
                pubs.append(pb)
                pubv.append(pv)
            from ..structures import FrameBatch
            batch = FrameBatch(
                images=jnp.asarray(np.concatenate(imgs, axis=0)),
                mask=jnp.asarray(np.concatenate(masks, axis=0)))
            states, frame_results, prev_feats = self._step(
                self.params, states, batch,
                jnp.asarray(np.concatenate(sizes, axis=0)),
                jnp.asarray(np.stack(pubs)), jnp.asarray(np.stack(pubv)),
                prev_feats)

            ids = np.asarray(frame_results["ids"])
            boxes = np.asarray(frame_results["boxes"])
            scores = np.asarray(frame_results["scores"])
            for i in range(b):
                if t >= lengths[i]:
                    continue
                for slot in np.nonzero(ids[i] >= 0)[0]:
                    tid = int(ids[i][slot])
                    results[i].setdefault(tid, {})[t] = {
                        "bbox": boxes[i][slot],
                        "score": float(scores[i][slot])}
            if logger:
                logger(t, max_len)
        return results


def group_by_shape(sequences: List, batch_size: int) -> List[List]:
    """Group sequences into batches of equal padded frame shape."""
    by_shape: Dict = {}
    for seq in sequences:
        shape = tuple(np.asarray(seq[0]["batch"].images).shape)
        by_shape.setdefault(shape, []).append(seq)
    groups = []
    for seqs in by_shape.values():
        for i in range(0, len(seqs), batch_size):
            groups.append(seqs[i:i + batch_size])
    return groups
