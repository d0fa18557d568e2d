"""Batched multi-sequence tracking: vmap the jitted tracker step over B
sequences for offline evaluation throughput.

The per-frame step (tracking/tracker.py) is a pure function of
(state, frame, ...) — vmapping it batches the model forward (backbone /
encoder / decoder run at batch B, far better MXU utilization than the
reference's one-sequence-at-a-time loop) while every sequence keeps its own
slot state, ids and results. Sequences are grouped by padded frame shape;
shorter sequences keep stepping on their last frame with results discarded.

Masks (MOTS) and attention maps ride the same path as the unbatched
Tracker (reference per-frame carry: tracker.py:509-541): per-track mask
probabilities / attention maps come back in `frame_results` and are
accumulated per frame. Host-side frame assembly for frame t+1 overlaps the
device computation of frame t (jax dispatch is async; the blocking
readback happens only after the next frame's numpy stack is built).
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
                 overflow_boxes: bool = False, with_masks: bool = False,
                 postprocess_segm: Optional[Callable] = None,
                 mask_hw=None, attn_hw=None):
        self.cfg = TrackerConfig.from_dict(
            {**tracker_cfg, "num_object_queries": num_object_queries,
             "overflow_boxes": overflow_boxes, "with_masks": with_masks})
        self.params = params
        self.hidden_dim = hidden_dim
        self.mask_hw = mask_hw
        # concrete (h, w) only — the unbatched Tracker's "auto" probe is a
        # host round trip that has no place in the throughput path
        assert attn_hw is None or isinstance(attn_hw, tuple), attn_hw
        self.attn_hw = attn_hw
        # natively-batched model call + vmapped per-sequence logic
        # (vmapping the WHOLE step de-optimizes the fused MSDA gather)
        self._apply_fn = apply_fn
        self._step = make_tracker_step(apply_fn, postprocess, self.cfg,
                                       postprocess_segm=postprocess_segm,
                                       batched=True)

    def run(self, sequences: List, frame_range=(0.0, 1.0),
            logger: Optional[Callable] = None) -> List[Dict]:
        """Track all sequences (must share padded frame shape) in lockstep.
        Returns per-sequence results dicts."""
        from ..structures import FrameBatch

        b = len(sequences)
        spans = []
        for seq in sequences:
            n = len(seq)
            spans.append((int(n * frame_range[0]), int(n * frame_range[1])))
        lengths = [e - s for s, e in spans]
        max_len = max(lengths)

        results = [dict() for _ in range(b)]
        prev_feats = None
        p_max = 128

        def assemble(t):
            """Build frame t's device inputs from the per-sequence blobs
            (host work — overlapped with the previous step's device
            compute)."""
            imgs, masks, sizes, pubs, pubv = [], [], [], [], []
            for i, seq in enumerate(sequences):
                s, e = spans[i]
                blob = seq[min(s + t, e - 1)]
                imgs.append(np.asarray(blob["batch"].images))
                masks.append(np.asarray(blob["batch"].mask))
                sizes.append(np.asarray(blob["orig_size"]))
                dets = np.asarray(blob.get("dets", np.zeros((0, 4))),
                                  np.float32).reshape(-1, 4)[:p_max]
                pb = np.zeros((p_max, 4), np.float32)
                pv = np.zeros((p_max,), bool)
                pb[:len(dets)] = dets
                pv[:len(dets)] = True
                pubs.append(pb)
                pubv.append(pv)
            batch = FrameBatch(
                images=jnp.asarray(np.concatenate(imgs, axis=0)),
                mask=jnp.asarray(np.concatenate(masks, axis=0)))
            return (batch, jnp.asarray(np.concatenate(sizes, axis=0)),
                    jnp.asarray(np.stack(pubs)), jnp.asarray(np.stack(pubv)))

        pending = assemble(0)
        if self.cfg.with_masks and self.mask_hw is None:
            # probe the mask-head resolution once per group (one 1-frame
            # forward), mirroring the unbatched Tracker's auto probe
            probe_batch = FrameBatch(images=pending[0].images[:1],
                                     mask=pending[0].mask[:1])
            out, _, _, _, _ = self._apply_fn(self.params, probe_batch, None,
                                             None)
            self.mask_hw = tuple(np.asarray(out["pred_masks"]).shape[-2:])
        states = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[init_state(self.cfg.max_tracks, self.hidden_dim,
                         self.mask_hw if self.cfg.with_masks else None,
                         self.attn_hw)
              for _ in range(b)])
        for t in range(max_len):
            batch, sizes, pubs, pubv = pending
            states, frame_results, prev_feats = self._step(
                self.params, states, batch, sizes, pubs, pubv, prev_feats)
            if t + 1 < max_len:
                # dispatch is async: this numpy assembly runs while the
                # device computes frame t
                pending = assemble(t + 1)

            ids = np.asarray(frame_results["ids"])
            boxes = np.asarray(frame_results["boxes"])
            scores = np.asarray(frame_results["scores"])
            obj_ind = np.asarray(frame_results["obj_ind"])
            out_masks = (np.asarray(frame_results["masks"])
                         if "masks" in frame_results else None)
            out_attn = (np.asarray(frame_results["attention_maps"])
                        if "attention_maps" in frame_results else None)
            for i in range(b):
                if t >= lengths[i]:
                    continue
                for slot in np.nonzero(ids[i] >= 0)[0]:
                    tid = int(ids[i][slot])
                    entry = {"bbox": boxes[i][slot],
                             "score": float(scores[i][slot]),
                             "obj_ind": int(obj_ind[i][slot])}
                    if out_masks is not None:
                        entry["mask"] = out_masks[i][slot]
                    if out_attn is not None:
                        entry["attention_map"] = out_attn[i][slot]
                    results[i].setdefault(tid, {})[t] = entry
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
