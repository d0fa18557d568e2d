"""Online multi-object tracker: fixed-slot state machine under jit.

Parity target: /root/reference/src/trackformer/models/tracker.py:16-584 —
per-frame `step()` that feeds live + inactive tracks back as track queries,
thresholds/terminates/revives tracks, filters new detections (score, public
detections, ReID), runs two NMS passes and accumulates per-frame results.

TPU redesign: the reference's Python list-of-Track control flow becomes a
`TrackerState` pytree with S fixed slots and masks:
  * a slot is `active`, `inactive`, or free (neither);
  * every per-track list operation is a masked vector op;
  * one jitted `step` does model forward + all track logic on device;
  * the host shell only converts images, keeps the prev-feature deque, and
    appends per-frame results (ids/boxes/scores) to the results dict.

Semantics deviations (documented):
  * new tracks fill free slots; if more kept detections than free slots the
    lowest-index surplus detections are dropped (the reference list grows
    unboundedly — capacity must be configured generously);
  * mask overlap resolution happens at the mask-head output resolution
    (stride 4) instead of the original image resolution.
"""
from __future__ import annotations

from collections import deque
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import box_ops
from ..ops.assignment import BIG, hungarian_rect
from ..ops.nms import greedy_assign_by_column, nms_mask
from ..structures import FrameBatch, empty_targets


@struct.dataclass
class TrackerConfig:
    detection_obj_score_thresh: float = 0.4
    track_obj_score_thresh: float = 0.4
    detection_nms_thresh: float = 0.9
    track_nms_thresh: float = 0.9
    public_detections: Any = struct.field(pytree_node=False, default=False)
    inactive_patience: float = -1.0
    reid_sim_threshold: float = 0.0
    reid_sim_only: bool = struct.field(pytree_node=False, default=False)
    reid_score_thresh: float = 0.4
    reid_greedy_matching: bool = struct.field(pytree_node=False, default=False)
    prev_frame_dist: int = struct.field(pytree_node=False, default=1)
    steps_termination: int = struct.field(pytree_node=False, default=1)
    max_tracks: int = struct.field(pytree_node=False, default=150)
    num_object_queries: int = struct.field(pytree_node=False, default=300)
    overflow_boxes: bool = struct.field(pytree_node=False, default=False)
    with_masks: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def from_dict(cls, d: dict, **kw):
        fields = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in fields}, **kw)


@struct.dataclass
class TrackerState:
    boxes: jnp.ndarray  # (S, 4) absolute xyxy
    scores: jnp.ndarray  # (S,)
    hs: jnp.ndarray  # (S, C)
    ids: jnp.ndarray  # (S,) int32, -1 when free
    obj_ind: jnp.ndarray  # (S,) int32 query index at creation
    active: jnp.ndarray  # (S,) bool
    inactive: jnp.ndarray  # (S,) bool
    count_inactive: jnp.ndarray  # (S,) int32
    count_term: jnp.ndarray  # (S,) int32
    next_id: jnp.ndarray  # () int32
    num_reids: jnp.ndarray  # () int32
    masks: Optional[jnp.ndarray] = None  # (S, Hm, Wm) probs
    attn_maps: Optional[jnp.ndarray] = None  # (S, Ha, Wa) attention maps


def init_state(max_tracks: int, hidden_dim: int,
               mask_hw: Optional[tuple] = None,
               attn_hw: Optional[tuple] = None) -> TrackerState:
    s = max_tracks
    return TrackerState(
        boxes=jnp.zeros((s, 4), jnp.float32),
        scores=jnp.zeros((s,), jnp.float32),
        hs=jnp.zeros((s, hidden_dim), jnp.float32),
        ids=jnp.full((s,), -1, jnp.int32),
        obj_ind=jnp.full((s,), -1, jnp.int32),
        active=jnp.zeros((s,), bool),
        inactive=jnp.zeros((s,), bool),
        count_inactive=jnp.zeros((s,), jnp.int32),
        count_term=jnp.zeros((s,), jnp.int32),
        next_id=jnp.int32(0),
        num_reids=jnp.int32(0),
        masks=None if mask_hw is None else jnp.zeros((s,) + tuple(mask_hw),
                                                     jnp.float32),
        attn_maps=None if attn_hw is None else jnp.zeros(
            (s,) + tuple(attn_hw), jnp.float32),
    )


def _positive_area(boxes):
    return (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])


def _prune_inactive(state: TrackerState, cfg: TrackerConfig) -> TrackerState:
    """Drop inactive slots past patience or with degenerate boxes
    (reference tracker.py:270-273)."""
    keep = (_positive_area(state.boxes)
            & (state.count_inactive <= cfg.inactive_patience))
    drop = state.inactive & ~keep
    return state.replace(
        inactive=state.inactive & ~drop,
        ids=jnp.where(drop, -1, state.ids))


def _scatter_new_tracks(state: TrackerState, det_keep, det_boxes, det_scores,
                        det_hs, det_masks, cfg: TrackerConfig,
                        det_attn=None):
    """Occupy free slots with kept detections (reference add_tracks :93-122).

    Invalid writes are routed to a dummy extra slot then dropped.
    """
    s = cfg.max_tracks
    free = ~(state.active | state.inactive)
    n_free = jnp.sum(free)
    # free slot positions in ascending slot order
    slot_order = jnp.argsort(jnp.where(free, jnp.arange(s), s + 1))
    rank = jnp.cumsum(det_keep) - 1  # (Q,) 0-based rank among kept
    ok = det_keep & (rank < n_free)
    slot = jnp.where(ok, slot_order[jnp.clip(rank, 0, s - 1)], s)  # s = dummy

    def pad(x):
        return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)

    new_ids = (state.next_id + rank).astype(jnp.int32)
    q = det_keep.shape[0]
    obj_inds = jnp.arange(q, dtype=jnp.int32)

    boxes = pad(state.boxes).at[slot].set(det_boxes)[:s]
    scores = pad(state.scores).at[slot].set(det_scores)[:s]
    hs = pad(state.hs).at[slot].set(det_hs)[:s]
    ids = pad(state.ids).at[slot].set(new_ids)[:s]
    obj_ind = pad(state.obj_ind).at[slot].set(obj_inds)[:s]
    active = pad(state.active).at[slot].set(True)[:s]
    count_term = pad(state.count_term).at[slot].set(0)[:s]
    count_inactive = pad(state.count_inactive).at[slot].set(0)[:s]
    masks = state.masks
    if masks is not None and det_masks is not None:
        masks = pad(masks).at[slot].set(det_masks)[:s]
    attn_maps = state.attn_maps
    if attn_maps is not None and det_attn is not None:
        attn_maps = pad(attn_maps).at[slot].set(det_attn)[:s]
    n_new = jnp.sum(ok).astype(jnp.int32)
    new_track_mask = jnp.zeros((s,), bool)
    new_track_mask = pad(new_track_mask).at[slot].set(True)[:s]
    return state.replace(
        boxes=boxes, scores=scores, hs=hs, ids=ids, obj_ind=obj_ind,
        active=active, count_term=count_term, count_inactive=count_inactive,
        next_id=state.next_id + n_new, masks=masks,
        attn_maps=attn_maps), new_track_mask


def _public_detections_mask(cfg: TrackerConfig, det_boxes, det_keep,
                            public_boxes, public_valid):
    """Filter kept detections against provided public detections
    (reference tracker.py:124-165)."""
    mode = cfg.public_detections
    if not mode:
        return det_keep
    if mode == "center_distance":
        det_c = box_ops.box_xyxy_to_cxcywh(det_boxes)[:, :2]
        pub_c = box_ops.box_xyxy_to_cxcywh(public_boxes)[:, :2]
        d = det_c[:, None] - pub_c[None]
        dist = jnp.sum(d * d, axis=-1)  # (D, P)
        area = box_ops.box_area(det_boxes)
        assigned = greedy_assign_by_column(
            dist, det_keep, public_valid,
            accept_fn=lambda v, i: v < area[i], maximize=False)
    elif mode == "min_iou_0_5":
        iou, _ = box_ops.box_iou(det_boxes, public_boxes, eps=1e-9)
        assigned = greedy_assign_by_column(
            iou, det_keep, public_valid,
            accept_fn=lambda v, i: v >= 0.5, maximize=True)
    else:
        raise NotImplementedError(f"public_detections={mode!r}")
    return det_keep & assigned


def _reid(state: TrackerState, det_boxes, det_scores, det_hs, det_masks,
          det_keep, cfg: TrackerConfig):
    """Revive inactive tracks from remaining detections
    (reference tracker.py:167-264). Returns (state, det_keep).

    Skipped entirely (lax.cond) when no slot is inactive or no detection
    remains — the assignment solver's while_loops are the only sequential
    cost in the step."""
    def no_op(args):
        st, _, _, _, _, dk = args
        return st, dk

    def run(args):
        return _reid_impl(*args, cfg=cfg)

    return jax.lax.cond(
        jnp.any(state.inactive) & jnp.any(det_keep), run, no_op,
        (state, det_boxes, det_scores, det_hs, det_masks, det_keep))


def _reid_impl(state: TrackerState, det_boxes, det_scores, det_hs,
               det_masks, det_keep, cfg: TrackerConfig = None):
    s = cfg.max_tracks
    inact = state.inactive

    if cfg.reid_greedy_matching:
        t_c = box_ops.box_xyxy_to_cxcywh(state.boxes)
        d_c = box_ops.box_xyxy_to_cxcywh(det_boxes)
        dd = t_c[:, None, :2] - d_c[None, :, :2]
        dist = jnp.sum(dd * dd, axis=-1)
        track_size = t_c[:, 2] * t_c[:, 3]
        item_size = d_c[:, 2] * d_c[:, 3]
        invalid = (dist > track_size[:, None]) | (dist > item_size[None, :])
        dist = dist + invalid * 1e18
        dist = jnp.where(inact[:, None] & det_keep[None, :], dist, jnp.inf)

        # greedy per inactive row (reference :197-209)
        def body(i, carry):
            revive_det, taken = carry
            row = jnp.where(taken, jnp.inf, dist[i])
            j = jnp.argmin(row).astype(jnp.int32)
            ok = inact[i] & (row[j] < 1e16)
            revive_det = revive_det.at[i].set(jnp.where(ok, j, -1))
            taken = taken.at[j].max(ok)
            return revive_det, taken

        revive_det, _ = jax.lax.fori_loop(
            0, s, body,
            (jnp.full((s,), -1, jnp.int32), jnp.zeros_like(det_keep)),
            unroll=True)
    else:
        # hs-embed L2 distance + optimal assignment (reference :212-230)
        diff = state.hs[:, None] - det_hs[None]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        cost = jnp.where(inact[:, None] & det_keep[None, :], dist, BIG)
        col4row = hungarian_rect(cost)  # (S,), -1 when unassigned
        col_safe = jnp.clip(col4row, 0, dist.shape[1] - 1)
        pair_d = jnp.take_along_axis(dist, col_safe[:, None], axis=1)[:, 0]
        ok = inact & (col4row >= 0) & (pair_d <= cfg.reid_sim_threshold) & \
            det_keep[col_safe]
        revive_det = jnp.where(ok, col4row, -1)

    reviving = revive_det >= 0
    det_idx = jnp.clip(revive_det, 0, det_boxes.shape[0] - 1)
    state = state.replace(
        boxes=jnp.where(reviving[:, None], det_boxes[det_idx], state.boxes),
        scores=jnp.where(reviving, det_scores[det_idx], state.scores),
        hs=jnp.where(reviving[:, None], det_hs[det_idx], state.hs),
        count_inactive=jnp.where(reviving, 0, state.count_inactive),
        active=state.active | reviving,
        inactive=state.inactive & ~reviving,
        num_reids=state.num_reids + jnp.sum(reviving).astype(jnp.int32),
        masks=(state.masks if (state.masks is None or det_masks is None)
               else jnp.where(reviving[:, None, None], det_masks[det_idx],
                              state.masks)),
    )
    # detections consumed by reid are removed
    consumed = jnp.zeros_like(det_keep)
    consumed = consumed.at[det_idx].max(reviving)
    return state, det_keep & ~consumed


def _prepare_track_queries(state: TrackerState, orig_size: jnp.ndarray,
                           cfg: TrackerConfig):
    """Prune + build track-query inputs for ONE sequence
    (reference :270-304). orig_size: (2,)."""
    state = _prune_inactive(state, cfg)
    live = state.active | state.inactive
    h = orig_size[0].astype(jnp.float32)
    w = orig_size[1].astype(jnp.float32)
    scale = jnp.stack([w, h, w, h])
    tq_boxes = box_ops.box_xyxy_to_cxcywh(state.boxes / scale)
    return state, state.hs, tq_boxes, live


def _track_logic(state: TrackerState, boxes_all, scores_all, labels_all,
                 hs_all, masks_all, attn_all, public_boxes, public_valid,
                 hw, cfg: TrackerConfig):
    """All post-model track logic for ONE sequence (reference :329-541)."""
    s = cfg.max_tracks
    h, w = hw[0], hw[1]
    if not cfg.overflow_boxes:
        boxes_all = box_ops.clip_boxes_to_image(boxes_all, (h, w))

    # --- existing tracks (reference :329-392) ---
    t_scores, t_boxes = scores_all[:s], boxes_all[:s]
    t_labels, t_hs = labels_all[:s], hs_all[:s]
    keep = (t_scores > cfg.track_obj_score_thresh) & (t_labels == 0) \
        & state.active
    ct = jnp.where(keep, 0,
                   state.count_term + (state.active & ~keep))
    to_inactive = state.active & ~keep & (ct >= cfg.steps_termination)

    rk = (t_scores > cfg.reid_score_thresh) & (t_labels == 0) \
        & state.inactive
    upd = keep | rk
    state = state.replace(
        boxes=jnp.where(upd[:, None], t_boxes, state.boxes),
        scores=jnp.where(upd, t_scores, state.scores),
        hs=jnp.where(upd[:, None], t_hs, state.hs),
        count_term=ct,
        active=(state.active & ~to_inactive) | rk,
        inactive=(state.inactive | to_inactive) & ~rk,
        num_reids=state.num_reids + jnp.sum(rk).astype(jnp.int32),
        masks=(state.masks if masks_all is None else
               jnp.where(upd[:, None, None], masks_all[:s], state.masks)),
        attn_maps=(state.attn_maps
                   if (attn_all is None or state.attn_maps is None) else
                   jnp.where(upd[:, None, None], attn_all[:s],
                             state.attn_maps)),
    )

    # --- track NMS (reference :395-412): suppressed slots are freed ---
    if cfg.track_nms_thresh:
        keep_nms = nms_mask(state.boxes, state.scores, state.active,
                            cfg.track_nms_thresh)
        removed = state.active & ~keep_nms
        state = state.replace(active=state.active & keep_nms,
                              ids=jnp.where(removed, -1, state.ids))

    # --- new detections (reference :414-436) ---
    d_scores, d_boxes = scores_all[s:], boxes_all[s:]
    d_labels, d_hs = labels_all[s:], hs_all[s:]
    d_masks = None if masks_all is None else masks_all[s:]
    d_attn = None if attn_all is None else attn_all[s:]
    d_keep = (d_scores > cfg.detection_obj_score_thresh) & (d_labels == 0)

    d_keep = _public_detections_mask(cfg, d_boxes, d_keep, public_boxes,
                                     public_valid)
    state, d_keep = _reid(state, d_boxes, d_scores, d_hs, d_masks,
                          d_keep, cfg)
    state, new_track_mask = _scatter_new_tracks(
        state, d_keep, d_boxes, d_scores, d_hs, d_masks, cfg,
        d_attn if state.attn_maps is not None else None)

    # --- detection NMS: old tracks pinned with inf score (:485-503) ---
    if cfg.detection_nms_thresh:
        nms_scores = jnp.where(new_track_mask, state.scores, jnp.inf)
        keep_nms = nms_mask(state.boxes, nms_scores, state.active,
                            cfg.detection_nms_thresh)
        removed = state.active & ~keep_nms
        state = state.replace(active=state.active & keep_nms,
                              ids=jnp.where(removed, -1, state.ids))

    # --- mask overlap resolution at head resolution (:509-521) ---
    out_masks = None
    if state.masks is not None:
        probs = jnp.where(state.active[:, None, None], state.masks,
                          -jnp.inf)
        winner = jnp.argmax(probs, axis=0)  # (Hm, Wm)
        slot_ids = jnp.arange(s)[:, None, None]
        out_masks = (state.masks > 0.5) & (winner[None] == slot_ids) \
            & state.active[:, None, None]

    # --- per-frame results (:523-541) ---
    res_boxes = state.boxes if cfg.overflow_boxes else \
        box_ops.clip_boxes_to_image(state.boxes, (h, w))
    frame_results = {
        "ids": jnp.where(state.active, state.ids, -1),
        "boxes": res_boxes,
        "scores": state.scores,
        "obj_ind": state.obj_ind,
    }
    if out_masks is not None:
        frame_results["masks"] = out_masks
    if state.attn_maps is not None:
        frame_results["attention_maps"] = jnp.where(
            state.active[:, None, None], state.attn_maps, 0.0)

    state = state.replace(
        count_inactive=state.count_inactive
        + state.inactive.astype(jnp.int32))
    if cfg.reid_sim_only:
        state = state.replace(inactive=state.inactive | state.active,
                              active=jnp.zeros_like(state.active))
    return state, frame_results


def make_tracker_step(apply_fn: Callable, postprocess: Callable,
                      cfg: TrackerConfig,
                      postprocess_segm: Optional[Callable] = None,
                      batched: bool = False):
    """Build the jitted per-frame step.

    apply_fn(params, batch, targets|None, prev_features) -> model 5-tuple.

    Unbatched (default): step(params, state, batch(1,H,W,3), orig_size(1,2),
    public_boxes(P,4), public_valid(P,), prev) -> (state, results, features).

    Batched: leading B on state leaves / images / orig_sizes / publics; the
    MODEL runs natively at batch B (keeping the fused MSDA gather fast —
    vmapping the whole step would de-optimize it into per-lane gathers)
    while the per-sequence track logic is vmapped.
    """

    def core(params, states, batch: FrameBatch, orig_sizes, public_boxes,
             public_valid, prev_features):
        s = cfg.max_tracks
        states, tq_hs, tq_boxes, tq_valid = jax.vmap(
            lambda st, osz: _prepare_track_queries(st, osz, cfg))(
                states, orig_sizes)
        b = tq_hs.shape[0]
        targets = empty_targets(b, 1).with_track_queries(
            tq_hs, tq_boxes, tq_valid)

        out, _, features, _, _ = apply_fn(params, batch, targets,
                                          prev_features)
        res = postprocess(out, orig_sizes)
        boxes_all = res["boxes"]  # (B, S+Q, 4) absolute xyxy
        scores_all = res["scores"]
        labels_all = res["labels"]
        hs_all = out["hs_embed"]

        masks_all = None
        if cfg.with_masks and "pred_masks" in out:
            masks_all = jax.nn.sigmoid(out["pred_masks"])  # (B, S+Q, h, w)
        attn_all = out.get("attention_maps")
        hw = orig_sizes.astype(jnp.float32)

        # carrying masks needs BOTH the model output and preallocated
        # per-slot state buffers (init_state(..., mask_hw=...))
        has_masks = masks_all is not None and states.masks is not None
        has_attn = attn_all is not None

        def logic(st, ba, sa, la, ha, ma, aa, pb, pv, hw_row):
            return _track_logic(st, ba, sa, la, ha,
                                ma if has_masks else None,
                                aa if has_attn else None,
                                pb, pv, hw_row, cfg)

        states, frame_results = jax.vmap(logic)(
            states, boxes_all, scores_all, labels_all, hs_all,
            masks_all if has_masks else jnp.zeros((b, 1, 1, 1)),
            attn_all if has_attn else jnp.zeros((b, 1, 1, 1)),
            public_boxes, public_valid, hw)
        return states, frame_results, features

    if batched:
        return jax.jit(core)

    def step(params, state, batch, orig_size, public_boxes, public_valid,
             prev_features):
        states = jax.tree.map(lambda x: x[None], state)
        new_states, frame_results, features = core(
            params, states, batch, orig_size, public_boxes[None],
            public_valid[None], prev_features)
        state = jax.tree.map(lambda x: x[0], new_states)
        frame_results = jax.tree.map(lambda x: x[0], frame_results)
        return state, frame_results, features

    return jax.jit(step)


class Tracker:
    """Host shell: drives the jitted step over a sequence and accumulates
    MOTChallenge-style results (reference Tracker API: reset/step/get_results,
    tracker.py:16-554)."""

    def __init__(self, params, apply_fn, postprocess, tracker_cfg: dict,
                 hidden_dim: int, num_object_queries: int,
                 overflow_boxes: bool = False, with_masks: bool = False,
                 mask_hw=None, attn_hw=None, logger=None,
                 verbose: bool = False):
        self.cfg = TrackerConfig.from_dict(
            {**tracker_cfg,
             "num_object_queries": num_object_queries,
             "overflow_boxes": overflow_boxes,
             "with_masks": with_masks})
        self.params = params
        self.hidden_dim = hidden_dim
        self.mask_hw = mask_hw
        self.attn_hw = attn_hw
        self._step = make_tracker_step(apply_fn, postprocess, self.cfg)
        self._apply_fn = apply_fn
        self._logger = logger or (lambda *a: None)
        self._verbose = verbose
        self.reset()

    def reset(self, hard: bool = True):
        attn_hw = self.attn_hw if isinstance(self.attn_hw, tuple) else None
        self.state = init_state(self.cfg.max_tracks, self.hidden_dim,
                                self.mask_hw if self.cfg.with_masks else None,
                                attn_hw)
        self._prev_features = deque([None], maxlen=self.cfg.prev_frame_dist)
        if hard:
            self.results: Dict[int, Dict[int, dict]] = {}
            self.frame_index = 0
            self.num_reids = 0

    @property
    def num_object_queries(self):
        return self.cfg.num_object_queries

    def step(self, blob: dict):
        """blob: {img (1,H,W,3) jnp, orig_size (1,2), dets list/array}."""
        batch = blob["batch"]
        if (self.attn_hw == "auto" and self.state.attn_maps is None) or \
                (self.cfg.with_masks and self.state.masks is None):
            # probe mask / attention-map resolutions once, then re-init the
            # per-slot state buffers to match
            probe_out = self._apply_probe(batch)
            if self.attn_hw == "auto":
                self.attn_hw = tuple(
                    probe_out["attention_maps"].shape[-2:])
                self.state = self.state.replace(
                    attn_maps=jnp.zeros(
                        (self.cfg.max_tracks,) + self.attn_hw, jnp.float32))
            if self.cfg.with_masks and self.state.masks is None:
                self.mask_hw = tuple(probe_out["pred_masks"].shape[-2:])
                self.state = self.state.replace(
                    masks=jnp.zeros((self.cfg.max_tracks,) + self.mask_hw,
                                    jnp.float32))
        orig_size = jnp.asarray(blob["orig_size"])
        p_max = 128
        dets = np.asarray(blob.get("dets", np.zeros((0, 4), np.float32)),
                          dtype=np.float32)
        dets = dets.reshape(-1, 4)[:p_max]
        public_boxes = np.zeros((p_max, 4), np.float32)
        public_valid = np.zeros((p_max,), bool)
        public_boxes[:len(dets)] = dets
        public_valid[:len(dets)] = True

        prev = self._prev_features[0]
        self.state, frame_results, features = self._step(
            self.params, self.state, batch, orig_size,
            jnp.asarray(public_boxes), jnp.asarray(public_valid), prev)
        self._prev_features.append(features)

        ids = np.asarray(frame_results["ids"])
        boxes = np.asarray(frame_results["boxes"])
        scores = np.asarray(frame_results["scores"])
        obj_ind = np.asarray(frame_results["obj_ind"])
        masks = (np.asarray(frame_results["masks"])
                 if "masks" in frame_results else None)
        attn = (np.asarray(frame_results["attention_maps"])
                if "attention_maps" in frame_results else None)
        for slot in np.nonzero(ids >= 0)[0]:
            tid = int(ids[slot])
            self.results.setdefault(tid, {})
            entry = {"bbox": boxes[slot], "score": float(scores[slot]),
                     "obj_ind": int(obj_ind[slot])}
            if masks is not None:
                entry["mask"] = masks[slot]
            if attn is not None:
                entry["attention_map"] = attn[slot]
            self.results[tid][self.frame_index] = entry
        self.frame_index += 1
        self.num_reids = int(self.state.num_reids)

    def _apply_probe(self, batch):
        out, _, _, _, _ = self._apply_fn(self.params, batch, None, None)
        return out

    def get_results(self):
        return self.results
