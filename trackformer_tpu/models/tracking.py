"""Training-time track-query construction + multi-frame forward orchestration.

Parity target: /root/reference/src/trackformer/models/detr_tracking.py —
`add_track_queries_to_targets` (:39-183) builds track queries for frame t
from the model's matched outputs on frame t-1, with
  * a random subset (false negatives / query dropout, size shared across the
    batch: randint(0, min_batch_matches + 1), :43-46, :63),
  * injected false positives sampled from unmatched prev outputs with
    probability mass increasing with center distance to a matched box
    (:93-148; the reference computes that distance from the x-offset twice —
    an evident typo — we use the true 2D distance),
  * per-slot masks consumed by the matcher (pinning) and criterion (eos
    reweighting).
`tracking_train_forward` (:219-277) runs the prev (and prev-prev) frame under
stop-gradient unless backprop_prev_frame and injects the result.

Static-shape layout: track-query capacity K = max_objects + FP_CAP slots;
slot k < num holds the k-th sampled subset member, slots [num, num+num_fps)
hold injected false positives, the rest are invalid.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..structures import Targets
from .matcher import MatcherConfig, match


@struct.dataclass
class TrackingConfig:
    false_positive_prob: float = 0.1
    false_negative_prob: float = 0.4  # kept for config parity (subset size
    # is driven by the shared randint; see reference :46,:63)
    backprop_prev_frame: bool = False
    matcher: MatcherConfig = MatcherConfig()


def fp_capacity(max_objects: int, fp_prob: float) -> int:
    return int(math.ceil(fp_prob * max_objects)) + 1


def add_track_queries_to_targets(
        rng: jax.Array,
        targets: Targets,
        prev_targets: Targets,
        prev_out: dict,
        prev_match_q: jnp.ndarray,
        cfg: TrackingConfig,
        add_false_pos: bool = True,
        forced: Optional[dict] = None) -> Targets:
    """Build padded track-query slots on `targets` from prev-frame outputs.

    prev_match_q: (B, T) query index matched to each prev target slot.

    `forced` (tests only — the tracking-augmentation parity test pins both
    this and the reference implementation to the same choices): dict with
    'num' (subset size), 'num_fps', 'order' (B, T) subset permutation, and
    'fp_seed_pos' (B, T) FP seed positions; FP candidate picks then use
    deterministic argmax over the distance weights instead of the weighted
    Gumbel draw.
    """
    b, t = prev_targets.valid.shape
    q = prev_out["pred_boxes"].shape[1]
    hidden = prev_out["hs_embed"].shape[-1]
    kfp = fp_capacity(t, cfg.false_positive_prob) if add_false_pos else 0
    k_total = t + kfp

    r_num, r_fps, r_perm, r_fp = jax.random.split(rng, 4)

    if forced is None:
        n_valid = jnp.sum(prev_targets.valid, axis=1)  # (B,)
        min_valid = jnp.min(n_valid)
        # shared subset size: uniform over [0, min_valid] (reference :43-46)
        num = jax.random.randint(r_num, (), 0, 10**9) % (min_valid + 1)
        # shared FP count: randint(0, ceil(p*num)+1) (reference :48-51)
        fp_hi = jnp.ceil(cfg.false_positive_prob * num).astype(jnp.int32) + 1
        num_fps = jnp.where(
            (num > 0) & add_false_pos,
            jax.random.randint(r_fps, (), 0, 10**9) % fp_hi, 0)
        order_in = jnp.zeros((b, t), jnp.int32)
        fp_seed_in = jnp.zeros((b, t), jnp.int32)
    else:
        num = jnp.asarray(forced["num"], jnp.int32)
        num_fps = jnp.asarray(forced.get("num_fps", 0), jnp.int32)
        order_in = jnp.asarray(forced["order"], jnp.int32)
        fp_seed_in = jnp.asarray(
            forced.get("fp_seed_pos", jnp.zeros((b, t), jnp.int32)),
            jnp.int32)

    def per_image(rng_i, rng_fp_i, order_i, fp_seed_i, valid_i, match_q_i,
                  prev_ids_i, cur_ids_i, cur_valid_i, prev_boxes_i,
                  prev_hs_i):
        if forced is None:
            # random order of valid prev-target slots first
            noise = jax.random.uniform(rng_i, (t,))
            order = jnp.argsort(jnp.where(valid_i, noise, noise + 10.0))
        else:
            order = order_i
        sel = jnp.arange(t) < num  # positions holding subset members

        slot_tgt = order  # (T,) prev target slot per position
        slot_q = match_q_i[slot_tgt]  # prev output query per position
        slot_track_id = prev_ids_i[slot_tgt]

        # match prev track ids to current-frame target slots
        eq = (slot_track_id[:, None] == cur_ids_i[None, :]) & \
            cur_valid_i[None, :] & (slot_track_id[:, None] >= 0)
        matched = jnp.any(eq, axis=1) & sel
        matched_idx = jnp.argmax(eq, axis=1).astype(jnp.int32)

        boxes_sub = prev_boxes_i[slot_q]  # (T, 4)
        hs_sub = prev_hs_i[slot_q]  # (T, C)

        tq_boxes = jnp.zeros((k_total, 4), jnp.float32).at[:t].set(boxes_sub)
        tq_hs = jnp.zeros((k_total, hidden), jnp.float32).at[:t].set(hs_sub)
        tq_valid = jnp.zeros((k_total,), bool).at[:t].set(sel)
        tq_fal_pos = jnp.zeros((k_total,), bool).at[:t].set(sel & ~matched)
        tq_match = jnp.full((k_total,), -1, jnp.int32).at[:t].set(
            jnp.where(matched, matched_idx, -1))

        if kfp:
            # candidate prev outputs = not used by any subset slot
            used = jnp.zeros((q,), bool).at[slot_q].max(sel)
            if forced is None:
                # subset positions seeding each FP (randperm(num)[:num_fps],
                # reference :104)
                pnoise = jax.random.uniform(jax.random.fold_in(rng_fp_i, 0),
                                            (t,))
                fp_seed_pos = jnp.argsort(jnp.where(jnp.arange(t) < num,
                                                    pnoise, pnoise + 10.0))
            else:
                fp_seed_pos = fp_seed_i

            # matched subset positions in subset order: the reference seeds
            # FP j from prev_boxes_matched[j] — the j-th MATCHED box — when
            # j < n_matched, else picks uniformly (detr_tracking.py:126-139)
            mpos = jnp.argsort(~matched, stable=True)
            n_matched = jnp.sum(matched)

            def fp_step(carry, j):
                used_c = carry
                j_val = fp_seed_pos[j]
                seed_ok = j_val < n_matched
                seed_box = boxes_sub[mpos[jnp.clip(j_val, 0, t - 1)]]
                d = prev_boxes_i[:, :2] - seed_box[None, :2]
                w = jnp.sqrt(jnp.sum(d * d, axis=1)) + 1e-8
                w = jnp.where(seed_ok, w, 1.0)  # uniform when no seed box
                w = jnp.where(used_c, 0.0, w)
                logw = jnp.log(jnp.maximum(w, 1e-30))
                if forced is None:
                    g = jax.random.gumbel(
                        jax.random.fold_in(rng_fp_i, j + 1), (q,))
                    pick = jnp.argmax(logw + g).astype(jnp.int32)
                else:
                    pick = jnp.argmax(logw).astype(jnp.int32)
                used_c = used_c.at[pick].set(True)
                return used_c, pick

            _, picks = jax.lax.scan(fp_step, used, jnp.arange(kfp))
            fp_on = jnp.arange(kfp) < num_fps
            tq_boxes = tq_boxes.at[t:].set(
                jnp.where(fp_on[:, None], prev_boxes_i[picks], 0.0))
            tq_hs = tq_hs.at[t:].set(
                jnp.where(fp_on[:, None], prev_hs_i[picks], 0.0))
            tq_valid = tq_valid.at[t:].set(fp_on)
            tq_fal_pos = tq_fal_pos.at[t:].set(fp_on)

        return tq_hs, tq_boxes, tq_valid, tq_fal_pos, tq_match

    rngs = jax.random.split(r_perm, b)
    rngs_fp = jax.random.split(r_fp, b)
    tq_hs, tq_boxes, tq_valid, tq_fal_pos, tq_match = jax.vmap(per_image)(
        rngs, rngs_fp, order_in, fp_seed_in, prev_targets.valid,
        prev_match_q, prev_targets.track_ids, targets.track_ids,
        targets.valid, prev_out["pred_boxes"], prev_out["hs_embed"])

    return targets.with_track_queries(tq_hs, tq_boxes, tq_valid, tq_fal_pos,
                                      tq_match)


def tracking_train_forward(apply_fn: Callable, params, batch, targets: Targets,
                           prev_batch, prev_targets: Targets, rng: jax.Array,
                           cfg: TrackingConfig,
                           prev_prev_batch=None,
                           prev_prev_targets: Optional[Targets] = None,
                           rngs_dropout=None) -> Tuple[dict, Targets]:
    """Two(/three)-frame training forward (reference :219-277).

    apply_fn(params, batch, targets, prev_features, rngs) -> 5-tuple.
    Returns (out, targets_with_track_queries) for the current frame.
    """
    r_pp, r_p = jax.random.split(rng)

    def maybe_stop(x):
        return x if cfg.backprop_prev_frame else jax.lax.stop_gradient(x)

    prev_features = None
    if prev_prev_batch is not None:
        pp_out, _, pp_feats, _, _ = apply_fn(params, prev_prev_batch, None,
                                             None, rngs_dropout)
        pp_out = maybe_stop(pp_out)
        pp_feats = maybe_stop(pp_feats)
        pp_match = match(pp_out, prev_prev_targets, cfg.matcher)
        prev_targets = add_track_queries_to_targets(
            r_pp, prev_targets, prev_prev_targets, pp_out, pp_match, cfg,
            add_false_pos=False)
        prev_out, _, prev_feats, _, _ = apply_fn(
            params, prev_batch, prev_targets, pp_feats, rngs_dropout)
    else:
        prev_out, _, prev_feats, _, _ = apply_fn(params, prev_batch, None,
                                                 None, rngs_dropout)

    prev_out = maybe_stop(prev_out)
    prev_feats = maybe_stop(prev_feats)
    prev_match_q = match(prev_out, prev_targets, cfg.matcher)
    targets = add_track_queries_to_targets(
        r_p, targets, prev_targets, prev_out, prev_match_q, cfg)

    out, targets, feats, memory, hs = apply_fn(params, batch, targets,
                                               prev_feats, rngs_dropout)
    return out, targets
