"""Matcher + criterion semantics on padded targets.

Key property: padding must be invisible — adding padded target slots or
invalid query slots must not change matches or losses. Matching optimality is
checked against scipy on the equivalent ragged problem (the reference runs
scipy per image, /root/reference/src/trackformer/models/matcher.py:127).
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from trackformer_tpu.models.criterion import CriterionConfig, compute_losses
from trackformer_tpu.models.matcher import MatcherConfig, match
from trackformer_tpu.ops import box_ops
from trackformer_tpu.structures import Targets


def make_targets(rng, b, t, n_valid, with_tq=None):
    labels = rng.randint(0, 5, (b, t)).astype(np.int32)
    boxes = np.stack([rng.uniform(0.3, 0.7, (b, t)),
                      rng.uniform(0.3, 0.7, (b, t)),
                      rng.uniform(0.05, 0.2, (b, t)),
                      rng.uniform(0.05, 0.2, (b, t))], -1).astype(np.float32)
    valid = np.zeros((b, t), bool)
    for i, n in enumerate(n_valid):
        valid[i, :n] = True
    kw = {}
    if with_tq is not None:
        k, tq_valid, fal_pos, match_idx = with_tq
        kw = dict(
            tq_hs_embeds=jnp.zeros((b, k, 8)),
            tq_boxes=jnp.array(rng.rand(b, k, 4), jnp.float32),
            tq_valid=jnp.array(tq_valid),
            tq_fal_pos=jnp.array(fal_pos),
            tq_match_idx=jnp.array(match_idx, jnp.int32),
        )
    return Targets(
        labels=jnp.array(labels), boxes=jnp.array(boxes),
        valid=jnp.array(valid),
        track_ids=jnp.full((b, t), -1, jnp.int32),
        orig_size=jnp.ones((b, 2), jnp.int32),
        size=jnp.ones((b, 2), jnp.int32),
        image_id=jnp.zeros((b,), jnp.int32), **kw)


def make_outputs(rng, b, q, c, q_valid=None):
    logits = rng.randn(b, q, c).astype(np.float32)
    boxes = np.stack([rng.uniform(0.3, 0.7, (b, q)),
                      rng.uniform(0.3, 0.7, (b, q)),
                      rng.uniform(0.05, 0.2, (b, q)),
                      rng.uniform(0.05, 0.2, (b, q))], -1).astype(np.float32)
    if q_valid is None:
        q_valid = np.ones((b, q), bool)
    return {"pred_logits": jnp.array(logits),
            "pred_boxes": jnp.array(boxes),
            "query_valid": jnp.array(q_valid)}


def ragged_cost(outputs, targets, i, n, cfg):
    """Numpy cost matrix for image i restricted to valid targets."""
    logits = np.asarray(outputs["pred_logits"][i])
    boxes = np.asarray(outputs["pred_boxes"][i])
    tgt_ids = np.asarray(targets.labels[i][:n])
    tgt_boxes = np.asarray(targets.boxes[i][:n])
    if cfg.focal_loss:
        p = 1 / (1 + np.exp(-logits))
        neg = (1 - cfg.focal_alpha) * p ** cfg.focal_gamma * (
            -np.log(1 - p + 1e-8))
        pos = cfg.focal_alpha * (1 - p) ** cfg.focal_gamma * (
            -np.log(p + 1e-8))
        cc = pos[:, tgt_ids] - neg[:, tgt_ids]
    else:
        e = np.exp(logits - logits.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        cc = -p[:, tgt_ids]
    cb = np.abs(boxes[:, None] - tgt_boxes[None]).sum(-1)
    gi = np.asarray(box_ops.generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(jnp.array(boxes)),
        box_ops.box_cxcywh_to_xyxy(jnp.array(tgt_boxes))))
    return cfg.cost_bbox * cb + cfg.cost_class * cc - cfg.cost_giou * gi


@pytest.mark.parametrize("focal", [False, True])
def test_match_optimal_vs_scipy(focal):
    rng = np.random.RandomState(0)
    b, q, t, c = 3, 20, 8, 6
    n_valid = [8, 3, 0]
    targets = make_targets(rng, b, t, n_valid)
    outputs = make_outputs(rng, b, q, c)
    cfg = MatcherConfig(focal_loss=focal)
    m = np.asarray(match(outputs, targets, cfg))
    for i, n in enumerate(n_valid):
        if n == 0:
            continue
        cost = ragged_cost(outputs, targets, i, n, cfg)
        rows, cols = linear_sum_assignment(cost.T)  # rows=targets
        ours = cost.T[np.arange(n), m[i, :n]].sum()
        assert len(set(m[i, :n].tolist())) == n
        np.testing.assert_allclose(ours, cost.T[rows, cols].sum(),
                                   rtol=1e-4, atol=1e-4)


def test_match_padding_invariance():
    rng = np.random.RandomState(1)
    b, q, t, c = 2, 15, 6, 5
    n_valid = [6, 2]
    targets = make_targets(rng, b, t, n_valid)
    outputs = make_outputs(rng, b, q, c)
    cfg = MatcherConfig()
    m1 = np.asarray(match(outputs, targets, cfg))

    # add 4 padded target slots
    def pad_t(x, v=0):
        pad_shape = list(x.shape)
        pad_shape[1] = 4
        return jnp.concatenate([x, jnp.full(pad_shape, v, x.dtype)], axis=1)
    targets2 = targets.replace(
        labels=pad_t(targets.labels), boxes=pad_t(targets.boxes),
        valid=pad_t(targets.valid, False), track_ids=pad_t(targets.track_ids))
    m2 = np.asarray(match(outputs, targets2, cfg))
    for i, n in enumerate(n_valid):
        cost = ragged_cost(outputs, targets, i, n, cfg)
        c1 = cost.T[np.arange(n), m1[i, :n]].sum()
        c2 = cost.T[np.arange(n), m2[i, :n]].sum()
        np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-4)


def test_track_query_pinning():
    rng = np.random.RandomState(2)
    b, k, q_obj, t, c = 1, 4, 10, 5, 6
    q = k + q_obj
    # tq slots: 0 pinned->target 2, 1 fal_pos, 2 pinned->target 0, 3 invalid
    tq_valid = np.array([[True, True, True, False]])
    fal_pos = np.array([[False, True, False, False]])
    match_idx = np.array([[2, -1, 0, -1]])
    targets = make_targets(rng, b, t, [5],
                           with_tq=(k, tq_valid, fal_pos, match_idx))
    outputs = make_outputs(rng, b, q, c)
    m = np.asarray(match(outputs, targets, MatcherConfig()))[0]
    assert m[2] == 0, "target 2 must be matched to track query slot 0"
    assert m[0] == 2, "target 0 must be matched to track query slot 2"
    # fal pos (slot 1) and invalid (slot 3) must not take real targets
    assert 1 not in m[:5]
    assert 3 not in m[:5]


@pytest.mark.parametrize("focal", [False, True])
def test_criterion_padding_invariance(focal):
    rng = np.random.RandomState(3)
    b, q, t, c = 2, 12, 5, 6
    n_valid = [5, 2]
    targets = make_targets(rng, b, t, n_valid)
    outputs = make_outputs(rng, b, q, c)
    cfg = CriterionConfig(num_classes=c - 1,
                          matcher=MatcherConfig(focal_loss=focal),
                          focal_loss=focal)
    l1 = compute_losses(outputs, targets, cfg)

    # pad targets with 3 slots AND queries with 4 invalid slots
    def pad_t(x, v=0):
        s = list(x.shape)
        s[1] = 3
        return jnp.concatenate([x, jnp.full(s, v, x.dtype)], axis=1)
    targets2 = targets.replace(
        labels=pad_t(targets.labels), boxes=pad_t(targets.boxes),
        valid=pad_t(targets.valid, False), track_ids=pad_t(targets.track_ids))
    o = outputs
    outputs2 = {
        "pred_logits": jnp.concatenate(
            [jnp.array(rng.randn(b, 4, c), jnp.float32), o["pred_logits"]], 1),
        "pred_boxes": jnp.concatenate(
            [jnp.array(rng.rand(b, 4, 4), jnp.float32), o["pred_boxes"]], 1),
        "query_valid": jnp.concatenate(
            [jnp.zeros((b, 4), bool), o["query_valid"]], 1),
    }
    l2 = compute_losses(outputs2, targets2, cfg)
    for key in ("loss_ce", "loss_bbox", "loss_giou", "cardinality_error"):
        np.testing.assert_allclose(float(l1[key]), float(l2[key]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"{key} not padding-invariant")


def test_criterion_vs_manual_ce():
    """CE loss formula check on a tiny hand-computable case."""
    logits = jnp.array([[[4.0, 0.0, 0.0], [0.0, 4.0, 0.0]]])  # (1, 2, 3)
    boxes = jnp.array([[[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1]]])
    outputs = {"pred_logits": logits, "pred_boxes": boxes,
               "query_valid": jnp.ones((1, 2), bool)}
    targets = Targets(
        labels=jnp.array([[0]]), boxes=jnp.array([[[0.5, 0.5, 0.2, 0.2]]]),
        valid=jnp.array([[True]]),
        track_ids=jnp.full((1, 1), -1, jnp.int32),
        orig_size=jnp.ones((1, 2), jnp.int32),
        size=jnp.ones((1, 2), jnp.int32), image_id=jnp.zeros((1,), jnp.int32))
    cfg = CriterionConfig(num_classes=2, eos_coef=0.1)
    losses = compute_losses(outputs, targets, cfg)
    # query 0 matches target (class 0): nll0 = -log softmax([4,0,0])[0]
    import math
    z = math.exp(4.0) + 2.0
    nll0 = -math.log(math.exp(4.0) / z)
    # query 1 no-object (class 2): nll = -log softmax([0,4,0])[2], weight 0.1
    z1 = math.exp(4.0) + 2.0
    nll1 = -math.log(1.0 / z1)
    expect = (nll0 * 1.0 + nll1 * 0.1) / (1.0 + 0.1)
    np.testing.assert_allclose(float(losses["loss_ce"]), expect, rtol=1e-5)
    # perfect box match -> zero box loss
    np.testing.assert_allclose(float(losses["loss_bbox"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(losses["loss_giou"]), 0.0, atol=1e-5)
