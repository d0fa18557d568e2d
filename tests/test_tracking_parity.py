"""Training-time track-query augmentation parity vs the reference
`DETRTrackingBase.add_track_queries_to_targets`
(/root/reference/src/trackformer/models/detr_tracking.py:39-183).

Both implementations are driven with FORCED random choices — the shared
subset size, the subset permutation, the FP-seed positions, and
deterministic-argmax FP candidate picks (torch.randint / torch.randperm /
torch.multinomial are stubbed on the reference side; our side takes the
same choices through the `forced` hook) — and must produce identical
track-query slot layouts: hs embeds, boxes, false-positive masks and
matcher pinning ids.

Note: the reference computes the FP distance weight from the x offset
twice (detr_tracking.py:131 — an evident typo we deliberately fix), so the
fixture places all boxes at the same center-y, where both formulas order
candidates identically.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import load_reference  # noqa: E402

from trackformer_tpu.models.tracking import (TrackingConfig,  # noqa: E402
                                             add_track_queries_to_targets)
from trackformer_tpu.structures import empty_targets  # noqa: E402

T = 5  # prev/current target slots
Q = 12  # prev-frame output queries
C = 8  # hidden dim

PREV_IDS = [10, 11, 12, 13, 14]
CUR_IDS = [12, 10, 99, 13, 7]
MATCH_Q = [3, 7, 1, 9, 5]  # query matched to each prev target slot


def make_prev_out(seed=0):
    rng = np.random.default_rng(seed)
    boxes = rng.uniform(0.1, 0.9, (1, Q, 4)).astype(np.float32)
    boxes[..., 1] = 0.5  # same cy: reference x-typo orders like true dist
    hs = rng.standard_normal((1, Q, C)).astype(np.float32)
    return boxes, hs


def run_reference(boxes, hs, num, order, num_fps, fp_seed,
                  add_false_pos=True, monkeypatch=None):
    ns = load_reference()
    obj = object.__new__(ns.detr_tracking.DETRTrackingBase)
    obj._matcher = None
    obj._track_query_false_positive_prob = 0.1
    obj._track_query_false_negative_prob = 0.4
    obj.num_queries = Q

    target = {
        "track_ids": torch.tensor(CUR_IDS),
        "prev_target": {"track_ids": torch.tensor(PREV_IDS)},
    }
    prev_out = {"pred_boxes": torch.from_numpy(boxes),
                "hs_embed": torch.from_numpy(hs)}
    prev_indices = [(torch.tensor(MATCH_Q), torch.arange(T))]

    randint_queue = [num, num_fps]
    perm_queue = [torch.tensor(order), torch.tensor(fp_seed)]

    def fake_randint(*a, **k):
        return torch.tensor([randint_queue.pop(0)])

    def fake_randperm(n):
        if perm_queue:
            p = perm_queue.pop(0)
            if len(p) == n:
                return p.clone()
        return torch.arange(n)  # uniform FP fallback -> first candidate

    def fake_multinomial(w, n):
        assert n == 1
        return torch.argmax(w).reshape(1)

    monkeypatch.setattr(torch, "randint", fake_randint)
    monkeypatch.setattr(torch, "randperm", fake_randperm)
    monkeypatch.setattr(torch, "multinomial", fake_multinomial)
    obj.add_track_queries_to_targets([target], prev_indices, prev_out,
                                     add_false_pos=add_false_pos)
    return target


def run_ours(boxes, hs, num, order, num_fps, fp_seed, add_false_pos=True):
    targets = empty_targets(1, T).replace(
        valid=jnp.ones((1, T), bool),
        track_ids=jnp.array([CUR_IDS], jnp.int32))
    prev_targets = empty_targets(1, T).replace(
        valid=jnp.ones((1, T), bool),
        track_ids=jnp.array([PREV_IDS], jnp.int32))
    prev_out = {"pred_boxes": jnp.asarray(boxes), "hs_embed": jnp.asarray(hs)}
    forced = {
        "num": num, "num_fps": num_fps,
        "order": np.pad(order, (0, T - len(order)))[None],
        "fp_seed_pos": np.pad(fp_seed, (0, T - len(fp_seed)))[None],
    }
    out = add_track_queries_to_targets(
        jax.random.PRNGKey(0), targets, prev_targets, prev_out,
        jnp.array([MATCH_Q], jnp.int32), TrackingConfig(),
        add_false_pos=add_false_pos, forced=forced)
    return out


def compare(ref_target, ours, num, num_fps):
    # our valid slots: subset at [0:num], FPs at [T:T+num_fps]
    tq_valid = np.asarray(ours.tq_valid[0])
    expect_valid = np.zeros_like(tq_valid)
    expect_valid[:num] = True
    expect_valid[T:T + num_fps] = True
    np.testing.assert_array_equal(tq_valid, expect_valid)

    sel = np.concatenate([np.arange(num), T + np.arange(num_fps)])
    ours_hs = np.asarray(ours.tq_hs_embeds[0])[sel]
    ours_boxes = np.asarray(ours.tq_boxes[0])[sel]
    ours_fal = np.asarray(ours.tq_fal_pos[0])[sel]
    ours_match = np.asarray(ours.tq_match_idx[0])[:num]

    ref_hs = ref_target["track_query_hs_embeds"].numpy()
    ref_boxes = ref_target["track_query_boxes"].numpy()
    n_tq = num + num_fps
    ref_mask = ref_target["track_queries_mask"].numpy()
    ref_fal = ref_target["track_queries_fal_pos_mask"].numpy()
    assert len(ref_mask) == n_tq + Q
    assert ref_mask[:n_tq].all() and not ref_mask[n_tq:].any()
    assert not ref_fal[n_tq:].any()

    np.testing.assert_allclose(ours_hs, ref_hs, atol=0)
    np.testing.assert_allclose(ours_boxes, ref_boxes, atol=0)
    np.testing.assert_array_equal(ours_fal, ref_fal[:n_tq])
    np.testing.assert_array_equal(
        ours_match[ours_match >= 0],
        ref_target["track_query_match_ids"].numpy())


def test_subset_no_false_positives(monkeypatch):
    """Subset of 3 (slots 2,0,4): ids 12,10 match current, 14 doesn't."""
    boxes, hs = make_prev_out()
    num, order = 3, [2, 0, 4, 1, 3]
    ref = run_reference(boxes, hs, num, order, 0, [], add_false_pos=False,
                        monkeypatch=monkeypatch)
    ours = run_ours(boxes, hs, num, order, 0, [], add_false_pos=False)
    compare(ref, ours, num, 0)
    # matched layout: positions 0,1 matched to current slots 0,1; pos 2 FN
    np.testing.assert_array_equal(np.asarray(ours.tq_match_idx[0])[:3],
                                  [0, 1, -1])
    np.testing.assert_array_equal(np.asarray(ours.tq_fal_pos[0])[:3],
                                  [False, False, True])


def test_false_positive_injection(monkeypatch):
    """Two FPs: seed 1 -> distance-argmax pick around the 2nd matched box;
    seed 2 >= n_matched -> uniform pick (first remaining candidate)."""
    boxes, hs = make_prev_out(seed=3)
    num, order = 3, [2, 0, 4, 1, 3]
    num_fps, fp_seed = 2, [1, 2, 0]
    ref = run_reference(boxes, hs, num, order, num_fps, fp_seed,
                        monkeypatch=monkeypatch)
    ours = run_ours(boxes, hs, num, order, num_fps, fp_seed)
    compare(ref, ours, num, num_fps)
    # both injected slots are false positives by construction
    np.testing.assert_array_equal(
        np.asarray(ours.tq_fal_pos[0])[T:T + num_fps], [True, True])


def test_full_subset_all_matched(monkeypatch):
    """num == all prev targets, identity order, one distance-seeded FP."""
    boxes, hs = make_prev_out(seed=9)
    num, order = 5, [0, 1, 2, 3, 4]
    num_fps, fp_seed = 1, [3, 0, 1, 2, 4]
    ref = run_reference(boxes, hs, num, order, num_fps, fp_seed,
                        monkeypatch=monkeypatch)
    ours = run_ours(boxes, hs, num, order, num_fps, fp_seed)
    compare(ref, ours, num, num_fps)
