"""Masks through the BATCHED tracker (VERDICT r2 §7): the throughput path
must produce the same per-track masks as the unbatched Tracker, and MOTS
result files written from both must be byte-identical.

Reference counterpart: the per-frame mask carry in
/root/reference/src/trackformer/models/tracker.py:509-541.
"""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from test_tracker import HID, Q, S, make_fake_apply  # noqa: E402

from trackformer_tpu.models.postprocess import postprocess_softmax  # noqa: E402
from trackformer_tpu.structures import FrameBatch  # noqa: E402
from trackformer_tpu.tracking.batched import BatchedTracker  # noqa: E402
from trackformer_tpu.tracking.tracker import Tracker  # noqa: E402

MASK_HW = (16, 16)

CFG = {
    "detection_obj_score_thresh": 0.4, "track_obj_score_thresh": 0.4,
    "detection_nms_thresh": 0.9, "track_nms_thresh": 0.9,
    "public_detections": False, "inactive_patience": -1,
    "reid_sim_threshold": 0.0, "reid_sim_only": False,
    "reid_score_thresh": 0.4, "reid_greedy_matching": False,
    "prev_frame_dist": 1, "steps_termination": 1, "max_tracks": S,
}


def make_fake_apply_masks(gt):
    """Fake detector that also emits box-shaped pred_masks logits."""
    base = make_fake_apply(gt)
    mh, mw = MASK_HW

    def apply_fn(params, batch, targets, prev_features):
        out, t, f, m, h = base(params, batch, targets, prev_features)
        boxes = out["pred_boxes"]  # (B, K, 4) normalized cxcywh
        ys = (jnp.arange(mh) + 0.5)[None, None, :, None] / mh
        xs = (jnp.arange(mw) + 0.5)[None, None, None, :] / mw
        cx = boxes[..., 0][..., None, None]
        cy = boxes[..., 1][..., None, None]
        bw = boxes[..., 2][..., None, None]
        bh = boxes[..., 3][..., None, None]
        inside = (jnp.abs(xs - cx) < bw / 2) & (jnp.abs(ys - cy) < bh / 2)
        out["pred_masks"] = jnp.where(inside, 8.0, -8.0)
        return out, t, f, m, h

    return apply_fn


def make_gts():
    gt_a = np.array([
        [[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]],
        [[0.32, 0.3, 0.2, 0.2], [0.7, 0.72, 0.2, 0.2]],
        [[0.34, 0.3, 0.2, 0.2], [0.7, 0.74, 0.2, 0.2]],
    ], np.float32)
    gt_b = np.array([
        [[0.5, 0.5, 0.3, 0.3], [np.nan] * 4],
        [[0.52, 0.5, 0.3, 0.3], [0.2, 0.2, 0.2, 0.2]],
        [[0.54, 0.5, 0.3, 0.3], [0.2, 0.22, 0.2, 0.2]],
    ], np.float32)
    return gt_a, gt_b


def make_blobs(n_frames):
    blobs = []
    for f in range(n_frames):
        img = jnp.full((1, 8, 8, 3), float(f))
        blobs.append({"batch": FrameBatch.from_images(img),
                      "orig_size": np.array([[100, 100]])})
    return blobs


def run_unbatched(gt):
    tracker = Tracker(params={}, apply_fn=make_fake_apply_masks(gt),
                      postprocess=postprocess_softmax, tracker_cfg=CFG,
                      hidden_dim=HID, num_object_queries=Q,
                      with_masks=True)
    for blob in make_blobs(len(gt)):
        tracker.step(blob)
    return tracker.get_results()


class _StubMotsSeq:
    results_file_name = "SYN.txt"
    write_results = __import__(
        "trackformer_tpu.datasets.tracking.mots20_sequence",
        fromlist=["MOTS20Sequence"]).MOTS20Sequence.write_results


def test_batched_matches_unbatched_masks(tmp_path):
    gt_a, gt_b = make_gts()
    res_a = run_unbatched(gt_a)
    res_b = run_unbatched(gt_b)

    # batched: the fake apply is shared; gt index is selected per sequence
    # by stacking both gts along the object axis? No — run one BatchedTracker
    # per gt is pointless; instead run B=2 with per-sequence frame images
    # identical, but the fake detector keys on the frame value only, so use
    # a combined gt tensor with 2N objects where each sequence sees its own
    # half via distinct blobs is not expressible. Run B=2 over the SAME
    # sequence twice plus compare against the unbatched run of that
    # sequence, then repeat for the second sequence.
    for gt, ref_results in ((gt_a, res_a), (gt_b, res_b)):
        bt = BatchedTracker(params={}, apply_fn=make_fake_apply_masks(gt),
                            postprocess=postprocess_softmax,
                            tracker_cfg=CFG, hidden_dim=HID,
                            num_object_queries=Q, with_masks=True)
        batched = bt.run([make_blobs(len(gt)), make_blobs(len(gt))])
        for results in batched:
            assert sorted(results) == sorted(ref_results)
            for tid in results:
                assert sorted(results[tid]) == sorted(ref_results[tid])
                for f in results[tid]:
                    np.testing.assert_allclose(
                        results[tid][f]["bbox"], ref_results[tid][f]["bbox"],
                        atol=1e-5)
                    np.testing.assert_array_equal(
                        results[tid][f]["mask"], ref_results[tid][f]["mask"])

        # MOTS result files byte-identical
        out_u = tmp_path / "u"
        out_b = tmp_path / "b"
        stub = _StubMotsSeq()
        stub.write_results(ref_results, str(out_u))
        stub.write_results(batched[0], str(out_b))
        u = (out_u / "SYN.txt").read_bytes()
        b = (out_b / "SYN.txt").read_bytes()
        assert u == b and len(u) > 0


def test_mask_entries_present_and_disjoint():
    gt_a, _ = make_gts()
    results = run_unbatched(gt_a)
    for f in range(3):
        frame_masks = [results[tid][f]["mask"] for tid in results
                       if f in results[tid]]
        assert len(frame_masks) == 2
        total = np.zeros(MASK_HW, np.int32)
        for m in frame_masks:
            assert m.dtype == np.bool_ and m.any()
            total += m.astype(np.int32)
        # overlap resolution: each pixel belongs to at most one track
        assert total.max() <= 1
