"""Tracker state-machine PARITY vs the actual reference implementation.

Loads /root/reference/src/trackformer/models/tracker.py (torch CPU) and
drives it and our fixed-slot jitted Tracker with IDENTICAL scripted
detections, asserting identical results dicts (track ids, frames, boxes,
scores, obj_ind) across scenarios: init/persist, termination counters,
track-query revival of inactive tracks, hs-embed ReID (Hungarian), greedy
center-distance ReID, track NMS, detection NMS with pinned old tracks, and
both public-detection filter modes.

The reference package cannot be imported wholesale (its models/__init__
pulls in the CUDA MSDeformAttn extension and torchvision models), so
tracker.py + util/box_ops.py are loaded standalone into a synthetic
package, with a minimal torchvision.ops.boxes stub (nms / box_iou /
clip_boxes_to_image re-implemented to torchvision semantics — torchvision
is not installed in this environment).

Detection scripting: track identity is carried in hs_embed[0] (both
trackers feed each track's last hs_embed back as its track query, reference
tracker.py:300-301), so the stub detector can answer per-identity
regardless of query ordering — the reference orders queries by Python list
position, ours by fixed slot index.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import load_reference  # noqa: E402

from trackformer_tpu.structures import FrameBatch  # noqa: E402
from trackformer_tpu.tracking.tracker import Tracker  # noqa: E402

Q = 6  # object queries
C = 6  # hidden dim; hs = [identity_key, reid_e0, reid_e1, 0, 0, 0]
S = 8  # our tracker's fixed slots
H, W = 100, 100  # image size (orig_size = (h, w))


# ---------------------------------------------------------------------------
# Scenario scripting
# ---------------------------------------------------------------------------

class Scenario:
    """Per-frame script. A frame has object detections (query slot q holds
    the q-th scripted det) and per-identity track-query responses."""

    def __init__(self, n_frames, **cfg):
        self.frames = [{"dets": [], "tracks": {}, "public": None}
                       for _ in range(n_frames)]
        self.reid_embed = {}
        self.cfg = {
            "detection_obj_score_thresh": 0.4,
            "track_obj_score_thresh": 0.4,
            "detection_nms_thresh": 0.9,
            "track_nms_thresh": 0.9,
            "public_detections": False,
            "inactive_patience": -1,
            "reid_sim_threshold": 0.0,
            "reid_sim_only": False,
            "reid_score_thresh": 0.4,
            "reid_greedy_matching": False,
            "prev_frame_dist": 1,
            "steps_termination": 1,
            "max_tracks": S,
        }
        self.cfg.update(cfg)

    def det(self, f, key, box, score):
        assert key >= 1
        self.frames[f]["dets"].append(
            (key, np.asarray(box, np.float32), float(score)))

    def track(self, f, key, box, score):
        self.frames[f]["tracks"][key] = (
            np.asarray(box, np.float32), float(score))

    def public(self, f, boxes):
        self.frames[f]["public"] = np.asarray(boxes, np.float32).reshape(-1, 4)

    def hs_vec(self, key):
        v = np.zeros(C, np.float32)
        v[0] = float(key)
        e = self.reid_embed.get(key, (17.0 * key, 9.0 * key))
        v[1], v[2] = e
        return v


def _rows_for_frame(scen, frame, tq_keys, tq_hs_in):
    """Shared stub-detector logic: per-track-query rows + Q object rows.
    Each row is (box_xyxy_abs, score, hs)."""
    fr = scen.frames[frame]
    rows = []
    for key, hs_in in zip(tq_keys, tq_hs_in):
        if key is not None and key in fr["tracks"]:
            box, score = fr["tracks"][key]
            rows.append((box, score, scen.hs_vec(key)))
        else:
            rows.append((np.zeros(4, np.float32), 0.0,
                         np.asarray(hs_in, np.float32)))
    for q in range(Q):
        if q < len(fr["dets"]):
            key, box, score = fr["dets"][q]
            rows.append((box, score, scen.hs_vec(key)))
        else:
            rows.append((np.zeros(4, np.float32), 0.0,
                         np.zeros(C, np.float32)))
    boxes = np.stack([r[0] for r in rows]).astype(np.float32)
    scores = np.array([r[1] for r in rows], np.float32)
    hs = np.stack([r[2] for r in rows]).astype(np.float32)
    return boxes, scores, hs


# --- reference (torch) side -------------------------------------------------

class TorchDetectorStub:
    overflow_boxes = False

    def __init__(self, scen):
        self.scen = scen
        self.frame = 0
        self._param = torch.zeros(1)

    @property
    def num_queries(self):
        return Q

    def parameters(self):
        return iter([self._param])

    def __call__(self, img, targets, prev_features):
        if targets is not None:
            hs_in = targets[0]["track_query_hs_embeds"].cpu().numpy()
            keys = [int(round(float(h[0]))) for h in hs_in]
        else:
            hs_in, keys = np.zeros((0, C), np.float32), []
        boxes, scores, hs = _rows_for_frame(self.scen, self.frame, keys,
                                            hs_in)
        self.frame += 1
        out = {
            "hs_embed": torch.from_numpy(hs)[None],
            "_boxes": torch.from_numpy(boxes),
            "_scores": torch.from_numpy(scores),
        }
        return out, None, None, None, None


def _torch_postprocess(outputs, orig_size):
    n = outputs["_scores"].shape[0]
    return [{
        "scores": outputs["_scores"],
        "labels": torch.zeros(n, dtype=torch.long),
        "boxes": outputs["_boxes"],
    }]


def run_reference(scen):
    mod = load_reference().tracker
    tracker = mod.Tracker(
        TorchDetectorStub(scen), {"bbox": _torch_postprocess},
        dict(scen.cfg), generate_attention_maps=False)
    tracker.reset()
    for fr in scen.frames:
        pub = fr["public"]
        dets = torch.from_numpy(pub) if pub is not None else \
            torch.zeros((0, 4))
        blob = {
            "img": torch.zeros(1, 3, H, W),
            "orig_size": torch.tensor([[H, W]], dtype=torch.float32),
            "dets": [dets],
        }
        tracker.step(blob)
    return tracker.get_results(), tracker.num_reids


# --- our (JAX) side ---------------------------------------------------------

def make_jax_apply(scen):
    counter = [0]

    def apply_fn(params, batch, targets, prev_features):
        hs_in = np.asarray(targets.tq_hs_embeds[0])
        valid = np.asarray(targets.tq_valid[0])
        keys = [int(round(float(hs_in[i, 0]))) if valid[i] else None
                for i in range(hs_in.shape[0])]
        boxes, scores, hs = _rows_for_frame(scen, counter[0], keys, hs_in)
        counter[0] += 1
        out = {
            "hs_embed": jnp.asarray(hs)[None],
            "_boxes": jnp.asarray(boxes)[None],
            "_scores": jnp.asarray(scores)[None],
            "_labels": jnp.zeros((1, len(scores)), jnp.int32),
        }
        return out, targets, None, None, None

    return apply_fn


def _jax_postprocess(out, target_sizes):
    return {"scores": out["_scores"], "labels": out["_labels"],
            "boxes": out["_boxes"]}


def run_ours(scen):
    tracker = Tracker(params={}, apply_fn=make_jax_apply(scen),
                      postprocess=_jax_postprocess, tracker_cfg=scen.cfg,
                      hidden_dim=C, num_object_queries=Q)
    with jax.disable_jit():
        for fr in scen.frames:
            pub = fr["public"]
            blob = {
                "batch": FrameBatch.from_images(jnp.zeros((1, 8, 8, 3))),
                "orig_size": np.array([[H, W]]),
            }
            if pub is not None:
                blob["dets"] = pub
            tracker.step(blob)
    return tracker.get_results(), tracker.num_reids


# --- comparison -------------------------------------------------------------

def assert_parity(scen):
    ref_results, ref_reids = run_reference(scen)
    our_results, our_reids = run_ours(scen)

    assert sorted(our_results) == sorted(ref_results), (
        f"track ids differ: ours={sorted(our_results)} "
        f"ref={sorted(ref_results)}")
    for tid in ref_results:
        ref_frames = ref_results[tid]
        our_frames = our_results[tid]
        assert sorted(our_frames) == sorted(ref_frames), (
            f"frames for id {tid}: ours={sorted(our_frames)} "
            f"ref={sorted(ref_frames)}")
        for f in ref_frames:
            np.testing.assert_allclose(
                our_frames[f]["bbox"], ref_frames[f]["bbox"],
                atol=1e-4, err_msg=f"bbox id={tid} frame={f}")
            np.testing.assert_allclose(
                our_frames[f]["score"], ref_frames[f]["score"],
                atol=1e-5, err_msg=f"score id={tid} frame={f}")
            assert our_frames[f]["obj_ind"] == int(ref_frames[f]["obj_ind"]), \
                f"obj_ind id={tid} frame={f}"
    assert our_reids == ref_reids, (ref_reids, our_reids)
    return ref_results


# ---------------------------------------------------------------------------
# Scenarios
# ---------------------------------------------------------------------------

A = [10.0, 10.0, 30.0, 30.0]
B = [60.0, 60.0, 80.0, 80.0]


def test_init_and_persist():
    """Two objects appear, persist and move for 3 frames
    (reference step :266-550, add_tracks :93-122)."""
    s = Scenario(4)
    s.det(0, 1, A, 0.9)
    s.det(0, 2, B, 0.85)
    for f in range(1, 4):
        s.track(f, 1, [10 + 2 * f, 10, 30 + 2 * f, 30], 0.9)
        s.track(f, 2, [60, 60 + 2 * f, 80, 80 + 2 * f], 0.85)
    res = assert_parity(s)
    assert sorted(res) == [0, 1]
    assert sorted(res[0]) == [0, 1, 2, 3]


def test_termination_counter_and_query_revival():
    """A track misses detections: with steps_termination=2 it survives one
    blank frame (old box re-reported, reference :345-359) then goes
    inactive; later its own track query responds above reid_score_thresh
    and revives it (reference :366-377)."""
    s = Scenario(6, steps_termination=2, inactive_patience=5,
                 reid_score_thresh=0.4)
    s.det(0, 1, A, 0.9)
    s.track(1, 1, [12, 10, 32, 30], 0.9)
    # frames 2, 3: no response -> count_termination 1, 2 -> inactive at 3
    s.track(4, 1, [14, 10, 34, 30], 0.9)  # revival via reid_score_thresh
    s.track(5, 1, [16, 10, 36, 30], 0.9)
    res = assert_parity(s)
    assert sorted(res) == [0]
    # frame 2 reported with stale box; frame 3 absent (inactive)
    assert sorted(res[0]) == [0, 1, 2, 4, 5]
    np.testing.assert_allclose(res[0][2]["bbox"], res[0][1]["bbox"])


def test_reid_hungarian():
    """Inactive track revived by a NEW detection whose hs embed is close
    (reference reid() :167-264, Hungarian branch :212-230). A far-embed
    detection gets a fresh id instead."""
    s = Scenario(4, inactive_patience=5, reid_sim_threshold=5.0)
    s.reid_embed[5] = s.reid_embed[1] = (3.0, 4.0)
    s.det(0, 1, A, 0.9)
    s.track(1, 1, [12, 10, 32, 30], 0.9)
    # frame 2: gone -> inactive (steps_termination=1)
    s.det(3, 5, [14, 10, 34, 30], 0.9)  # |hs delta| = |5-1| = 4 <= 5 -> reid
    s.det(3, 6, B, 0.9)                 # far embed -> new track
    res = assert_parity(s)
    assert sorted(res) == [0, 1]
    assert 3 in res[0]  # id 0 revived at frame 3
    np.testing.assert_allclose(res[0][3]["bbox"], [14, 10, 34, 30])


def test_reid_greedy_center_distance():
    """Greedy center-distance ReID branch (reference :181-209)."""
    s = Scenario(3, inactive_patience=5, reid_greedy_matching=True)
    s.det(0, 1, A, 0.9)
    # frame 1: gone -> inactive
    s.det(2, 5, [12, 12, 32, 32], 0.9)  # center dist^2 = 8 < area 400
    res = assert_parity(s)
    assert sorted(res) == [0]
    assert sorted(res[0]) == [0, 2]


def test_track_nms():
    """Two tracks converge onto the same box; track NMS keeps the higher
    score and deletes the other (reference :395-412)."""
    s = Scenario(3)
    s.det(0, 1, A, 0.9)
    s.det(0, 2, B, 0.8)
    s.track(1, 1, B, 0.95)  # key 1 jumps onto key 2's box
    s.track(1, 2, B, 0.80)
    s.track(2, 1, B, 0.95)
    res = assert_parity(s)
    assert sorted(res) == [0, 1]
    assert sorted(res[0]) == [0, 1, 2]
    assert sorted(res[1]) == [0]  # removed by track NMS at frame 1


def test_detection_nms_pins_old_tracks():
    """A new detection overlapping an existing track is removed by the
    detection NMS pass where old tracks carry inf score (reference
    :485-503); its track id is still consumed (add_tracks ran first)."""
    s = Scenario(3)
    s.det(0, 1, A, 0.9)
    s.track(1, 1, A, 0.9)
    s.det(1, 2, A, 0.85)  # same box -> suppressed, but id 1 consumed
    s.track(2, 1, A, 0.9)
    s.det(2, 3, B, 0.9)   # fresh object -> id 2
    res = assert_parity(s)
    assert sorted(res) == [0, 2]


def test_public_detections_center_distance():
    """public_detections='center_distance' keeps only detections whose
    center matches a provided public detection (reference :136-152)."""
    s = Scenario(2, public_detections="center_distance")
    s.det(0, 1, A, 0.9)
    s.det(0, 2, B, 0.9)
    s.public(0, [[11, 11, 31, 31]])  # only key 1 matches
    s.track(1, 1, [12, 10, 32, 30], 0.9)
    s.public(1, np.zeros((0, 4)))
    res = assert_parity(s)
    assert sorted(res) == [0]
    assert sorted(res[0]) == [0, 1]


def test_public_detections_min_iou():
    """public_detections='min_iou_0_5' (reference :153-161)."""
    s = Scenario(2, public_detections="min_iou_0_5")
    s.det(0, 1, A, 0.9)
    s.det(0, 2, B, 0.9)
    s.public(0, [[12, 12, 32, 32]])  # IoU with A ~ 0.68 >= 0.5
    s.track(1, 1, A, 0.9)
    s.public(1, np.zeros((0, 4)))
    res = assert_parity(s)
    assert sorted(res) == [0]


def test_longer_mixed_sequence():
    """A 8-frame stress mix: births, a termination, a reid revival, an NMS
    removal and late births — end-to-end result-dict equality."""
    s = Scenario(8, inactive_patience=6, reid_sim_threshold=5.0,
                 steps_termination=1)
    s.reid_embed[7] = s.reid_embed[2] = (1.0, 2.0)
    s.det(0, 1, A, 0.9)
    s.det(0, 2, B, 0.8)
    s.track(1, 1, [12, 10, 32, 30], 0.9)
    s.track(1, 2, [60, 62, 80, 82], 0.8)
    s.track(2, 1, [14, 10, 34, 30], 0.9)
    # key 2 gone at frame 2 -> inactive
    s.track(3, 1, [16, 10, 36, 30], 0.9)
    s.det(3, 3, [40, 40, 55, 55], 0.7)
    s.track(4, 1, [18, 10, 38, 30], 0.9)
    s.track(4, 3, [41, 40, 56, 55], 0.7)
    s.det(4, 7, [62, 64, 82, 84], 0.85)  # reid -> revives key-2 track
    s.track(5, 1, [20, 10, 40, 30], 0.9)
    s.track(5, 3, [42, 40, 57, 55], 0.7)
    s.track(5, 7, [64, 64, 84, 84], 0.85)
    s.track(6, 1, [22, 10, 42, 30], 0.9)
    s.track(6, 7, [64, 66, 84, 86], 0.85)
    s.det(6, 4, [5, 70, 20, 95], 0.95)
    s.track(7, 1, [24, 10, 44, 30], 0.9)
    s.track(7, 4, [6, 70, 21, 95], 0.95)
    assert_parity(s)
