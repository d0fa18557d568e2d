"""Joint-transform semantics + adjacent-frame augmentation consistency."""
import sys
from pathlib import Path

import numpy as np

from trackformer_tpu.datasets import transforms as T

sys.path.insert(0, str(Path(__file__).parent))


def make_sample(h=100, w=160):
    img = np.random.RandomState(0).rand(h, w, 3).astype(np.float32)
    target = {
        "boxes": np.array([[20.0, 30.0, 60.0, 90.0]], np.float32),
        "labels": np.array([0]),
        "area": np.array([40.0 * 60.0], np.float32),
        "iscrowd": np.array([0]),
        "track_ids": np.array([7]),
        "ignore": np.zeros(1, bool),
        "size": np.array([h, w]),
        "orig_size": np.array([h, w]),
        "image_id": np.int64(0),
    }
    return img, target


def test_resize_aspect_and_max_size():
    img, target = make_sample(100, 160)
    out, t = T.resize(img, target, 200, max_size=250)
    h, w = out.shape[:2]
    assert max(h, w) <= 250
    np.testing.assert_allclose(w / h, 160 / 100, rtol=0.02)
    np.testing.assert_allclose(t["boxes"][0],
                               [20 * w / 160, 30 * h / 100,
                                60 * w / 160, 90 * h / 100], rtol=1e-5)


def test_hflip_boxes():
    img, target = make_sample()
    out, t = T.hflip(img, target)
    np.testing.assert_allclose(t["boxes"][0], [160 - 60, 30, 160 - 20, 90])
    np.testing.assert_array_equal(out[:, 0], img[:, -1])


def test_crop_clip_vs_overflow():
    img, target = make_sample()
    _, t_clip = T.crop(img, dict(target), (0, 40, 100, 60))
    # box [20,30,60,90] - left 40 -> [-20, 30, 20, 90] clipped to [0,...,20]
    np.testing.assert_allclose(t_clip["boxes"][0], [0, 30, 20, 90])
    _, t_over = T.crop(img, dict(target), (0, 40, 100, 60),
                       overflow_boxes=True)
    np.testing.assert_allclose(t_over["boxes"][0], [-20, 30, 20, 90])


def test_crop_drops_outside_boxes():
    img, target = make_sample()
    _, t = T.crop(img, dict(target), (0, 100, 100, 60))
    assert len(t["boxes"]) == 0
    assert len(t["labels"]) == 0


def test_normalize_cxcywh():
    img, target = make_sample()
    _, t = T.Normalize()(img, dict(target))
    np.testing.assert_allclose(
        t["boxes"][0], [40 / 160, 60 / 100, 40 / 160, 60 / 100], rtol=1e-5)


def test_seed_replay_consistent_base_augmentation():
    """Same rng seed -> identical stochastic transform decisions (the
    mechanism aligning adjacent-frame augmentations, reference coco.py:48)."""
    pipeline = T.make_coco_transforms("train", None, False)
    pipeline.transforms = pipeline.transforms[:-1]
    img, target = make_sample(400, 600)
    out1, t1 = pipeline(img, dict(target), np.random.default_rng(123))
    out2, t2 = pipeline(img, dict(target), np.random.default_rng(123))
    assert out1.shape == out2.shape
    np.testing.assert_allclose(out1, out2)
    if len(t1["boxes"]) and len(t2["boxes"]):
        np.testing.assert_allclose(t1["boxes"], t2["boxes"])


def test_mot_dataset_prev_frame_within_range(tmp_path):
    from synth_data import make_synth_mot
    from trackformer_tpu.datasets.mot import MOT
    from trackformer_tpu.datasets import transforms as TT

    root = make_synth_mot(tmp_path / "mot", n_seqs=1, n_frames=8)
    tr = TT.Compose([TT.FixedResize(128, max_size=160)])
    ds = MOT(root / "train", root / "annotations" / "synth_train.json",
             tr, TT.Normalize(), prev_frame=True, prev_frame_range=2,
             prev_frame_rnd_augs=0.05)
    sample = ds[4]
    assert "prev_image" in sample and "prev_target" in sample
    assert sample["image"].shape == sample["prev_image"].shape
    # prev frame's objects share track ids with the current frame
    cur_ids = set(sample["target"]["track_ids"].tolist())
    prev_ids = set(sample["prev_target"]["track_ids"].tolist())
    assert cur_ids & prev_ids
