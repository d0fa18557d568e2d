"""Offline tooling tests over synthetic data (reference counterparts:
/root/reference/src/generate_coco_from_mot.py:36-262,
/root/reference/src/generate_coco_from_crowdhuman.py,
/root/reference/src/compute_best_mean_epoch_from_splits.py,
/root/reference/src/parse_mot_results_to_tex.py)."""
import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent))
from synth_data import make_synth_mot  # noqa: E402

TOOLS = Path(__file__).parent.parent / "tools"


def load_tool(name):
    spec = importlib.util.spec_from_file_location(name, TOOLS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("toolsmot") / "MOT17"
    make_synth_mot(root, n_seqs=2, n_frames=5)
    return root


def test_generate_coco_from_mot(synth_root):
    gen = load_tool("generate_coco_from_mot")
    gen.generate_coco_from_mot("syn_all", str(synth_root),
                               root_split="train")
    ann = json.load(open(synth_root / "annotations" / "syn_all.json"))
    assert ann["sequences"] == ["SYN-01", "SYN-02"]
    assert len(ann["images"]) == 10
    # per-image tracking fields (reference :112-120)
    img0 = ann["images"][0]
    assert img0["frame_id"] == 0 and img0["seq_length"] == 5
    assert img0["first_frame_image_id"] == img0["id"]
    # second sequence's first frame starts its own id block
    seq2_first = [im for im in ann["images"]
                  if im["file_name"].startswith("SYN-02")][0]
    assert seq2_first["first_frame_image_id"] == seq2_first["id"] == 5
    # annotations carry int xywh, track_id, visibility, ignore
    a0 = ann["annotations"][0]
    assert all(isinstance(v, int) for v in a0["bbox"])
    assert {"track_id", "visibility", "ignore"} <= set(a0)
    assert not a0["ignore"]  # synth gt is fully visible
    # frames materialized (symlinks) in the split dir
    assert len(list((synth_root / "syn_all").iterdir())) == 10


def test_generate_coco_from_mot_frame_range(synth_root):
    gen = load_tool("generate_coco_from_mot")
    gen.generate_coco_from_mot("syn_half", str(synth_root),
                               root_split="train",
                               frame_range={"start": 0.0, "end": 0.5})
    ann = json.load(open(synth_root / "annotations" / "syn_half.json"))
    # 5 frames -> first 2 per sequence
    assert len(ann["images"]) == 4
    assert all(im["seq_length"] == 2 for im in ann["images"])


def test_generate_coco_from_crowdhuman(tmp_path):
    gen = load_tool("generate_coco_from_crowdhuman")
    recs = [
        {"ID": "img_a", "gtboxes": [
            {"tag": "person", "fbox": [10, 12, 30, 60], "extra": {}},
            {"tag": "person", "fbox": [50, 5, 20, 40],
             "extra": {"ignore": 1}},
            {"tag": "mask", "fbox": [0, 0, 5, 5], "extra": {}},
        ]},
        {"ID": "img_b", "gtboxes": []},
    ]
    with open(tmp_path / "annotation_val.odgt", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    gen.generate("val", str(tmp_path))
    ann = json.load(open(tmp_path / "annotations" / "val.json"))
    assert len(ann["images"]) == 2
    # synthetic single-frame sequences
    assert all(im["seq_length"] == 1 and im["frame_id"] == 0
               for im in ann["images"])
    # non-person tag dropped; ignore flag carried through
    assert len(ann["annotations"]) == 2
    assert [a["ignore"] for a in ann["annotations"]] == [0, 1]
    assert ann["annotations"][0]["bbox"] == [10, 12, 30, 60]


def test_compute_best_mean_epoch_from_splits(tmp_path, monkeypatch):
    tool = load_tool("compute_best_mean_epoch_from_splits")
    # split A peaks at epoch 2, split B at epoch 3; the MEAN peaks at 2
    data = {"a": {1: 0.3, 2: 0.9, 3: 0.5}, "b": {1: 0.4, 2: 0.6, 3: 0.7}}
    for name, per_epoch in data.items():
        d = tmp_path / name / "vis"
        d.mkdir(parents=True)
        with open(d / "epoch_metrics.jsonl", "w") as f:
            for e, v in per_epoch.items():
                f.write(json.dumps({"epoch": e, "AP": v, "MOTA": 1 - v})
                        + "\n")
    monkeypatch.setattr(sys, "argv", [
        "prog", str(tmp_path / "a"), str(tmp_path / "b"),
        "--metrics", "AP", "MOTA"])
    means = tool.main()
    assert max(means["AP"], key=means["AP"].get) == 2
    assert means["AP"][2] == pytest.approx(0.75)
    # inverted metric picks the other end
    assert max(means["MOTA"], key=means["MOTA"].get) == 1


def test_parse_mot_results_to_tex(synth_root, tmp_path, monkeypatch,
                                  capsys):
    from trackformer_tpu.datasets.tracking import TrackDatasetFactory

    # registry-valid name so the factory can resolve it
    (synth_root / "train" / "SYN-01").rename(
        synth_root / "train" / "MOT17-02-FRCNN")
    import configparser
    ini = configparser.ConfigParser()
    ini.read(synth_root / "train" / "MOT17-02-FRCNN" / "seqinfo.ini")
    ini["Sequence"]["name"] = "MOT17-02-FRCNN"
    with open(synth_root / "train" / "MOT17-02-FRCNN" / "seqinfo.ini",
              "w") as f:
        ini.write(f)

    dataset = TrackDatasetFactory("MOT17-02-FRCNN",
                                  root_dir=str(synth_root.parent),
                                  img_transform=None)
    seq = dataset[0]
    results = {}
    for f_idx in range(len(seq)):
        for tid, box in seq.data[f_idx]["gt"].items():
            results.setdefault(tid - 1, {})[f_idx] = {
                "bbox": np.asarray(box, np.float32), "score": 1.0}
    res_dir = tmp_path / "run_a"
    seq.write_results(results, str(res_dir))

    tool = load_tool("parse_mot_results_to_tex")
    monkeypatch.setattr(sys, "argv", [
        "prog", str(res_dir), "--dataset", "MOT17-02-FRCNN",
        "--data-root", str(synth_root.parent)])
    tool.main()
    out = capsys.readouterr().out
    # perfect results -> 100.0 MOTA / 100.0 IDF1 in the tex row
    assert "run_a & 100.0 & 100.0" in out
    assert r"\midrule" in out


def test_combine_frames(tmp_path, monkeypatch):
    tool = load_tool("combine_frames")
    for d in ("a", "b"):
        (tmp_path / d).mkdir()
    for name in ("000001.jpg", "000002.jpg"):
        Image.fromarray(np.full((8, 6, 3), 40, np.uint8)).save(
            tmp_path / "a" / name)
        Image.fromarray(np.full((8, 6, 3), 200, np.uint8)).save(
            tmp_path / "b" / name)
    # only-in-one-dir frames are skipped
    Image.fromarray(np.zeros((8, 6, 3), np.uint8)).save(
        tmp_path / "a" / "000003.jpg")
    monkeypatch.setattr(sys, "argv", [
        "prog", str(tmp_path / "a"), str(tmp_path / "b"),
        str(tmp_path / "out")])
    tool.main()
    outs = sorted(p.name for p in (tmp_path / "out").iterdir())
    assert outs == ["000001.jpg", "000002.jpg"]
    with Image.open(tmp_path / "out" / "000001.jpg") as im:
        assert im.size == (12, 8)  # side-by-side


def test_track_param_search_grid(monkeypatch):
    """The search must sweep the full grid through the track CLI and pick
    the best MOTA (CLI itself is covered by test_track_cli)."""
    tool = load_tool("track_param_search")
    calls = []

    class FakeCli:
        @staticmethod
        def main(argv):
            calls.append(list(argv))
            thresh = float(
                [a for a in argv if "detection_obj_score_thresh" in a][0]
                .split("=")[1])
            return {"OVERALL": {"mota": thresh, "idf1": 0.5}}

    monkeypatch.setitem(sys.modules, "trackformer_tpu.cli.track", FakeCli)
    import trackformer_tpu.cli as cli_pkg
    monkeypatch.setattr(cli_pkg, "track", FakeCli, raising=False)
    best = tool.main(["with", "dataset_name=X"])
    n_combos = 3 * 3  # grid size
    assert len(calls) == n_combos
    assert best["mota"] == pytest.approx(0.5)
    assert all(any("track_nms_thresh=0.9" in a for a in c) for c in calls)


def test_agreement_preds_to_anns_filters_background(monkeypatch):
    """Pseudo-GT for the cross-agreement metric must drop non-person
    detections: reference-parity focal postprocess keeps the trained
    background column in its max (deformable_detr.py:316), so ~Q
    high-score background rows per image are expected model output."""
    monkeypatch.setattr(sys, "argv", ["fast_exact_agreement.py"])
    ag = load_tool("fast_exact_agreement")
    preds = {0: {
        "boxes": np.array([[0., 0., 10., 10.],
                           [5., 5., 20., 20.],
                           [1., 1., 2., 2.]]),
        "scores": np.array([0.9, 0.95, 0.2]),
        "labels": np.array([0, 19, 0]),
    }}
    anns = ag.preds_to_anns(preds, score_thresh=0.5)
    assert len(anns[0]) == 1  # label-19 and low-score rows dropped
    assert anns[0][0]["bbox"] == [0.0, 0.0, 10.0, 10.0]
    assert anns[0][0]["category_id"] == 0
