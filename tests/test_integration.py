"""End-to-end integration: tiny tracking training run + tracking inference
over the synthetic MOT dataset (SURVEY.md §4 implication (d))."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))
from synth_data import make_synth_mot  # noqa: E402

TINY = [
    "deformable", "tracking",
    "enc_layers=1", "dec_layers=2", "hidden_dim=96", "nheads=4",
    "dim_feedforward=128", "num_queries=12", "batch_size=2",
    "num_workers=0", "epochs=1", "val_interval=0", "debug=true",
    "track_prev_frame_range=2",
    "img_transform.max_size=160", "img_transform.val_width=128",
    "tpu.image_buckets=[[128,160]]", "tpu.max_objects=8",
    "tpu.compute_dtype=float32", "tpu.remat=false",
]


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthmot")
    return make_synth_mot(root)


def test_train_debug_epoch(synth_root, tmp_path):
    from trackformer_tpu.cli.train import main
    out = tmp_path / "out"
    state = main([
        "with", *TINY,
        "dataset=mot",
        f"mot_path_train={synth_root}", f"mot_path_val={synth_root}",
        "train_split=synth_train", "val_split=synth_train",
        "tracking_eval=false",
        f"output_dir={out}",
    ])
    assert int(state.step) >= 1
    assert (out / "config.yaml").exists()
    assert (out / "checkpoint_params.npz").exists()


def test_eval_only_coco_map(synth_root, tmp_path):
    from trackformer_tpu.cli.train import main
    stats = main([
        "with", *TINY,
        "dataset=mot", "eval_only=true", "tracking_eval=false",
        f"mot_path_train={synth_root}", f"mot_path_val={synth_root}",
        "train_split=synth_train", "val_split=synth_train",
    ])
    assert "coco_eval_bbox" in stats
    assert len(stats["coco_eval_bbox"]) == 12


def test_tracking_eval_during_training(synth_root, tmp_path):
    """eval_only + tracking_eval: the in-process track CLI runs with the
    live model and MOTA/IDF1 land in the stats (engine.py:283-337 parity)."""
    import shutil
    import configparser

    # mirror the synthetic data under a MOT17-registry-valid name
    mot_root = tmp_path / "data" / "MOT17"
    (mot_root / "train").mkdir(parents=True)
    src = synth_root / "train" / "SYN-01"
    dst = mot_root / "train" / "MOT17-02-FRCNN"
    shutil.copytree(src, dst)
    ini = configparser.ConfigParser()
    ini.read(dst / "seqinfo.ini")
    ini["Sequence"]["name"] = "MOT17-02-FRCNN"
    with open(dst / "seqinfo.ini", "w") as f:
        ini.write(f)

    from trackformer_tpu.cli.train import main
    stats = main([
        "with", *TINY,
        "dataset=mot", "eval_only=true", "tracking_eval=true",
        f"mot_path_train={synth_root}", f"mot_path_val={synth_root}",
        "train_split=synth_train", "val_split=synth_train",
        "val_track_dataset=MOT17-02-FRCNN",
        f"data_root_dir={tmp_path / 'data'}",
    ])
    assert "MOTA" in stats and "IDF1" in stats


def test_checkpoint_resume_optimizer(synth_root, tmp_path):
    """Train 1 epoch, then resume with optimizer state (orbax round trip)."""
    from trackformer_tpu.cli.train import main
    out = tmp_path / "out"
    common = [
        "with", *TINY, "dataset=mot",
        f"mot_path_train={synth_root}", f"mot_path_val={synth_root}",
        "train_split=synth_train", "val_split=synth_train",
        "tracking_eval=false", f"output_dir={out}",
    ]
    state1 = main(common)
    steps1 = int(state1.step)
    state2 = main(common + ["resume_optim=true", "epochs=2"])
    assert int(state2.step) > steps1


def test_train_model_parallel(synth_root, tmp_path):
    """tpu.model_parallel=2 trains through the CLI on a (data, model) mesh
    with attention/FFN params actually sharded over the model axis."""
    from trackformer_tpu.cli.train import main
    import jax
    out = tmp_path / "out_mp"
    state = main([
        "with", *TINY,
        "dataset=mot",
        f"mot_path_train={synth_root}", f"mot_path_val={synth_root}",
        "train_split=synth_train", "val_split=synth_train",
        "tracking_eval=false", "tpu.model_parallel=2",
        f"output_dir={out}",
    ])
    assert int(state.step) >= 1
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    model_sharded = [
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for kp, leaf in flat
        if "model" in str(getattr(leaf, "sharding", ""))]
    assert any(p.endswith("linear1/kernel") for p in model_sharded), \
        model_sharded[:5]
