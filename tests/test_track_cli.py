"""track CLI end-to-end over a synthetic MOT17-layout dataset:
(a) perfect results loaded from files -> MOTA/IDF1 == 1.0 (exercises
factory, seqinfo/gt parsing, MOTChallenge result I/O, metric eval);
(b) a live tiny-model pass (random weights) writes result files."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from synth_data import make_synth_mot  # noqa: E402


@pytest.fixture(scope="module")
def mot17_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthmot17") / "MOT17"
    make_synth_mot(root, n_seqs=1, n_frames=6)
    # rename to a registry-valid sequence name
    src = root / "train" / "SYN-01"
    dst = root / "train" / "MOT17-02-FRCNN"
    src.rename(dst)
    import configparser
    ini = configparser.ConfigParser()
    ini.read(dst / "seqinfo.ini")
    ini["Sequence"]["name"] = "MOT17-02-FRCNN"
    with open(dst / "seqinfo.ini", "w") as f:
        ini.write(f)
    return root.parent


def _gt_as_results(seq):
    results = {}
    for f_idx in range(len(seq)):
        for tid, box in seq.data[f_idx]["gt"].items():
            results.setdefault(tid - 1, {})[f_idx] = {
                "bbox": np.asarray(box, np.float32), "score": 1.0}
    return results


def test_loaded_results_perfect_mota(mot17_root, tmp_path):
    from trackformer_tpu.cli.track import main
    from trackformer_tpu.datasets.tracking import TrackDatasetFactory

    dataset = TrackDatasetFactory("MOT17-02-FRCNN",
                                  root_dir=str(mot17_root),
                                  img_transform=None)
    seq = dataset[0]
    res_dir = tmp_path / "results"
    seq.write_results(_gt_as_results(seq), str(res_dir))
    assert (res_dir / "MOT17-02-FRCNN.txt").exists()

    summary = main([
        "with", "dataset_name=MOT17-02-FRCNN",
        f"data_root_dir={mot17_root}",
        f"load_results_dir={res_dir}",
        "obj_detect_checkpoint_file=null",
        "output_dir=null",
    ])
    overall = summary["OVERALL"]
    assert overall["mota"] == pytest.approx(1.0)
    assert overall["idf1"] == pytest.approx(1.0)
    assert overall["num_switches"] == 0


def test_live_tracker_writes_results(mot17_root, tmp_path):
    import yaml

    from trackformer_tpu.cli.track import main
    from trackformer_tpu.models import build_model
    from trackformer_tpu.structures import FrameBatch
    from trackformer_tpu.utils.checkpoint import save_params_npz
    from trackformer_tpu.utils.config import load_config, nested_namespace

    import jax
    import jax.numpy as jnp

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    cfg = load_config("train.yaml", ["deformable", "tracking"], {
        "enc_layers": 1, "dec_layers": 1, "hidden_dim": 96, "nheads": 4,
        "dim_feedforward": 128, "num_queries": 8, "dataset": "mot",
        "img_transform.max_size": 170, "img_transform.val_width": 128})
    cfg["tpu"]["compute_dtype"] = "float32"
    cfg["tpu"]["max_tracks"] = 8
    with open(model_dir / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    args = nested_namespace(cfg)
    model, _, _, _ = build_model(args)
    batch = FrameBatch.from_images(jnp.zeros((1, 64, 64, 3)),
                                   jnp.array([[64, 64]]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    save_params_npz(params, model_dir / "checkpoint.npz")

    out_dir = tmp_path / "out"
    main([
        "with", "dataset_name=MOT17-02-FRCNN",
        f"data_root_dir={mot17_root}",
        f"obj_detect_checkpoint_file={model_dir / 'checkpoint.npz'}",
        f"output_dir={out_dir}",
        "write_images=pretty",
        "interpolate=true",
    ])
    assert (out_dir / "MOT17-02-FRCNN.txt").exists()
    # frame rendering ran (plot_sequence)
    assert (out_dir / "MOT17-02-FRCNN").is_dir()


def test_attention_maps_vanilla_detr(mot17_root, tmp_path):
    """generate_attention_maps: vanilla DETR only; maps reach the results."""
    import yaml
    import jax
    import jax.numpy as jnp

    from trackformer_tpu.cli.track import main
    from trackformer_tpu.models import build_model
    from trackformer_tpu.structures import FrameBatch
    from trackformer_tpu.utils.checkpoint import save_params_npz
    from trackformer_tpu.utils.config import load_config, nested_namespace

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    cfg = load_config("train.yaml", ["tracking"], {
        "enc_layers": 1, "dec_layers": 1, "hidden_dim": 64, "nheads": 4,
        "dim_feedforward": 64, "num_queries": 6, "dataset": "mot",
        "img_transform.max_size": 170, "img_transform.val_width": 128})
    cfg["tpu"]["compute_dtype"] = "float32"
    cfg["tpu"]["max_tracks"] = 6
    with open(model_dir / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    args = nested_namespace(cfg)
    model, _, _, _ = build_model(args)
    batch = FrameBatch.from_images(jnp.zeros((1, 64, 64, 3)),
                                   jnp.array([[64, 64]]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    save_params_npz(params, model_dir / "checkpoint.npz")

    main([
        "with", "dataset_name=MOT17-02-FRCNN",
        f"data_root_dir={mot17_root}",
        f"obj_detect_checkpoint_file={model_dir / 'checkpoint.npz'}",
        "generate_attention_maps=true",
        f"output_dir={tmp_path / 'out'}",
        "frame_range.end=0.5",
        "tracker_cfg.detection_obj_score_thresh=0.0",
    ])


def test_plot_sequence_attention_overlay_and_video(tmp_path):
    """Attention-map overlay rendering (reference track_utils.py:208-231)
    and the video writer (README ffmpeg workflow; GIF fallback here)."""
    import numpy as np
    from PIL import Image

    from trackformer_tpu.utils.track_utils import plot_sequence, write_video

    frames_dir = tmp_path / "seq"
    frames_dir.mkdir()

    class MiniSeq:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            p = frames_dir / f"{i:06d}.jpg"
            if not p.exists():
                Image.fromarray(
                    np.full((64, 96, 3), 60 + 40 * i, np.uint8)).save(p)
            return {"img_path": str(p)}

    amap = np.zeros((8, 12), np.float32)
    amap[2:4, 3:6] = 1.0
    tracks = {0: {f: {"bbox": np.array([10, 10, 40, 40], np.float32),
                      "score": 0.9, "attention_map": amap}
                  for f in range(2)}}
    out_dir = tmp_path / "plots"
    plot_sequence(tracks, MiniSeq(), str(out_dir),
                  write_images="debug", generate_attention_maps=True)
    written = sorted(out_dir.iterdir())
    assert len(written) == 2

    video = write_video(str(out_dir), str(tmp_path / "clip.mp4"), fps=5)
    assert video.endswith((".mp4", ".gif"))
    import os
    assert os.path.getsize(video) > 0
