"""Synthetic mini-MOT dataset generator for integration tests: colored
rectangles moving across tiny frames, converted-COCO layout with track_id /
frame_id / seq_length / first_frame_image_id fields plus MOTChallenge
sequence dirs (seqinfo.ini, gt/gt.txt, img1/)."""
from __future__ import annotations

import configparser
import json
import os
from pathlib import Path

import numpy as np
from PIL import Image


def make_synth_mot(root: Path, n_seqs: int = 2, n_frames: int = 6,
                   hw=(128, 160), n_objects: int = 2, seed: int = 0):
    root = Path(root)
    rng = np.random.RandomState(seed)
    h, w = hw
    images, annotations = [], []
    img_id, ann_id = 0, 0

    for s in range(n_seqs):
        seq_name = f"SYN-{s + 1:02d}"
        seq_dir = root / "train" / seq_name
        (seq_dir / "img1").mkdir(parents=True, exist_ok=True)
        (seq_dir / "gt").mkdir(parents=True, exist_ok=True)

        starts = rng.randint(10, 60, (n_objects, 2))
        vels = rng.randint(-4, 5, (n_objects, 2))
        sizes = rng.randint(18, 30, (n_objects, 2))
        colors = rng.randint(60, 255, (n_objects, 3))

        first_id = img_id
        gt_lines = []
        for f in range(n_frames):
            img = np.full((h, w, 3), 16, np.uint8)
            fname = f"{f + 1:06d}.jpg"
            for o in range(n_objects):
                x = int(starts[o, 0] + vels[o, 0] * f)
                y = int(starts[o, 1] + vels[o, 1] * f)
                bw, bh = int(sizes[o, 0]), int(sizes[o, 1])
                x = max(0, min(w - bw - 1, x))
                y = max(0, min(h - bh - 1, y))
                img[y:y + bh, x:x + bw] = colors[o]
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [x, y, bw, bh], "area": bw * bh,
                    "iscrowd": 0, "track_id": s * n_objects + o,
                    "ignore": 0, "visibility": 1.0,
                })
                ann_id += 1
                gt_lines.append(
                    f"{f + 1},{o + 1},{x + 1},{y + 1},{bw},{bh},1,1,1.0")
            Image.fromarray(img).save(seq_dir / "img1" / fname)
            images.append({
                "id": img_id, "file_name": f"{seq_name}/img1/{fname}",
                "height": h, "width": w, "frame_id": f,
                "seq_length": n_frames, "first_frame_image_id": first_id,
            })
            img_id += 1

        (seq_dir / "gt" / "gt.txt").write_text("\n".join(gt_lines) + "\n")
        ini = configparser.ConfigParser()
        ini["Sequence"] = {
            "name": seq_name, "imDir": "img1", "frameRate": "30",
            "seqLength": str(n_frames), "imWidth": str(w),
            "imHeight": str(h), "imExt": ".jpg"}
        with open(seq_dir / "seqinfo.ini", "w") as f:
            ini.write(f)

    (root / "annotations").mkdir(parents=True, exist_ok=True)
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }
    with open(root / "annotations" / "synth_train.json", "w") as f:
        json.dump(coco, f)
    return root
