"""CrowdHuman odgt -> converted-COCO JSON.

Parity target: /root/reference/src/generate_coco_from_crowdhuman.py — one
annotation per visible human full-box ('fbox'), ignore flags from the odgt
head/extra attributes, synthetic single-frame "sequences".

Usage: python tools/generate_coco_from_crowdhuman.py \
           --data-root data/CrowdHuman --splits train val
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp


def generate(split: str, data_root: str):
    odgt = osp.join(data_root, f"annotation_{split}.odgt")
    out = {
        "type": "instances",
        "images": [],
        "annotations": [],
        "categories": [{"supercategory": "person", "name": "person",
                        "id": 1}],
    }
    img_id = 0
    ann_id = 0
    with open(odgt) as f:
        for line in f:
            rec = json.loads(line)
            file_name = f"{rec['ID']}.jpg"
            out["images"].append({
                "file_name": file_name, "id": img_id,
                # single synthetic frame per "sequence"
                "frame_id": 0, "seq_length": 1,
                "first_frame_image_id": img_id,
            })
            for gt in rec.get("gtboxes", []):
                if gt.get("tag") != "person":
                    continue
                extra = gt.get("extra", {})
                ignore = int(extra.get("ignore", 0))
                x, y, w, h = [int(v) for v in gt["fbox"]]
                out["annotations"].append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                    "ignore": ignore, "visibility": 1.0,
                    "track_id": ann_id,
                })
                ann_id += 1
            img_id += 1

    os.makedirs(osp.join(data_root, "annotations"), exist_ok=True)
    name = "train_val" if split == "trainval" else split
    path = osp.join(data_root, "annotations", f"{name}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}: {img_id} images, {ann_id} annotations")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data/CrowdHuman")
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    args = ap.parse_args()
    for split in args.splits:
        generate(split, args.data_root)


if __name__ == "__main__":
    main()
