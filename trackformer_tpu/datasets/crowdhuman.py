"""CrowdHuman dataset (reference datasets/crowdhuman.py:10-32): COCO-style
JSON over the CrowdHuman images, synthetic prev frame via jitter crop."""
from __future__ import annotations

from pathlib import Path

from . import transforms as T
from .coco import CocoDetection


def build_crowdhuman(image_set: str, args):
    root = Path(args.crowdhuman_path)
    split = args.crowdhuman_train_split
    ann_file = root / "annotations" / f"{split}.json"
    img_folder = root / f"{split}"
    transforms = T.make_coco_transforms(
        image_set, args.img_transform, args.overflow_boxes)
    transforms.transforms = transforms.transforms[:-1]
    return CocoDetection(
        img_folder, ann_file, transforms, T.Normalize(),
        prev_frame=args.tracking,
        prev_frame_rnd_augs=args.coco_and_crowdhuman_prev_frame_rnd_augs,
        prev_prev_frame=args.track_prev_prev_frame,
        return_masks=args.masks,
        overflow_boxes=args.overflow_boxes)
