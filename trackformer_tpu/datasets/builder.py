"""Dataset facade + fixed-shape batch collation.

`build_dataset(split, args)` mirrors the reference facade
(/root/reference/src/trackformer/datasets/__init__.py:29-50).

`collate_fn` replaces NestedTensor pad-to-batch-max
(/root/reference/src/trackformer/util/misc.py:294-326) with padding to a
static (H, W) bucket from `args.tpu.image_buckets` and padding targets to
`max_objects` slots — every batch has one of a small set of shapes, so jit
recompiles are bounded.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..structures import FrameBatch, Targets


def get_coco_api_from_dataset(dataset):
    """Unwrap concat datasets to the underlying COCO-style dataset
    (reference datasets/__init__.py:15-26)."""
    for _ in range(10):
        if hasattr(dataset, "anns_by_image"):
            return dataset
        if hasattr(dataset, "datasets"):
            dataset = dataset.datasets[0]
        else:
            break
    raise TypeError(f"no COCO-style dataset inside {type(dataset)}")


def build_dataset(image_set: str, args):
    from .coco import build_coco
    from .crowdhuman import build_crowdhuman
    from .mot import build_mot, build_mot_coco_person, build_mot_crowdhuman

    if args.dataset == "coco":
        return build_coco(image_set, args)
    if args.dataset == "coco_person":
        return build_coco(image_set, args, mode="person_keypoints")
    if args.dataset == "mot":
        return build_mot(image_set, args)
    if args.dataset == "mot_crowdhuman":
        return build_mot_crowdhuman(image_set, args)
    if args.dataset == "mot_coco_person":
        return build_mot_coco_person(image_set, args)
    if args.dataset == "crowdhuman":
        return build_crowdhuman(image_set, args)
    if args.dataset == "coco_panoptic":
        from .coco_panoptic import build_coco_panoptic
        return build_coco_panoptic(image_set, args)
    raise ValueError(f"dataset {args.dataset!r} not supported")


def pick_bucket(hw_list: Sequence[Tuple[int, int]],
                buckets: Sequence[Tuple[int, int]]) -> Tuple[int, int]:
    """Smallest bucket that fits every (h, w); falls back to the largest."""
    hmax = max(h for h, _ in hw_list)
    wmax = max(w for _, w in hw_list)
    for bh, bw in sorted(buckets, key=lambda b: b[0] * b[1]):
        if bh >= hmax and bw >= wmax:
            return int(bh), int(bw)
    return tuple(max(buckets, key=lambda b: b[0] * b[1]))


def pad_image(img: np.ndarray, bucket: Tuple[int, int]) -> np.ndarray:
    h, w = img.shape[:2]
    bh, bw = bucket
    if h > bh or w > bw:
        raise ValueError(
            f"image ({h}, {w}) exceeds the largest bucket ({bh}, {bw}); "
            "add a larger entry to tpu.image_buckets or lower "
            "img_transform.max_size")
    return np.pad(img, ((0, bh - h), (0, bw - w), (0, 0)))


def pad_targets(targets: List[Dict], max_objects: int,
                mask_hw: Optional[Tuple[int, int]] = None) -> Targets:
    b, t = len(targets), max_objects
    labels = np.zeros((b, t), np.int32)
    boxes = np.zeros((b, t, 4), np.float32)
    valid = np.zeros((b, t), bool)
    track_ids = np.full((b, t), -1, np.int32)
    area = np.zeros((b, t), np.float32)
    iscrowd = np.zeros((b, t), np.int32)
    orig_size = np.zeros((b, 2), np.int32)
    size = np.zeros((b, 2), np.int32)
    image_id = np.zeros((b,), np.int32)
    masks = (np.zeros((b, t) + tuple(mask_hw), bool)
             if mask_hw is not None else None)
    for i, tg in enumerate(targets):
        n = min(len(tg["labels"]), t)
        labels[i, :n] = tg["labels"][:n]
        boxes[i, :n] = tg["boxes"][:n]
        valid[i, :n] = True
        track_ids[i, :n] = tg["track_ids"][:n]
        area[i, :n] = tg.get("area", np.zeros(n))[:n]
        iscrowd[i, :n] = tg.get("iscrowd", np.zeros(n))[:n]
        orig_size[i] = tg["orig_size"]
        size[i] = tg["size"]
        image_id[i] = tg["image_id"]
        if masks is not None and "masks" in tg and len(tg["masks"]):
            mh = min(tg["masks"].shape[1], mask_hw[0])
            mw = min(tg["masks"].shape[2], mask_hw[1])
            masks[i, :n, :mh, :mw] = tg["masks"][:n, :mh, :mw]
    return Targets(labels=labels, boxes=boxes, valid=valid,
                   track_ids=track_ids, orig_size=orig_size, size=size,
                   image_id=image_id, area=area, iscrowd=iscrowd, masks=masks)


def collate_fn(samples: List[Dict], buckets: Sequence[Tuple[int, int]],
               max_objects: int, with_masks: bool = False) -> Dict:
    """List of dataset samples -> pack of FrameBatch/Targets (numpy)."""
    frames = [("image", "target", "batch", "targets"),
              ("prev_image", "prev_target", "prev_batch", "prev_targets"),
              ("prev_prev_image", "prev_prev_target", "prev_prev_batch",
               "prev_prev_targets")]
    all_hw = [s[k].shape[:2] for s in samples for k, *_ in frames if k in s]
    bucket = pick_bucket(all_hw, buckets)
    mask_hw = bucket if with_masks else None

    pack = {}
    for img_key, tgt_key, batch_name, targets_name in frames:
        if img_key not in samples[0]:
            continue
        imgs = np.stack([pad_image(s[img_key], bucket) for s in samples])
        valid_hw = np.array([s[img_key].shape[:2] for s in samples],
                            np.int32)
        # numpy mask (keep collate jax-free so it runs in loader workers)
        ys = np.arange(bucket[0])[None, :, None]
        xs = np.arange(bucket[1])[None, None, :]
        mask = (ys >= valid_hw[:, 0][:, None, None]) | (
            xs >= valid_hw[:, 1][:, None, None])
        pack[batch_name] = FrameBatch(images=imgs, mask=mask)
        pack[targets_name] = pad_targets([s[tgt_key] for s in samples],
                                         max_objects, mask_hw)
    return pack
