"""MOTS20 sequence: RLE mask ground truth + MOTS result files.

Parity target: /root/reference/src/trackformer/datasets/tracking/
mots20_sequence.py — mask GT loading (:35-70, `load_mots_gt` :150-194) and
MOTS result txt lines `frame id class_id h w rle` with 2000+id numbering
(:72-134). RLE codec is our own (utils/rle.py), pycocotools-free.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict

import numpy as np

from ...utils import rle
from .mot17_sequence import MOTSequenceBase


def load_mots_gt(gt_file: str) -> Dict[int, list]:
    """Parse a MOTS txt file -> {frame: [objects]} with decoded masks."""
    objects_per_frame: Dict[int, list] = {}
    with open(gt_file) as f:
        for line in f:
            fields = line.strip().split(" ")
            if not fields or not fields[0]:
                continue
            frame = int(fields[0])
            obj = {
                "track_id": int(fields[1]),
                "class_id": int(fields[2]),
                "mask": {"size": [int(fields[3]), int(fields[4])],
                         "counts": fields[5]},
            }
            objects_per_frame.setdefault(frame, []).append(obj)
    return objects_per_frame


class MOTS20Sequence(MOTSequenceBase):
    data_folder = "MOTS20"

    def get_track_boxes_and_visibility(self):
        boxes = {i: {} for i in range(1, self.seq_length + 1)}
        vis = {i: {} for i in range(1, self.seq_length + 1)}
        gt_file = self.get_gt_file_path()
        if not osp.exists(gt_file):
            return boxes, vis
        for frame, objs in load_mots_gt(gt_file).items():
            for obj in objs:
                if obj["class_id"] != 2:  # MOTS pedestrian class
                    continue
                mask = rle.decode_mask(obj["mask"])
                ys, xs = np.nonzero(mask)
                if not len(ys):
                    continue
                tid = obj["track_id"] % 1000
                boxes[frame][tid] = np.array(
                    [xs.min(), ys.min(), xs.max(), ys.max()], np.float32)
                vis[frame][tid] = 1.0
        return boxes, vis

    def get_gt_file_path(self) -> str:
        return osp.join(self.get_seq_path(), "gt", "gt.txt")

    def write_results(self, results: dict, output_dir: str) -> None:
        os.makedirs(output_dir, exist_ok=True)
        path = osp.join(output_dir, self.results_file_name)
        with open(path, "w") as f:
            for tid, track in results.items():
                for frame, data in track.items():
                    if "mask" not in data:
                        continue
                    mask = np.asarray(data["mask"], bool)
                    enc = rle.encode_mask(mask)
                    f.write(f"{frame + 1} {2000 + tid + 1} 2 "
                            f"{enc['size'][0]} {enc['size'][1]} "
                            f"{enc['counts']}\n")

    def load_results(self, results_dir):
        results: dict = {}
        if results_dir is None:
            return results
        path = osp.join(results_dir, self.results_file_name)
        if not osp.isfile(path):
            return results
        for frame, objs in load_mots_gt(path).items():
            for obj in objs:
                tid = obj["track_id"] - 2000 - 1
                mask = rle.decode_mask(obj["mask"])
                ys, xs = np.nonzero(mask)
                box = ([xs.min(), ys.min(), xs.max(), ys.max()]
                       if len(ys) else [0, 0, 0, 0])
                results.setdefault(tid, {})[frame - 1] = {
                    "bbox": np.asarray(box, np.float32),
                    "mask": mask, "score": 1.0}
        return results
