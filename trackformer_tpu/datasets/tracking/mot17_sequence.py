"""MOT17 inference sequences: per-frame blobs + MOTChallenge result I/O.

Parity target: /root/reference/src/trackformer/datasets/tracking/
mot17_sequence.py — per-frame blob getitem (:65-83), public det.txt loading
with 1-based -> 0-based conversion (:85-117), gt.txt parsing with class/
certainty/visibility filters (:130-151), seqinfo.ini (:179-194), and the
byte-format of MOTChallenge result files (1-based frame/id, xywh with the
+1/-1 width convention, :209-272).

Blobs carry a bucket-padded FrameBatch so the jitted tracker step sees one
static shape per sequence.
"""
from __future__ import annotations

import configparser
import csv
import os
import os.path as osp
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from ...structures import FrameBatch
from .. import transforms as T


def round_up(x: int, m: int = 64) -> int:
    return ((x + m - 1) // m) * m


def preprocess_frame(img_u8: np.ndarray, resize: "T.FixedResize"):
    """uint8 HWC frame -> (padded float32 array, valid (h, w)).

    Uses the native fused resize+normalize+pad (native/trackformer_native.cpp)
    when built, else the PIL/numpy path."""
    from ... import native
    oh, ow = img_u8.shape[:2]
    th, tw = T.get_size_with_aspect_ratio((oh, ow), resize.size,
                                          resize.max_size)
    bh, bw = round_up(th), round_up(tw)
    out = native.resize_normalize_pad(img_u8, (th, tw), (bh, bw),
                                      T.IMAGENET_MEAN, T.IMAGENET_STD)
    if out is not None:
        return out, (th, tw)
    img = img_u8.astype(np.float32) / 255.0
    img, _ = resize(img, None)
    img, _ = T.Normalize()(img, None)
    h, w = img.shape[:2]
    return np.pad(img, ((0, bh - h), (0, bw - w), (0, 0))), (h, w)


class MOTSequenceBase:
    """One MOTChallenge sequence, iterated frame by frame."""

    data_folder = "MOT17"

    def __init__(self, root_dir: str = "data", seq_name: Optional[str] = None,
                 dets: Optional[str] = None, vis_threshold: float = 0.0,
                 img_transform=None):
        self._seq_name = seq_name
        self._dets = dets
        self._vis_threshold = vis_threshold
        self._data_dir = osp.join(root_dir, self.data_folder)
        val_width = int(getattr(img_transform, "val_width", 800) or 800)
        max_size = int(getattr(img_transform, "max_size", 1333) or 1333)
        self._resize = T.FixedResize(val_width, max_size=max_size)
        self._normalize = T.Normalize()

        self.data: List[dict] = []
        self.no_gt = True
        if seq_name is not None:
            train = set(os.listdir(osp.join(self._data_dir, "train"))) \
                if osp.isdir(osp.join(self._data_dir, "train")) else set()
            test = set(os.listdir(osp.join(self._data_dir, "test"))) \
                if osp.isdir(osp.join(self._data_dir, "test")) else set()
            full = str(self)
            assert full in train or full in test, \
                f"Image set does not exist: {full}"
            self._train_folders, self._test_folders = train, test
            self.data = self._sequence()
            self.no_gt = not osp.exists(self.get_gt_file_path())

    def __str__(self):
        if self._dets is None:
            return str(self._seq_name)
        return f"{self._seq_name}-{self._dets}"

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> dict:
        d = self.data[idx]
        with Image.open(d["im_path"]) as im:
            img_u8 = np.asarray(im.convert("RGB"))
        oh, ow = img_u8.shape[:2]
        padded, (h, w) = preprocess_frame(img_u8, self._resize)
        bh, bw = padded.shape[:2]
        ys = np.arange(bh)[:, None]
        xs = np.arange(bw)[None, :]
        mask = (ys >= h) | (xs >= w)
        return {
            "batch": FrameBatch(images=padded[None],
                                mask=mask[None]),
            "dets": np.asarray([det[:4] for det in d["dets"]],
                               np.float32).reshape(-1, 4),
            "img_path": d["im_path"],
            "gt": d["gt"],
            "vis": d["vis"],
            "orig_size": np.array([[oh, ow]], np.int32),
            "size": np.array([[h, w]], np.int32),
        }

    # --- sequence layout -------------------------------------------------
    def get_seq_path(self) -> str:
        full = str(self)
        sub = "train" if full in self._train_folders else "test"
        return osp.join(self._data_dir, sub, full)

    @property
    def config(self) -> dict:
        cfg = configparser.ConfigParser()
        cfg.read(osp.join(self.get_seq_path(), "seqinfo.ini"))
        return cfg

    @property
    def seq_length(self) -> int:
        return int(self.config["Sequence"]["seqLength"])

    def get_gt_file_path(self) -> str:
        return osp.join(self.get_seq_path(), "gt", "gt.txt")

    def get_det_file_path(self) -> str:
        if self._dets is None:
            return ""
        return osp.join(self.get_seq_path(), "det", "det.txt")

    def _sequence(self) -> List[dict]:
        dets = {i: [] for i in range(1, self.seq_length + 1)}
        det_file = self.get_det_file_path()
        if det_file and osp.exists(det_file):
            with open(det_file) as f:
                for row in csv.reader(f):
                    x1 = float(row[2]) - 1
                    y1 = float(row[3]) - 1
                    x2 = x1 + float(row[4]) - 1
                    y2 = y1 + float(row[5]) - 1
                    dets[int(float(row[0]))].append(
                        np.array([x1, y1, x2, y2, float(row[6])],
                                 np.float32))
        boxes, vis = self.get_track_boxes_and_visibility()
        img_dir = osp.join(self.get_seq_path(),
                           self.config["Sequence"]["imDir"])
        ext = self.config["Sequence"].get("imExt", ".jpg")
        return [
            {"gt": boxes[i], "vis": vis[i], "dets": dets[i],
             "im_path": osp.join(img_dir, f"{i:06d}{ext}")}
            for i in range(1, self.seq_length + 1)]

    def get_track_boxes_and_visibility(self) -> Tuple[dict, dict]:
        boxes = {i: {} for i in range(1, self.seq_length + 1)}
        vis = {i: {} for i in range(1, self.seq_length + 1)}
        gt_file = self.get_gt_file_path()
        if not osp.exists(gt_file):
            return boxes, vis
        with open(gt_file) as f:
            for row in csv.reader(f):
                # pedestrian class, considered flag, visibility threshold
                if int(row[6]) == 1 and int(row[7]) == 1 and \
                        float(row[8]) >= self._vis_threshold:
                    x1 = int(row[2]) - 1
                    y1 = int(row[3]) - 1
                    x2 = x1 + int(row[4]) - 1
                    y2 = y1 + int(row[5]) - 1
                    frame, tid = int(row[0]), int(row[1])
                    boxes[frame][tid] = np.array([x1, y1, x2, y2], np.float32)
                    vis[frame][tid] = float(row[8])
        return boxes, vis

    # --- results I/O ------------------------------------------------------
    @property
    def results_file_name(self) -> str:
        assert self._seq_name is not None
        if self._dets is None:
            return f"{self._seq_name}.txt"
        return f"{self}.txt"

    def write_results(self, results: Dict[int, Dict[int, dict]],
                      output_dir: str) -> None:
        os.makedirs(output_dir, exist_ok=True)
        path = osp.join(output_dir, self.results_file_name)
        with open(path, "w") as f:
            writer = csv.writer(f)
            for tid, track in results.items():
                for frame, data in track.items():
                    x1, y1, x2, y2 = data["bbox"][:4]
                    writer.writerow([frame + 1, tid + 1, x1 + 1, y1 + 1,
                                     x2 - x1 + 1, y2 - y1 + 1,
                                     -1, -1, -1, -1])

    def load_results(self, results_dir: Optional[str]) -> dict:
        results: Dict[int, Dict[int, dict]] = {}
        if results_dir is None:
            return results
        path = osp.join(results_dir, self.results_file_name)
        if not osp.isfile(path):
            return results
        with open(path) as f:
            for row in csv.reader(f):
                frame, tid = int(row[0]) - 1, int(row[1]) - 1
                x1 = float(row[2]) - 1
                y1 = float(row[3]) - 1
                x2 = float(row[4]) - 1 + x1
                y2 = float(row[5]) - 1 + y1
                results.setdefault(tid, {})[frame] = {
                    "bbox": [x1, y1, x2, y2], "score": 1.0}
        return results


class MOT17Sequence(MOTSequenceBase):
    data_folder = "MOT17"
