"""Demo sequence: a directory of images OR a video file.

Parity target: /root/reference/src/trackformer/datasets/tracking/
demo_sequence.py:22-113 (directory-of-images). Extended to decode video
files with OpenCV since the bundled demo clip is an .mp4.
"""
from __future__ import annotations

import csv
import os
import os.path as osp
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image

from ...structures import FrameBatch
from .. import transforms as T

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp"}
VID_EXTS = {".mp4", ".avi", ".mov", ".mkv"}


class DemoSequence:
    data_folder = "DEMO"

    def __init__(self, root_dir: str = "data", img_transform=None):
        self._data_dir = Path(root_dir)
        assert self._data_dir.exists(), f"data_root_dir not found: {root_dir}"
        val_width = int(getattr(img_transform, "val_width", 800) or 800)
        max_size = int(getattr(img_transform, "max_size", 1333) or 1333)
        self._resize = T.FixedResize(val_width, max_size=max_size)
        self._normalize = T.Normalize()
        self._frames: List[np.ndarray] = []
        self._paths: List[str] = []

        files = sorted(self._data_dir.iterdir()) \
            if self._data_dir.is_dir() else [self._data_dir]
        video = [f for f in files if f.suffix.lower() in VID_EXTS]
        images = [f for f in files if f.suffix.lower() in IMG_EXTS]
        if images:
            self._paths = [str(p) for p in images]
        elif video:
            import cv2
            cap = cv2.VideoCapture(str(video[0]))
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                self._frames.append(frame[:, :, ::-1].copy())  # BGR -> RGB
            cap.release()
        else:
            raise FileNotFoundError(
                f"no images or video in {self._data_dir}")

    def __str__(self) -> str:
        return self._data_dir.name

    def __len__(self) -> int:
        return len(self._paths) or len(self._frames)

    @property
    def no_gt(self) -> bool:
        return True

    def __getitem__(self, idx: int) -> dict:
        if self._paths:
            with Image.open(self._paths[idx]) as im:
                img_u8 = np.asarray(im.convert("RGB"))
            path = self._paths[idx]
        else:
            img_u8 = self._frames[idx]
            path = f"{self}_{idx:06d}.jpg"
        oh, ow = img_u8.shape[:2]
        from .mot17_sequence import preprocess_frame
        padded, (h, w) = preprocess_frame(img_u8, self._resize)
        bh, bw = padded.shape[:2]
        mask = (np.arange(bh)[:, None] >= h) | (np.arange(bw)[None, :] >= w)
        return {
            "batch": FrameBatch(images=padded[None], mask=mask[None]),
            "dets": np.zeros((0, 4), np.float32),
            "img_path": path,
            "gt": {},
            "vis": {},
            "orig_size": np.array([[oh, ow]], np.int32),
            "size": np.array([[h, w]], np.int32),
        }

    def write_results(self, results: dict, output_dir: str) -> None:
        os.makedirs(output_dir, exist_ok=True)
        with open(osp.join(output_dir, f"{self}.txt"), "w") as f:
            writer = csv.writer(f)
            for tid, track in results.items():
                for frame, data in track.items():
                    x1, y1, x2, y2 = data["bbox"][:4]
                    writer.writerow([frame + 1, tid + 1, x1 + 1, y1 + 1,
                                     x2 - x1 + 1, y2 - y1 + 1,
                                     -1, -1, -1, -1])

    def load_results(self, results_dir: Optional[str]) -> dict:
        return {}
