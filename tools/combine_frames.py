"""Stitch two rendered frame directories side by side
(parity: /root/reference/src/combine_frames.py:1-43).

Usage: python tools/combine_frames.py dir_a dir_b out_dir
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("out_dir")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    names = sorted(set(os.listdir(args.dir_a)) & set(os.listdir(args.dir_b)))
    for name in names:
        with Image.open(osp.join(args.dir_a, name)) as a, \
                Image.open(osp.join(args.dir_b, name)) as b:
            ia, ib = np.asarray(a.convert("RGB")), np.asarray(b.convert("RGB"))
        h = min(ia.shape[0], ib.shape[0])
        combined = np.concatenate([ia[:h], ib[:h]], axis=1)
        Image.fromarray(combined).save(osp.join(args.out_dir, name))
    print(f"wrote {len(names)} combined frames to {args.out_dir}")


if __name__ == "__main__":
    main()
