"""Stitch plot_sequence frames into a video (reference README's ffmpeg
workflow: `ffmpeg -i %06d.jpg output.mp4`).

Usage: python tools/make_video.py FRAME_DIR OUT.mp4 [--fps 25]
"""
import argparse
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("frame_dir")
    ap.add_argument("out")
    ap.add_argument("--fps", type=float, default=25.0)
    args = ap.parse_args()
    from trackformer_tpu.utils.track_utils import write_video
    written = write_video(args.frame_dir, args.out, args.fps)
    print(f"wrote {written}")


if __name__ == "__main__":
    main()
