#!/usr/bin/env python
"""PVSG video preparation: dump every frame of each video to PNG
(reference tools/pvsg/extractor.py parity :12-30 — this is the entirety of
the reference's video scene-graph support; frames then flow through the
image pipeline, optionally batched).
"""

from __future__ import annotations

import argparse
import glob
import os


def extract(video_dir: str, image_dir: str, ext: str = "mp4") -> int:
    import cv2

    count = 0
    for video_path in sorted(glob.glob(os.path.join(video_dir, f"*.{ext}"))):
        name = os.path.splitext(os.path.basename(video_path))[0]
        out_dir = os.path.join(image_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        cap = cv2.VideoCapture(video_path)
        idx = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            cv2.imwrite(os.path.join(out_dir, f"{idx:04d}.png"), frame)
            idx += 1
        cap.release()
        print(f"{name}: {idx} frames")
        count += idx
    return count


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-dir", default="./data/pvsg/vidor/videos")
    ap.add_argument("--image-dir", default="./data/pvsg/vidor/images")
    ap.add_argument("--ext", default="mp4")
    args = ap.parse_args()
    extract(args.video_dir, args.image_dir, args.ext)
