"""Synthetic mini PSG dataset for tests and tool drives.

Generates images + panoptic PNGs + a flat-style PSG json (the fake-backend
idea from SURVEY.md §4: known GT isolates pipeline stages from model
quality)."""

from __future__ import annotations

import json
import os

import numpy as np

from openpsg_tpu.utils.panoptic import id2rgb


def make_fixture(
    root: str,
    n_images: int = 4,
    hw=(96, 64),
    seed: int = 0,
    relations=None,
):
    """``hw``: one (H, W) for all images, or a list cycled per image
    (mixed aspects exercise the multi-bucket inference path).

    ``relations``: per-image GT triplet lists — ``None`` keeps the default
    ``[[0, 2, 4], [1, 0, 23]]``, or pass a callable ``f(i) -> [[s,o,r],…]``
    (lets the open-set selfcheck give train and held-out images different
    predicate vocabularies)."""
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    pan_dir = os.path.join(root, "panoptic")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pan_dir, exist_ok=True)

    hws = list(hw) if isinstance(hw, (list,)) else [tuple(hw)]
    data = []
    # color-coded regions (+noise) so a from-scratch segmenter can learn
    # appearance → class and GENERALIZE to held-out images (pure-noise
    # images are memorizable but not learnable)
    region_colors = np.asarray(
        [[200, 60, 60], [60, 200, 60], [60, 60, 200]], np.int64
    )
    for i in range(n_images):
        H, W = hws[i % len(hws)]
        img = np.zeros((H, W, 3), np.int64)
        img[: H // 2, : W // 2] = region_colors[0]
        img[: H // 2, W // 2:] = region_colors[1]
        img[H // 2:, :] = region_colors[2]
        img = np.clip(
            img + rng.integers(-30, 30, (H, W, 3)), 0, 255
        ).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"), img[..., ::-1])

        # three segments: person (thing 0), dog (thing 16), sky (stuff)
        pan = np.zeros((H, W), np.int64)
        pan[: H // 2, : W // 2] = 7001
        pan[: H // 2, W // 2:] = 7002
        pan[H // 2:, :] = 7003
        cv2.imwrite(
            os.path.join(pan_dir, f"{i}.png"), id2rgb(pan)[..., ::-1]
        )
        segments_info = [
            {"id": 7001, "category_id": 0, "isthing": 1},
            {"id": 7002, "category_id": 16, "isthing": 1},
            {"id": 7003, "category_id": 119, "isthing": 0},  # sky
        ]
        data.append(
            {
                "image_id": str(i),
                "file_name": f"images/{i}.jpg",
                "pan_seg_file_name": f"panoptic/{i}.png",
                "height": H,
                "width": W,
                "segments_info": segments_info,
                "relations": (
                    [[0, 2, 4], [1, 0, 23]]  # in(4), looking-at(23)
                    if relations is None else [list(t) for t in relations(i)]
                ),
            }
        )
    payload = {
        "data": data,
        "test_image_ids": [str(i) for i in range(n_images // 2, n_images)],
    }
    path = os.path.join(root, "psg.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f)
    return path
