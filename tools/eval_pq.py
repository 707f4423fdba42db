#!/usr/bin/env python
"""Panoptic Quality evaluation over a prediction run.

The reference wires ``evaluation = dict(metric=['PQ'])`` into training
(configs/psg/baseline_v4_ov.py:172) but delegates to mmdet/panopticapi;
here PQ is first-class: score predicted panoptic maps (from tools/infer.py
submissions or tools/predict.py outputs) against GT panoptic PNGs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openpsg_tpu.data.vocab import INSTANCE_OFFSET
from openpsg_tpu.eval.pq import VOID, panoptic_quality
from openpsg_tpu import native


def gt_to_mmdet_scheme(gt_ids: np.ndarray, segments_info) -> np.ndarray:
    """GT panoptic (rgb ids + segments_info) → mmdet id scheme."""
    out = np.full(gt_ids.shape, VOID, np.int64)
    counters = {}
    for seg in segments_info:
        c = int(seg["category_id"] if "category_id" in seg else seg["category"])
        k = counters.get(c, 0)
        counters[c] = k + 1
        out[gt_ids == seg["id"]] = c + INSTANCE_OFFSET * k
    return out


def submission_to_mmdet_scheme(png_rgb: np.ndarray, segments_info) -> np.ndarray:
    """Submission PNG (random colors) + segments_info → mmdet scheme.
    category_id in submissions is 1-indexed (tools/infer.py parity)."""
    ids = native.rgb2id(png_rgb)
    out = np.full(ids.shape, VOID, np.int64)
    counters = {}
    for seg in segments_info:
        c = int(seg["category_id"]) - 1
        k = counters.get(c, 0)
        counters[c] = k + 1
        out[ids == seg["id"]] = c + INSTANCE_OFFSET * k
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--submission", required=True)
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--data-dir", required=True)
    args = ap.parse_args()

    import cv2

    sub_dir = os.path.join(args.submission, "submission")
    with open(os.path.join(sub_dir, "relation.json"), "r", encoding="utf-8") as f:
        submission = json.load(f)
    with open(args.gt_json, "r", encoding="utf-8") as f:
        gt = json.load(f)
    test_ids = set(gt.get("test_image_ids", []))
    gt_records = [
        d for d in gt["data"]
        if d["image_id"] in test_ids and len(d.get("relations", []))
    ]

    def pairs():
        for rec, gt_rec in zip(submission, gt_records):
            png = cv2.imread(os.path.join(sub_dir, "panseg", rec["pan_seg_file_name"]))
            pred = submission_to_mmdet_scheme(png[..., ::-1], rec["segments_info"])
            gt_png = cv2.imread(os.path.join(args.data_dir, gt_rec["pan_seg_file_name"]))
            gt_map = gt_to_mmdet_scheme(
                native.rgb2id(gt_png[..., ::-1]), gt_rec["segments_info"]
            )
            if pred.shape != gt_map.shape:
                pred = cv2.resize(
                    pred.astype(np.float64),
                    (gt_map.shape[1], gt_map.shape[0]),
                    interpolation=cv2.INTER_NEAREST,
                ).astype(np.int64)
            yield pred, gt_map

    res = panoptic_quality(pairs())
    print(json.dumps({k: round(float(v), 2) for k, v in res.items()
                      if not k.startswith("per_class")}))


if __name__ == "__main__":
    main()
