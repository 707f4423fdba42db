#!/usr/bin/env python
"""Grade a submission directory against PSG ground truth (R@K / mR@K + PQ).

Self-contained equivalent of the external HiLo ``tools/grade.py`` the
reference README points at (README.md:34-40): reads
``submission/panseg/*.png`` + ``submission/relation.json`` produced by
tools/infer.py, reconstructs per-image predicted masks/triplets, and
scores them against the GT panoptic PNGs + relations with the standard
PSG protocol (mask IoU > 0.5, subject/object category match, predicate
exact match).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openpsg_tpu.eval.pq import panoptic_quality
from openpsg_tpu.eval.sgg_metrics import sgg_recall
from openpsg_tpu.utils.panoptic import rgb2id

# last graded per-image dicts (incl. pred/gt labels) — lets callers such
# as tools/selfcheck_e2e.py assert the strict protocol actually received
# class labels
LAST_IMAGES = []


def load_submission_image(sub_dir, rec):
    import cv2

    png = cv2.imread(os.path.join(sub_dir, "panseg", rec["pan_seg_file_name"]))
    ids = rgb2id(png[..., ::-1])
    masks = [ids == seg["id"] for seg in rec["segments_info"]]
    # submission category_id is 1-indexed (SubmissionWriter) → back to 0-idx
    labels = [seg["category_id"] - 1 for seg in rec["segments_info"]]
    triplets = [[s, o, r - 1] for s, o, r in rec["relations"]]  # back to 0-idx
    return masks, labels, triplets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--submission", required=True, help="dir containing submission/")
    ap.add_argument("--gt-json", required=True)
    ap.add_argument("--data-dir", required=True, help="root for GT panoptic PNGs")
    ap.add_argument("--ks", type=int, nargs="+", default=[20, 50, 100])
    ap.add_argument("--per-predicate", action="store_true",
                    help="also report recall per predicate id (the mR@K "
                         "components) — e.g. to read a held-out predicate's "
                         "zero-shot recall in the open-set journey")
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
    assert len(submission) == len(gt_records), (
        f"submission has {len(submission)} records, GT {len(gt_records)}"
    )

    images = []
    for rec, gt_rec in zip(submission, gt_records):
        pred_masks, pred_labels, pred_triplets = load_submission_image(sub_dir, rec)
        gt_png = cv2.imread(os.path.join(args.data_dir, gt_rec["pan_seg_file_name"]))
        gt_ids = rgb2id(gt_png[..., ::-1])
        gt_masks = [gt_ids == seg["id"] for seg in gt_rec["segments_info"]]
        gt_labels = [seg["category_id"] for seg in gt_rec["segments_info"]]
        # resize pred masks to GT resolution if they differ
        if pred_masks and pred_masks[0].shape != gt_ids.shape:
            pred_masks = [
                cv2.resize(
                    m.astype(np.uint8), (gt_ids.shape[1], gt_ids.shape[0]),
                    interpolation=cv2.INTER_NEAREST,
                ).astype(bool)
                for m in pred_masks
            ]
        images.append({
            "pred_masks": pred_masks,
            "pred_labels": pred_labels,
            "pred_triplets": pred_triplets,
            "gt_masks": gt_masks,
            "gt_labels": gt_labels,
            "gt_triplets": [list(t) for t in gt_rec["relations"]],
        })

    global LAST_IMAGES
    LAST_IMAGES = images
    res = sgg_recall(images, ks=tuple(args.ks), per_predicate=args.per_predicate)
    print(json.dumps({
        k: (v if isinstance(v, dict) else round(v, 2)) for k, v in res.items()
    }))
    return res


if __name__ == "__main__":
    main()
