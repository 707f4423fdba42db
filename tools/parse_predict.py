#!/usr/bin/env python
"""Parse predict.py output back into named triplets
(reference tools/parse_predict.py parity :16-74: reads panseg PNGs with
rgb2id, maps segments + 1-indexed relations to
(subject_name, relation_name, object_name, sub_mask, obj_mask, score)).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openpsg_tpu.data.vocab import OBJECT_CLASSES, RELATION_CLASSES
from openpsg_tpu.utils.panoptic import rgb2id


def parse_record(record, panseg_dir):
    """One prediction record → list of named triplet dicts."""
    import cv2

    png = cv2.imread(os.path.join(panseg_dir, record["pan_seg_file_name"]))
    if png is None:
        raise FileNotFoundError(record["pan_seg_file_name"])
    seg_id_map = rgb2id(png[..., ::-1])  # BGR → RGB → ids

    seg_masks = []
    seg_names = []
    for seg in record["segments_info"]:
        seg_masks.append(seg_id_map == seg["id"])
        seg_names.append(OBJECT_CLASSES[int(seg["category_id"]) - 1])

    out = []
    scores = record.get("relation_scores", [1.0] * len(record["relations"]))
    for (s, o, r), score in zip(record["relations"], scores):
        if s >= len(seg_names) or o >= len(seg_names):
            continue
        out.append(
            dict(
                subject=seg_names[s],
                relation=RELATION_CLASSES[int(r) - 1],
                object=seg_names[o],
                sub_mask=seg_masks[s],
                obj_mask=seg_masks[o],
                score=float(score),
            )
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--panseg-dir", required=True)
    ap.add_argument("--interactive", action="store_true")
    args = ap.parse_args()

    with open(args.predictions, "r", encoding="utf-8") as f:
        records = json.load(f)
    for rec in records:
        triplets = parse_record(rec, args.panseg_dir)
        print(f"== {rec.get('file_name', rec['pan_seg_file_name'])}: "
              f"{len(triplets)} triplets")
        for t in triplets:
            print(f"  {t['subject']} --{t['relation']}--> {t['object']} "
                  f"({t['score']:.3f})")
            if args.interactive:
                input()


if __name__ == "__main__":
    main()
