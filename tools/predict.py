#!/usr/bin/env python
"""Generic batch prediction over an arbitrary PSG-style json
(reference tools/predict.py parity: same PNG+json emission but keeps
original metadata per record, panseg named by source file stem, includes
relation_scores, skips background object_id 133 — reference :34-102).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--input-json", required=True)
    ap.add_argument("--data-dir", default="")
    ap.add_argument("--output-dir", default="./predict_out")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    return ap.parse_args()


def main():
    args = parse_args()
    import cv2
    import jax

    from openpsg_tpu.utils.logging import honor_platform_env
    honor_platform_env()

    from openpsg_tpu.core.builder import build_detector_from_config
    from openpsg_tpu.core.config import Config
    from openpsg_tpu.data.preprocess import Preprocessor, load_image_rgb
    from openpsg_tpu.train.checkpoint import PartCheckpointer
    from openpsg_tpu.utils.submission import paint_panoptic, relations_1indexed

    cfg = Config.fromfile(args.config)
    model = build_detector_from_config(cfg, jax.random.PRNGKey(args.seed))
    if args.checkpoint and os.path.isdir(args.checkpoint):
        ckpt = PartCheckpointer(args.checkpoint)
        params, _, _, _ = ckpt.restore(like_params={"head": model.params["head"]})
        model.params.update(params)

    with open(args.input_json, "r", encoding="utf-8") as f:
        raw = json.load(f)
    records = raw["data"] if isinstance(raw, dict) and "data" in raw else raw
    if args.limit:
        records = records[: args.limit]

    panseg_dir = os.path.join(args.output_dir, "panseg")
    os.makedirs(panseg_dir, exist_ok=True)

    H, _ = model._model_hw()
    preproc = Preprocessor(scale=(H, H))
    out_records = []
    for i, d in enumerate(records):
        img = load_image_rgb(os.path.join(args.data_dir, d["file_name"]))
        ex = preproc(img)
        res = model.infer(ex["image"].astype(np.float32), ex["img_shape"])
        # crop the padding off before rescaling (see tools/infer.py)
        nh, nw = ex["img_shape"]
        pan_ori = cv2.resize(
            res["pan_results"][:nh, :nw].astype(np.float64),
            (img.shape[1], img.shape[0]),
            interpolation=cv2.INTER_NEAREST,
        ).astype(np.int64)

        stem = os.path.splitext(os.path.basename(d["file_name"]))[0]
        out_bgr, segments_info, _, _ = paint_panoptic(
            pan_ori, res["rel_results"]["object_id_list"], seed=args.seed + i
        )
        cv2.imwrite(os.path.join(panseg_dir, f"{stem}.png"), out_bgr)

        rec = dict(d)
        rec.update(
            relations=relations_1indexed(res["rel_results"]["relation"]),
            relation_scores=[float(s) for s in res["rel_scores"]],
            segments_info=segments_info,
            pan_seg_file_name=f"{stem}.png",
        )
        out_records.append(rec)

    out_path = os.path.join(args.output_dir, "predictions.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(out_records, f, default=str)
    print(f"wrote {len(out_records)} predictions to {out_path}")


if __name__ == "__main__":
    main()
