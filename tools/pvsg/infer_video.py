#!/usr/bin/env python
"""PVSG video scene graphs: per-frame PSG inference at batch > 1.

The reference's entire video support is frame extraction
(tools/pvsg/extractor.py) + pushing frames through the image pipeline one
at a time.  Here frames run through the dp-sharded batched inference path
(PSGv4.infer_batch), emitting one scene-graph record per frame — the
BASELINE 'PVSG video scene graph, per-frame pipeline at batch>1' workload.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--frames-dir", required=True,
                    help="dir of per-video frame dirs (extractor.py output)")
    ap.add_argument("--output", default="./pvsg_scene_graphs.json")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--limit-frames", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from openpsg_tpu.utils.logging import honor_platform_env
    honor_platform_env()

    from openpsg_tpu.core.builder import build_detector_from_config
    from openpsg_tpu.core.config import Config
    from openpsg_tpu.data.preprocess import Preprocessor, load_image_rgb
    from openpsg_tpu.train.checkpoint import PartCheckpointer

    cfg = Config.fromfile(args.config)
    model = build_detector_from_config(cfg, jax.random.PRNGKey(args.seed))
    if args.checkpoint and os.path.isdir(args.checkpoint):
        ckpt = PartCheckpointer(args.checkpoint)
        params, _, _, _ = ckpt.restore(like_params={"head": model.params["head"]})
        model.params.update(params)

    H, _ = model._model_hw()
    preproc = Preprocessor(scale=(H, H))
    B = args.batch_size

    videos = {}
    for vdir in sorted(glob.glob(os.path.join(args.frames_dir, "*"))):
        if not os.path.isdir(vdir):
            continue
        frames = sorted(glob.glob(os.path.join(vdir, "*.png")))
        if args.limit_frames:
            frames = frames[: args.limit_frames]
        records = []
        for start in range(0, len(frames), B):
            chunk = frames[start : start + B]
            exs = [preproc(load_image_rgb(f)) for f in chunk]
            pads = B - len(exs)
            imgs = np.stack(
                [e["image"].astype(np.float32) for e in exs]
                + [exs[-1]["image"].astype(np.float32)] * pads
            )
            hws = np.stack(
                [np.asarray(e["img_shape"], np.int32) for e in exs]
                + [np.asarray(exs[-1]["img_shape"], np.int32)] * pads
            )
            if hasattr(model, "infer_batch") and B > 1:
                results = model.infer_batch(imgs, hws)[: len(exs)]
            else:
                results = [
                    model.infer(imgs[i], tuple(hws[i])) for i in range(len(exs))
                ]
            for f, res in zip(chunk, results):
                records.append(
                    dict(
                        frame=os.path.basename(f),
                        object_id_list=res["rel_results"]["object_id_list"],
                        relations=res["rel_results"]["relation"],
                        relation_scores=[float(s) for s in res["rel_scores"]],
                    )
                )
        videos[os.path.basename(vdir)] = records
        print(f"{os.path.basename(vdir)}: {len(records)} frames")

    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(videos, f)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
