#!/usr/bin/env python
"""Convert a published mmdet Mask2Former checkpoint for the TPU segmenter.

The reference's v1/v2/v3 generations start from mmdet's COCO-panoptic
checkpoints via ``load_from`` (configs/psg/baseline_r50.py:3 R50,
baseline_swin_b.py Swin-B-384).  This converts one offline:

    python tools/convert_mask2former.py \
        mask2former_r50_lsj_8x2_50e_coco-panoptic_*.pth \
        --out data/m2f_r50_tpu [--backbone r50|swin_b]

emits ``out/segmenter.msgpack`` — flax params for ``Mask2FormerSegmenter``,
loadable by ``PSGMask2FormerRelation.load_segmenter_weights`` (or point
``model.segmenter_pretrained_path`` at it in a config).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="mmdet .pth checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--backbone", default=None,
                    help="r50 | swin_b (default: sniff from the keys)")
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--num-classes", type=int, default=133)
    args = ap.parse_args()

    import torch
    from flax import serialization

    from openpsg_tpu.models.segmenter.mask2former import Mask2FormerConfig
    from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former

    state = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}

    backbone = args.backbone or (
        "r50" if "backbone.conv1.weight" in state else "swin_b"
    )
    cfg = Mask2FormerConfig(
        backbone=backbone, num_queries=args.queries,
        num_classes=args.num_classes, enc_ffn_hidden=1024,
    )
    params = convert_mask2former(state, cfg)

    # per-component sanity: wrong layout assumptions show up as outlier
    # norms here, before anything runs
    for part, tree in params.items():
        import jax

        leaves = jax.tree_util.tree_leaves(tree)
        n = sum(int(np.asarray(l).size) for l in leaves)
        rms = float(np.sqrt(np.mean([float((np.asarray(l) ** 2).mean())
                                     for l in leaves])))
        print(f"{part:>16}: {len(leaves):4d} tensors, {n / 1e6:7.2f} M params, "
              f"rms {rms:.4f}")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "segmenter.msgpack"), "wb") as f:
        f.write(serialization.to_bytes({"params": params}))
    print(f"converted ({backbone}) → {args.out}/segmenter.msgpack")


if __name__ == "__main__":
    main()
