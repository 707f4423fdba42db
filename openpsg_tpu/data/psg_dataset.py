"""PSG dataset: COCO-panoptic JSON + per-image relation triplets.

Reference: kings_sgg/datasets/coco_panoptic_relation.py —
``COCOPanopticRelation.createIndex`` keeps a per-image ``relations`` list
``[sub_idx, obj_idx, rel_cls]`` whose subject/object indices point into
the image's ``segments_info`` order (:118-164); the pipeline op
``LoadPanopticRelationAnnotations`` surfaces ``gt_rels`` + ``masks_info``
({id, category, is_thing} per segment, pipelines/loading.py:6-36).

Two JSON layouts are accepted:
  * COCO-panoptic style: {images, annotations:[{image_id, file_name,
    segments_info, relations?}], categories} with relations either on the
    annotation or in a top-level map;
  * flat PSG style: {data:[{image_id, file_name, pan_seg_file_name,
    segments_info, relations}], test_image_ids, thing_classes, ...}.

Output per example is the static-shape tensor set TrainBatch consumes
(openpsg_tpu/train/trainer.py): padded image bucket, per-object masks on
the stride-4 grid, labels/validity, dense [M, M, R] relation target.
All pixel work is host-side numpy/cv2 (the only dynamic-shape stage).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from openpsg_tpu.core.registry import DATASETS
from openpsg_tpu.data.preprocess import Preprocessor, load_image_rgb
from openpsg_tpu.data.vocab import NUM_OBJECT_CLASSES, NUM_RELATION_CLASSES
from openpsg_tpu.utils.panoptic import rgb2id


@dataclasses.dataclass
class PSGRecord:
    image_id: Any
    file_name: str
    pan_seg_file_name: Optional[str]
    segments_info: List[Dict[str, Any]]   # [{id, category, is_thing}]
    relations: List[List[int]]            # [[sub, obj, rel]]
    height: int = 0
    width: int = 0


@DATASETS.register_module(name="CocoPanopticRelationDataset")
class PSGDataset:
    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        seg_prefix: str = "",
        split: str = "train",
        filter_no_relation: bool = False,
        pipeline=None,  # accepted for reference-config compatibility
    ):
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix
        with open(ann_file, "r", encoding="utf-8") as f:
            raw = json.load(f)
        self.records = self._parse(raw, split)
        if filter_no_relation:
            # tools/infer.py:53-62 keeps only test images with ≥1 relation
            self.records = [r for r in self.records if len(r.relations) > 0]

    # ------------------------------------------------------------- parsing
    def _parse(self, raw: Dict[str, Any], split: str) -> List[PSGRecord]:
        records: List[PSGRecord] = []
        if "data" in raw:  # flat PSG style
            test_ids = set(raw.get("test_image_ids", []))
            for item in raw["data"]:
                in_test = item.get("image_id") in test_ids
                if split == "train" and in_test:
                    continue
                if split in ("val", "test") and not in_test:
                    continue
                segs = [
                    {
                        "id": s["id"],
                        "category": s["category_id"],
                        "is_thing": bool(s.get("isthing", 1)),
                    }
                    for s in item.get("segments_info", [])
                ]
                records.append(
                    PSGRecord(
                        image_id=item.get("image_id"),
                        file_name=item["file_name"],
                        pan_seg_file_name=item.get("pan_seg_file_name"),
                        segments_info=segs,
                        relations=[list(r) for r in item.get("relations", [])],
                        height=item.get("height", 0),
                        width=item.get("width", 0),
                    )
                )
        elif "annotations" in raw:  # COCO-panoptic style
            cats = sorted(raw.get("categories", []), key=lambda c: c["id"])
            cat2contig = {c["id"]: i for i, c in enumerate(cats)}
            isthing = {c["id"]: bool(c.get("isthing", 1)) for c in cats}
            img_by_id = {im["id"]: im for im in raw.get("images", [])}
            rel_map = raw.get("relations", {})
            for ann in raw["annotations"]:
                im = img_by_id.get(ann["image_id"], {})
                segs = [
                    {
                        "id": s["id"],
                        "category": cat2contig.get(s["category_id"], s["category_id"]),
                        "is_thing": isthing.get(s["category_id"], True),
                    }
                    for s in ann.get("segments_info", [])
                ]
                rels = ann.get(
                    "relations", rel_map.get(str(ann["image_id"]), [])
                )
                records.append(
                    PSGRecord(
                        image_id=ann["image_id"],
                        file_name=im.get("file_name", ann.get("file_name", "")),
                        pan_seg_file_name=ann.get("file_name"),
                        segments_info=segs,
                        relations=[list(r) for r in rels],
                        height=im.get("height", 0),
                        width=im.get("width", 0),
                    )
                )
        else:
            raise ValueError("unrecognized PSG annotation format")
        return records

    def __len__(self) -> int:
        return len(self.records)

    # ------------------------------------------------------------- loading
    def load_example(
        self,
        idx: int,
        preproc: Preprocessor,
        max_objects: int,
        flip_prob: float = 0.0,
        scale_jitter: Optional[tuple] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> Dict[str, np.ndarray]:
        """Full host pipeline for one example → static-shape arrays."""
        rec = self.records[idx]
        rng = rng or np.random.default_rng()
        image = load_image_rgb(os.path.join(self.img_prefix, rec.file_name))

        pan_id = None
        if rec.pan_seg_file_name:
            from openpsg_tpu import native

            pan_rgb = load_image_rgb(
                os.path.join(self.seg_prefix, rec.pan_seg_file_name)
            )
            pan_id = native.rgb2id(pan_rgb)

        # train-time flip (configs/psg/baseline_v4_ov.py:85)
        if flip_prob > 0 and rng.uniform() < flip_prob:
            image = image[:, ::-1].copy()
            if pan_id is not None:
                pan_id = pan_id[:, ::-1].copy()

        # large-scale jitter: sample a target scale in the configured range
        # (baseline_v4_ov.py:86-91) but clamp to the static bucket
        if scale_jitter is not None:
            lo, hi = scale_jitter
            short = int(rng.integers(lo, hi + 1))
            preproc = Preprocessor(
                scale=(preproc.scale[0], min(short, preproc.scale[1])),
                size_divisor=preproc.size_divisor,
            )

        out = preproc(image)
        H, W = preproc.bucket_hw
        nh, nw = out["img_shape"]

        M = max_objects
        H4, W4 = H // 4, W // 4
        masks = np.zeros((M, H4, W4), bool)
        labels = np.zeros((M,), np.int32)
        valid = np.zeros((M,), bool)
        if pan_id is not None:
            from openpsg_tpu import native

            # fused native pass: per-segment masks directly on the stride-4
            # grid of the *valid* region, placed into the padded bucket
            segs = rec.segments_info[:M]
            oh, ow = max(nh // 4, 1), max(nw // 4, 1)
            small = native.extract_masks_downsampled(
                pan_id, [s["id"] for s in segs], (oh, ow)
            )
            for i, seg in enumerate(segs):
                masks[i, :oh, :ow] = small[i].astype(bool)
                labels[i] = seg["category"]
                valid[i] = True

        R = NUM_RELATION_CLASSES
        target = np.zeros((M, M, R), np.float32)
        for s, o, r in rec.relations:
            if s < M and o < M and r < R:
                target[s, o, r] = 1.0

        return {
            "image": out["image"].astype(np.float32),
            "img_shape": np.asarray(out["img_shape"], np.int32),
            "ori_shape": np.asarray(out["ori_shape"], np.int32),
            "object_masks": masks,
            "object_labels": labels,
            "object_valid": valid,
            "relation_target": target,
            "image_id": rec.image_id,
        }

    def iter_train(
        self,
        preproc: Preprocessor,
        max_objects: int,
        batch_size: int,
        seed: int = 0,
        flip_prob: float = 0.5,
        scale_jitter: Optional[tuple] = None,
        epochs: int = 1,
    ) -> Iterator[List[Dict[str, np.ndarray]]]:
        """``scale_jitter=(lo, hi)``: large-scale jitter — each example's
        short side is resampled in [lo, hi] (reference trains with Resize
        range (1500,400)-(1500,1400), configs/psg/baseline_v4_ov.py:86-91;
        the image lands in the same static bucket, content rescaled)."""
        rng = np.random.default_rng(seed)
        for _ in range(epochs):
            order = rng.permutation(len(self.records))
            if len(order) < batch_size:
                # tiny datasets (smoke runs) still yield one full batch
                # instead of silently training zero steps
                order = np.tile(order, -(-batch_size // len(order)))[:batch_size]
            for i in range(0, len(order) - batch_size + 1, batch_size):
                yield [
                    self.load_example(
                        int(j), preproc, max_objects, flip_prob=flip_prob,
                        scale_jitter=scale_jitter, rng=rng,
                    )
                    for j in order[i : i + batch_size]
                ]
