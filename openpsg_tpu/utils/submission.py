"""HiLo-compatible submission writer.

Reference emission rules (tools/infer.py:149-188):
  * one PNG per test image named ``{test_idx}.png`` under
    ``submission/panseg/``, each object colored with a random distinct RGB,
    segment id = rgb2id(color);
  * ``segments_info`` in object_id_list order with 1-indexed
    ``category_id = object_id % INSTANCE_OFFSET + 1``;
  * object_id 133 (background sentinel) skipped;
  * ``relations = [[sub, obj, rel+1], ...]`` (1-indexed predicates);
  * empty outputs dummy-filled: relation ``[[0,0,0]]``, one random segment;
  * final ``submission/relation.json`` is the list over images.

Colors are drawn from a seedable RNG (reproducible, unlike the reference)
and guaranteed distinct within an image.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from openpsg_tpu.data.vocab import INSTANCE_OFFSET
from openpsg_tpu.utils.panoptic import random_colors, rgb2id


def paint_panoptic_indexed(
    pan_results: np.ndarray,
    object_id_list: List[int],
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, List[Dict[str, Any]], List[int], np.ndarray]:
    """Index-map painting core: one pass over the id map (native
    ``paint_index`` or a searchsorted fallback — NOT one ``pan == oid``
    image scan per segment, which caps a pod host at ~3 img/s,
    tools/bench_host.py) plus a ≤256-entry RGB palette.

    Returns ``(idx, palette_rgb, segments_info, kept_oids, colors)``:
    ``idx`` is [H, W] uint8 (0 = background → palette black),
    ``palette_rgb`` is [K+1, 3]; ``palette_rgb[idx]`` reproduces the RGB
    image exactly.
    """
    from openpsg_tpu import native

    kept = [int(oid) for oid in object_id_list if oid != 133]
    colors = random_colors(max(len(kept), 1), seed=seed)
    idx = native.paint_index(pan_results, kept)
    palette = np.zeros((len(kept) + 1, 3), np.uint8)
    palette[1:] = colors[: len(kept)]
    segments_info: List[Dict[str, Any]] = []
    for i, oid in enumerate(kept):
        r, g, b = (int(x) for x in colors[i])
        segments_info.append(
            dict(
                category_id=int(oid % INSTANCE_OFFSET) + 1,
                id=int(rgb2id(np.asarray([r, g, b], np.uint8))),
            )
        )
    return idx, palette, segments_info, kept, colors


def paint_panoptic(
    pan_results: np.ndarray,
    object_id_list: List[int],
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, List[Dict[str, Any]], List[int], np.ndarray]:
    """Shared record-painting core for every output surface
    (``SubmissionWriter.add``, tools/predict.py, tools/serve.py): color
    each non-background object (id != 133) a distinct random RGB and build
    the matching ``segments_info`` (1-indexed ``category_id =
    oid % INSTANCE_OFFSET + 1``, ``id = rgb2id(color)`` — reference
    tools/infer.py:160-176).

    Returns ``(out_bgr, segments_info, kept_oids, colors)``; ``out_bgr``
    is BGR for cv2 writers, and ``colors`` always has >= 1 entry (the
    empty-image dummy-fill path needs one).
    """
    idx, palette, segments_info, kept, colors = paint_panoptic_indexed(
        pan_results, object_id_list, seed=seed
    )
    out_bgr = palette[..., ::-1][idx]        # LUT expand, BGR for cv2
    return out_bgr, segments_info, kept, colors


def relations_1indexed(relation) -> List[List[int]]:
    """``[[sub, obj, rel+1], ...]`` — submission predicates are 1-indexed."""
    return [[int(s), int(o), int(r) + 1] for s, o, r in relation]


class SubmissionWriter:
    def __init__(self, output_dir: str, seed: Optional[int] = None):
        self.panseg_dir = os.path.join(output_dir, "submission", "panseg")
        self.json_dir = os.path.join(output_dir, "submission")
        os.makedirs(self.panseg_dir, exist_ok=True)
        # (test_idx, record) pairs; finalize() sorts by test_idx so
        # out-of-order add() calls (batched/prefetched inference) still
        # write the grader's expected order
        self.results: List[Tuple[int, Dict[str, Any]]] = []
        self.seed = seed
        self._counter = 0

    def add(
        self,
        pan_results: np.ndarray,          # [H, W] mmdet-scheme ids (ori size)
        object_id_list: List[int],
        relation: List[List[int]],
        test_idx: Optional[int] = None,
    ) -> None:
        test_idx = self._counter if test_idx is None else test_idx
        self._counter += 1

        idx, palette, segments_info, _, colors = paint_panoptic_indexed(
            pan_results, object_id_list,
            seed=None if self.seed is None else self.seed + test_idx,
        )

        from openpsg_tpu import native

        path = os.path.join(self.panseg_dir, f"{test_idx}.png")
        png = native.encode_palette_png(idx, palette)
        if png is not None:                        # native fast path
            with open(path, "wb") as f:
                f.write(png)
        else:                                      # no toolchain: cv2
            import cv2

            cv2.imwrite(path, palette[..., ::-1][idx])

        if len(relation) == 0:
            relation = [[0, 0, 0]]
        if len(segments_info) == 0:
            r, g, b = (int(x) for x in colors[0])
            segments_info = [
                dict(category_id=1, id=int(rgb2id(np.asarray([r, g, b], np.uint8))))
            ]
        self.results.append(
            (
                test_idx,
                dict(
                    relations=relations_1indexed(relation),
                    segments_info=segments_info,
                    pan_seg_file_name=f"{test_idx}.png",
                ),
            )
        )

    def finalize(self) -> str:
        # images may be processed out of dataset order (tools/infer.py groups
        # them by resolution bucket); the submission list is positional, so
        # restore test_idx order here
        path = os.path.join(self.json_dir, "relation.json")
        ordered = [r for _, r in sorted(self.results, key=lambda t: t[0])]
        with open(path, "w", encoding="utf-8") as f:
            json.dump(ordered, f, default=str)
        return path
