"""Image preprocessing: resize-keep-ratio, normalize, pad to static buckets.

Reference test pipeline (configs/psg/baseline_v4_ov.py:109-123, overridden
to (1333, 1333) by tools/infer.py:36-50): Resize keep_ratio to fit the
scale, Normalize(mean/std), Pad to ÷32.  The reference pads each image to
its own ÷32 size → dynamic shapes; on TPU that would recompile per image,
so we pad to a fixed *bucket* (default one bucket: the scale rounded up to
÷32) and carry the valid region (img_h, img_w) alongside (SURVEY.md §7.1
item 2).

Decode + resize run on host (cv2 — the only place pixels are dynamic);
normalization happens on device fused into the jitted forward
(openpsg_tpu.models.segmenter.openseed.normalize_image).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class Preprocessor:
    """Host-side: file/array → (padded uint8 RGB [H, W, 3], img_shape, scale)."""

    scale: Tuple[int, int] = (1333, 1333)   # (long, short) cap, keep ratio
    size_divisor: int = 32

    @property
    def bucket_hw(self) -> Tuple[int, int]:
        long_side = max(self.scale)
        return (_round_up(long_side, self.size_divisor),) * 2

    def rescale_size(self, h: int, w: int) -> Tuple[int, int]:
        """mmdet keep-ratio semantics: scale factor = min(long/max(h,w),
        short/min(h,w)); output rounded to int."""
        long_side, short_side = max(self.scale), min(self.scale)
        f = min(long_side / max(h, w), short_side / min(h, w))
        return int(h * f + 0.5), int(w * f + 0.5)

    def __call__(self, image_rgb: np.ndarray):
        """image_rgb: [h, w, 3] uint8 → dict(image [H, W, 3] uint8 padded,
        img_shape (h', w'), ori_shape (h, w), scale_factor)."""
        import cv2

        h, w = image_rgb.shape[:2]
        nh, nw = self.rescale_size(h, w)
        resized = cv2.resize(image_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        H, W = self.bucket_hw
        assert nh <= H and nw <= W, (nh, nw, H, W)
        out = np.zeros((H, W, 3), image_rgb.dtype)
        out[:nh, :nw] = resized
        return {
            "image": out,
            "img_shape": (nh, nw),
            "ori_shape": (h, w),
            "scale_factor": np.array([nw / w, nh / h, nw / w, nh / h], np.float32),
        }


def load_image_rgb(path: str) -> np.ndarray:
    import cv2

    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    return bgr[..., ::-1].copy()
