"""Image preprocessing: resize-keep-ratio, normalize, pad to static buckets.

Reference test pipeline (configs/psg/baseline_v4_ov.py:109-123, overridden
to (1333, 1333) by tools/infer.py:36-50): Resize keep_ratio to fit the
scale, Normalize(mean/std), Pad to ÷32.  The reference pads each image to
its own ÷32 size → dynamic shapes; on TPU that would recompile per image,
so we pad to a small set of fixed *buckets* and carry the valid region
(img_h, img_w) alongside (SURVEY.md §7.1 item 2).

With the default single bucket everything pads to the square cap.  With
``aspect_buckets()`` the dominant 4:3 / 3:4 COCO shapes land in
rectangular buckets (e.g. 1024×1344), cutting segmenter compute ~24% for
most of PSG val; each bucket is its own jitted program (XLA retraces per
static shape — 2-3 programs total, compiled once each).

Decode + resize run on host (cv2 — the only place pixels are dynamic);
normalization happens on device fused into the jitted forward
(openpsg_tpu.models.segmenter.openseed.normalize_image).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def aspect_buckets(
    scale: Tuple[int, int] = (1333, 1333), size_divisor: int = 32
) -> Tuple[Tuple[int, int], ...]:
    """Standard bucket set for a square test cap: square + landscape +
    portrait 4:3.  A keep-ratio resize of any 4:3 (or wider) image into the
    (1333, 1333) cap fits 1000×1333 → the 1024×1344 bucket; squarer images
    fall through to the full square bucket."""
    long_side = _round_up(max(scale), size_divisor)               # 1344
    short_side = _round_up(int(max(scale) * 3 / 4 + 0.5), size_divisor)  # 1024
    if short_side >= long_side:
        return ((long_side, long_side),)
    return (
        (short_side, long_side),   # landscape (h, w)
        (long_side, short_side),   # portrait
        (long_side, long_side),    # square fallback
    )


@dataclasses.dataclass(frozen=True)
class Preprocessor:
    """Host-side: file/array → (padded uint8 RGB [H, W, 3], img_shape, scale).

    ``buckets``: optional static pad targets (h, w).  None → one square
    bucket at the scale rounded up to ÷size_divisor (reference-shaped
    worst case).  Each image picks the smallest-area bucket that fits its
    keep-ratio resized size."""

    scale: Tuple[int, int] = (1333, 1333)   # (long, short) cap, keep ratio
    size_divisor: int = 32
    buckets: Optional[Tuple[Tuple[int, int], ...]] = None

    @property
    def bucket_hw(self) -> Tuple[int, int]:
        """The largest (fallback) bucket."""
        if self.buckets:
            return max(self.buckets, key=lambda b: b[0] * b[1])
        long_side = max(self.scale)
        return (_round_up(long_side, self.size_divisor),) * 2

    def rescale_size(self, h: int, w: int) -> Tuple[int, int]:
        """mmdet keep-ratio semantics: scale factor = min(long/max(h,w),
        short/min(h,w)); output rounded to int."""
        long_side, short_side = max(self.scale), min(self.scale)
        f = min(long_side / max(h, w), short_side / min(h, w))
        return int(h * f + 0.5), int(w * f + 0.5)

    def bucket_for(self, h: int, w: int) -> Tuple[int, int]:
        """Smallest-area bucket fitting the keep-ratio resize of (h, w)."""
        nh, nw = self.rescale_size(h, w)
        cands = list(self.buckets) if self.buckets else [self.bucket_hw]
        fits = [b for b in cands if nh <= b[0] and nw <= b[1]]
        assert fits, (nh, nw, cands)
        return min(fits, key=lambda b: b[0] * b[1])

    def __call__(self, image_rgb: np.ndarray, bucket: Optional[Tuple[int, int]] = None):
        """image_rgb: [h, w, 3] uint8 → dict(image [H, W, 3] uint8 padded,
        img_shape (h', w'), ori_shape (h, w), scale_factor).

        ``bucket`` pins the pad target (batched callers group images by
        bucket up front and need consistent stack shapes even if an
        annotation's height/width disagrees with the decoded file)."""
        import cv2

        h, w = image_rgb.shape[:2]
        nh, nw = self.rescale_size(h, w)
        resized = cv2.resize(image_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        H, W = bucket if bucket is not None else self.bucket_for(h, w)
        if nh > H or nw > W:  # annotation lied about aspect: shrink to fit
            f = min(H / nh, W / nw)
            nh, nw = min(int(nh * f), H), min(int(nw * f), W)
            resized = cv2.resize(
                image_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR
            )
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
