"""Native host-runtime kernels (C++ via ctypes) with numpy fallbacks.

Builds ``libpancodec.so`` on first use (g++, see pan_codec.cpp for the
role).  Every entry point has a numpy fallback so the framework runs
without a toolchain; ``is_native()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libpancodec.so")
_SRC = os.path.join(_HERE, "pan_codec.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            for cc in ("g++", "c++", "clang++"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", _SRC, "-lz",
                         "-o", _SO],
                        check=True, capture_output=True, timeout=120,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
        lib = ctypes.CDLL(_SO)
        i8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.rgb2id.argtypes = [i8, i32, ctypes.c_int64]
        lib.id2rgb.argtypes = [i32, i8, ctypes.c_int64]
        lib.extract_masks_downsampled.argtypes = [
            i32, ctypes.c_int64, ctypes.c_int64,
            i32, ctypes.c_int64,
            i8, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.rgb_to_masks_downsampled.argtypes = [
            i8, ctypes.c_int64, ctypes.c_int64,
            i32, ctypes.c_int64,
            i8, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.paint_index.argtypes = [
            i32, ctypes.c_int64, i32, ctypes.c_int64, i8,
        ]
        lib.encode_palette_png.argtypes = [
            i8, ctypes.c_int64, ctypes.c_int64,
            i8, ctypes.c_int64,
            i8, ctypes.c_int64,
        ]
        lib.encode_palette_png.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def is_native() -> bool:
    return _load() is not None


def rgb2id(rgb: np.ndarray) -> np.ndarray:
    """[h, w, 3] uint8 → [h, w] int32."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if lib is None:
        from openpsg_tpu.utils.panoptic import rgb2id as np_rgb2id

        return np_rgb2id(rgb)
    out = np.empty(rgb.shape[:2], np.int32)
    lib.rgb2id(rgb, out, rgb.shape[0] * rgb.shape[1])
    return out


def id2rgb(ids: np.ndarray) -> np.ndarray:
    lib = _load()
    ids = np.ascontiguousarray(ids, np.int32)
    if lib is None:
        from openpsg_tpu.utils.panoptic import id2rgb as np_id2rgb

        return np_id2rgb(ids)
    out = np.empty(ids.shape + (3,), np.uint8)
    lib.id2rgb(ids, out, ids.size)
    return out


def _np_masks(ids: np.ndarray, segment_ids, out_hw):
    oh, ow = out_hw
    h, w = ids.shape
    sy = np.minimum(((np.arange(oh) + 0.5) * h / oh).astype(np.int64), h - 1)
    sx = np.minimum(((np.arange(ow) + 0.5) * w / ow).astype(np.int64), w - 1)
    small = ids[sy][:, sx]
    return np.stack([small == s for s in segment_ids]).astype(np.uint8)


def extract_masks_downsampled(
    ids: np.ndarray, segment_ids: Sequence[int], out_hw
) -> np.ndarray:
    """[h, w] int32 id map + K ids → [K, oh, ow] uint8 masks (fused pass)."""
    seg = np.ascontiguousarray(segment_ids, np.int32)
    lib = _load()
    if lib is None:
        return _np_masks(np.asarray(ids), seg, out_hw)
    ids = np.ascontiguousarray(ids, np.int32)
    oh, ow = out_hw
    out = np.zeros((len(seg), oh, ow), np.uint8)
    lib.extract_masks_downsampled(
        ids, ids.shape[0], ids.shape[1], seg, len(seg), out, oh, ow
    )
    return out


def rgb_to_masks_downsampled(
    rgb: np.ndarray, segment_ids: Sequence[int], out_hw
) -> np.ndarray:
    """PNG rgb buffer → [K, oh, ow] masks without materializing the id map."""
    seg = np.ascontiguousarray(segment_ids, np.int32)
    lib = _load()
    if lib is None:
        from openpsg_tpu.utils.panoptic import rgb2id as np_rgb2id

        return _np_masks(np_rgb2id(np.asarray(rgb)), seg, out_hw)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    oh, ow = out_hw
    out = np.zeros((len(seg), oh, ow), np.uint8)
    lib.rgb_to_masks_downsampled(
        rgb, rgb.shape[0], rgb.shape[1], seg, len(seg), out, oh, ow
    )
    return out


def paint_index(ids: np.ndarray, segment_ids: Sequence[int]) -> np.ndarray:
    """[h, w] id map + K segment ids → [h, w] uint8 palette indices
    (0 = background, s+1 = segment s).  One native pass; numpy fallback
    is a sort + searchsorted (still one vector pass, not K image scans)."""
    seg = np.ascontiguousarray(segment_ids, np.int32)
    ids = np.ascontiguousarray(ids, np.int32)
    lib = _load()
    if lib is not None and len(seg) <= 254:
        out = np.empty(ids.shape, np.uint8)
        lib.paint_index(ids.reshape(-1), ids.size, seg, len(seg),
                        out.reshape(-1))
        return out
    order = np.argsort(seg, kind="stable")
    sorted_seg = seg[order]
    pos = np.searchsorted(sorted_seg, ids)
    pos = np.minimum(pos, max(len(seg) - 1, 0))
    if len(seg) == 0:
        return np.zeros(ids.shape, np.uint8)
    hit = sorted_seg[pos] == ids
    return np.where(hit, (order[pos] + 1).astype(np.int64), 0).astype(np.uint8)


def encode_palette_png(
    idx: np.ndarray, palette_rgb: np.ndarray
) -> Optional[bytes]:
    """[h, w] uint8 palette indices + [n, 3] uint8 RGB palette → PNG bytes
    (8-bit color type 3 — cv2.imread expands it to BGR, so readers see the
    same pixels as an RGB truecolor file).  Returns None without the
    native library (callers fall back to cv2.imencode)."""
    lib = _load()
    if lib is None:
        return None
    idx = np.ascontiguousarray(idx, np.uint8)
    pal = np.ascontiguousarray(palette_rgb, np.uint8)
    assert pal.ndim == 2 and pal.shape[1] == 3 and pal.shape[0] <= 256
    h, w = idx.shape
    cap = h * (w + 1) + h * (w + 1) // 1000 + 1100 + 3 * pal.shape[0]
    buf = np.empty(cap, np.uint8)
    n = lib.encode_palette_png(idx.reshape(-1), h, w, pal.reshape(-1),
                               pal.shape[0], buf, cap)
    if n <= 0:
        return None
    return buf[:n].tobytes()
