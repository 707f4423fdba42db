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
                        [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
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
