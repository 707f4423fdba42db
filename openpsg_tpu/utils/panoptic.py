"""Panoptic PNG id encoding helpers.

Submission PNGs encode segment ids in RGB: ``id = R + 256*G + 256²*B``
(panopticapi convention, re-implemented by the reference at
tools/parse_predict.py:16-37 and used when writing submissions at
tools/infer.py:149-169).  Colors per segment are random in the reference;
we make the RNG seedable so outputs are reproducible.
"""

from __future__ import annotations

import numpy as np


def rgb2id(color: np.ndarray) -> np.ndarray:
    """[..., 3] uint8 RGB → [...] int32 id."""
    color = color.astype(np.uint32)
    return (color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]).astype(
        np.int32
    )


def id2rgb(id_map: np.ndarray) -> np.ndarray:
    """[...] int id → [..., 3] uint8 RGB."""
    id_map = id_map.astype(np.uint32)
    rgb = np.zeros(id_map.shape + (3,), dtype=np.uint8)
    rgb[..., 0] = id_map % 256
    rgb[..., 1] = (id_map // 256) % 256
    rgb[..., 2] = (id_map // (256 * 256)) % 256
    return rgb


def random_colors(n: int, seed: int | None = None, forbid_black: bool = True) -> np.ndarray:
    """n distinct random RGB colors, uint8 [n, 3].

    The reference draws fresh random colors per segment when writing
    submission PNGs (tools/infer.py:152-156); the *color* does not matter for
    grading (ids are re-derived via rgb2id) but distinctness does.  We
    guarantee distinctness and optional reproducibility.
    """
    rng = np.random.default_rng(seed)
    seen = set()
    out = []
    while len(out) < n:
        c = tuple(int(x) for x in rng.integers(0, 256, size=3))
        if c in seen or (forbid_black and c == (0, 0, 0)):
            continue
        seen.add(c)
        out.append(c)
    return np.array(out, dtype=np.uint8)
