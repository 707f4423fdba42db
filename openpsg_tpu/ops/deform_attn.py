"""Multi-scale deformable attention — TPU-native formulation.

Replaces the CUDA ``MultiScaleDeformableAttention`` extension that every
segmenter config in the reference routes pixel decoding through
(mmcv/ops/multi_scale_deform_attn; configs/psg/baseline_r50.py:58-64 and
OpenSeeD's MaskDINO encoder; SURVEY.md §2.9).

Semantics (Deformable DETR, arXiv 2010.04159): each query attends to
``K`` learned sample points on each of ``L`` feature levels per head; each
sample is a bilinear read from the value map; results are combined with
learned softmax weights.

TPU design notes
----------------
The CUDA kernel is a scatter/gather grid-sampler.  On TPU we express the
bilinear sample as four ``take_along_axis`` gathers over the flattened
spatial axis with computed corner weights; XLA fuses the weight arithmetic
and the final head-combine einsum onto the VPU/MXU.  All shapes are static.
A Pallas kernel can specialize this further (corner gathers from VMEM tiles)
— kept as an opt-in since the gather formulation is already
bandwidth-bound-optimal for the sizes used here (Lv ≈ 35k, C = 256).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_level(
    value: jnp.ndarray,        # [B, H*W, n_heads, head_dim]
    h: int,
    w: int,
    loc: jnp.ndarray,          # [B, Lq, n_heads, K, 2] in [0, 1] (x, y)
) -> jnp.ndarray:              # [B, Lq, n_heads, K, head_dim]
    """Bilinearly sample one feature level at normalized locations.

    Follows ``grid_sample(align_corners=False)`` semantics as used by the
    reference CUDA op: pixel centers at (i + 0.5) / size, zero padding
    outside the map.
    """
    B, _, n_heads, head_dim = value.shape
    # to continuous pixel coords (align_corners=False)
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def corner(ix, iy):
        # zero-pad out-of-range samples
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = iyc * w + ixc                                   # [B, Lq, nH, K]
        Bq, Lq, _, K = flat.shape
        # head axis must line up with value's head axis for the gather:
        # [B, Lq, nH, K] -> [B, Lq*K, nH]
        flat2 = flat.transpose(0, 1, 3, 2).reshape(Bq, Lq * K, n_heads)
        gathered = jnp.take_along_axis(
            value, flat2[..., None].astype(jnp.int32), axis=1
        )                                                      # [B, Lq*K, nH, hd]
        gathered = gathered.reshape(Bq, Lq, K, n_heads, head_dim).transpose(
            0, 1, 3, 2, 4
        )                                                      # [B, Lq, nH, K, hd]
        return jnp.where(valid[..., None], gathered, 0.0)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)

    wx1 = dx[..., None]
    wy1 = dy[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    return (
        v00 * wx0 * wy0
        + v01 * wx1 * wy0
        + v10 * wx0 * wy1
        + v11 * wx1 * wy1
    )


def ms_deform_attn(
    value: jnp.ndarray,                 # [B, Lv, n_heads, head_dim]
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h, w)] * L
    sampling_locations: jnp.ndarray,    # [B, Lq, n_heads, L, K, 2] in [0,1]
    attention_weights: jnp.ndarray,     # [B, Lq, n_heads, L, K] (softmaxed)
) -> jnp.ndarray:                       # [B, Lq, n_heads * head_dim]
    """Multi-scale deformable attention core (value already projected).

    ``spatial_shapes`` must be static Python ints — level boundaries become
    static slices so XLA sees fixed shapes (no dynamic control flow).
    """
    B, Lv, n_heads, head_dim = value.shape
    L = len(spatial_shapes)
    assert sampling_locations.shape[3] == L
    total = sum(h * w for h, w in spatial_shapes)
    assert total == Lv, f"spatial shapes {spatial_shapes} != Lv {Lv}"

    out = jnp.zeros(
        sampling_locations.shape[:3] + (head_dim,),
        dtype=jnp.promote_types(value.dtype, jnp.float32),
    )  # [B, Lq, nH, hd] accumulated over levels & points in fp32
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_lvl = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        sampled = _bilinear_gather_level(
            v_lvl, h, w, sampling_locations[:, :, :, lvl]
        )  # [B, Lq, nH, K, hd]
        wts = attention_weights[:, :, :, lvl][..., None]       # [B,Lq,nH,K,1]
        out = out + jnp.sum(sampled.astype(out.dtype) * wts.astype(out.dtype), axis=3)
        start += h * w

    return out.reshape(B, -1, n_heads * head_dim).astype(value.dtype)


def ms_deform_attn_reference(value, spatial_shapes, sampling_locations, attention_weights):
    """Pure-numpy golden model for tests (scalar loops, unvectorized)."""
    import numpy as np

    value = np.asarray(value, dtype=np.float64)
    locs = np.asarray(sampling_locations, dtype=np.float64)
    wts = np.asarray(attention_weights, dtype=np.float64)
    B, Lv, nH, hd = value.shape
    Lq = locs.shape[1]
    L = len(spatial_shapes)
    K = locs.shape[4]
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])
    out = np.zeros((B, Lq, nH, hd))
    for b in range(B):
        for q in range(Lq):
            for hh in range(nH):
                for lvl, (h, w) in enumerate(spatial_shapes):
                    vmap2d = value[b, starts[lvl]:starts[lvl + 1], hh].reshape(h, w, hd)
                    for k in range(K):
                        x = locs[b, q, hh, lvl, k, 0] * w - 0.5
                        y = locs[b, q, hh, lvl, k, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        dx, dy = x - x0, y - y0
                        acc = np.zeros(hd)
                        for (ix, iy, cw) in (
                            (x0, y0, (1 - dx) * (1 - dy)),
                            (x0 + 1, y0, dx * (1 - dy)),
                            (x0, y0 + 1, (1 - dx) * dy),
                            (x0 + 1, y0 + 1, dx * dy),
                        ):
                            if 0 <= ix < w and 0 <= iy < h:
                                acc += cw * vmap2d[iy, ix]
                        out[b, q, hh] += wts[b, q, hh, lvl, k] * acc
    return out.reshape(B, Lq, nH * hd)
