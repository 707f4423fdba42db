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
    attn_w: jnp.ndarray,       # [B, Lq, n_heads, K] softmaxed point weights
) -> jnp.ndarray:              # [B, Lq, n_heads, head_dim] (K-reduced, f32)
    """Bilinearly sample one feature level at normalized locations.

    Follows ``grid_sample(align_corners=False)`` semantics as used by the
    reference CUDA op: pixel centers at (i + 0.5) / size, zero padding
    outside the map.

    Layout notes (measured on v5e):
      * XLA's gather is RATE-bound per row (random vs local indices time
        identically), so the win is fewer, wider gathers: the four
        bilinear corners of a sample are rows {r, r+1, r+w, r+w+1} of the
        flattened map — we build a "quad" table whose row r concatenates
        those four neighbours on the feature axis (three shifted copies),
        making each sample ONE gather of a 4·head_dim row instead of four;
      * gathers issue per (batch, head) from a flat [H*W, 4·head_dim]
        table (~5× faster than head-batched take_along_axis);
      * out-of-range corners contribute zero via their interpolation
        weight — clamped/wrapped quad rows are weight-zeroed, so the
        gather itself is mask-free.
    """
    B, _, n_heads, head_dim = value.shape
    Lq, K = loc.shape[1], loc.shape[3]
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5

    # Quad base clamped so the whole 2x2 patch is in-map.  Corner weights
    # are TENT functions max(0, 1-|coord - corner|), which is exactly
    # grid_sample's zero-padding bilinear: off-support corners get weight
    # 0 automatically (including samples just outside the border), so no
    # validity masks and no wrap handling are needed.
    bx = jnp.clip(jnp.floor(x), 0, max(w - 2, 0)).astype(jnp.int32)
    by = jnp.clip(jnp.floor(y), 0, max(h - 2, 0)).astype(jnp.int32)
    fx0 = jnp.maximum(0.0, 1.0 - jnp.abs(x - bx))              # col bx
    fx1 = jnp.maximum(0.0, 1.0 - jnp.abs(x - (bx + 1)))        # col bx+1
    fy0 = jnp.maximum(0.0, 1.0 - jnp.abs(y - by))
    fy1 = jnp.maximum(0.0, 1.0 - jnp.abs(y - (by + 1)))
    # fold the per-point attention weights into the corner weights: the
    # K-and-corner reduction then happens in ONE contraction, never
    # materializing a [.., K, hd] intermediate
    cw = jnp.stack(
        [fx0 * fy0, fx1 * fy0, fx0 * fy1, fx1 * fy1], axis=-1
    ) * attn_w[..., None]                                      # [B,Lq,nH,K,4]
    base = by * w + bx                                         # [B,Lq,nH,K]

    value_bh = value.transpose(0, 2, 1, 3)                     # [B,nH,HW,hd]
    idx_bh = base.transpose(0, 2, 1, 3).reshape(B, n_heads, Lq * K)
    per_b = []
    for b in range(B):
        per_h = []
        for hh in range(n_heads):
            v = value_bh[b, hh]                                # [HW, hd]
            # quad table: row r = [v[r], v[r+1], v[r+w], v[r+w+1]];
            # base ∈ [0, (h-1)w + w-2] keeps every quad row in-map
            quad = jnp.concatenate(
                [
                    v,
                    jnp.roll(v, -1, axis=0),
                    jnp.roll(v, -w, axis=0),
                    jnp.roll(v, -(w + 1), axis=0),
                ],
                axis=1,
            )                                                  # [HW, 4*hd]
            g = jnp.take(quad, idx_bh[b, hh], axis=0)
            g = g.reshape(Lq, K * 4, head_dim)
            # single contraction over (K, corners); operands stay in the
            # value dtype (halves gather-output traffic in bf16), the dot
            # accumulates in fp32
            wts = cw[b, :, hh].reshape(Lq, K * 4)              # [Lq, K*4]
            per_h.append(
                jnp.einsum(
                    "lkd,lk->ld", g, wts.astype(g.dtype),
                    preferred_element_type=jnp.float32,
                )
            )                                                  # [Lq, hd] f32
        per_b.append(jnp.stack(per_h, axis=1))                 # [Lq,nH,hd]
    return jnp.stack(per_b, axis=0)                            # [B,Lq,nH,hd]


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
        out = out + _bilinear_gather_level(
            v_lvl, h, w,
            sampling_locations[:, :, :, lvl],
            attention_weights[:, :, :, lvl],
        ).astype(out.dtype)                                    # [B,Lq,nH,hd]
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
