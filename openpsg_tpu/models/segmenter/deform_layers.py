"""Deformable-transformer building blocks (Deformable DETR / MaskDINO style).

These wrap ``openpsg_tpu.ops.ms_deform_attn`` with the learned
offset/weight projections, replacing the CUDA ``MSDeformAttn`` module used
throughout the reference's segmenters (SURVEY.md §2.9).  Shapes are single
image (no batch dim); batch via ``jax.vmap`` at the detector level.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openpsg_tpu.ops.deform_attn import ms_deform_attn


def make_reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Normalized (x, y) pixel-center reference points for every position of
    every level, concatenated: [Lv, 2] (static numpy)."""
    pts = []
    for (h, w) in spatial_shapes:
        ys, xs = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        pts.append(np.stack([xs, ys], -1).reshape(-1, 2))
    return np.concatenate(pts, 0).astype(np.float32)


def make_cumsum_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Normalized (x, y) coords in the d2/mmdet ``PositionEmbeddingSine``
    convention: cumsum over an unpadded mask → pixel i maps to
    ``(i+1)/(H+1e-6)`` (detectron2 position_encoding.py / mmdet
    SinePositionalEncoding with normalize=True, offset=0).  Used for sine
    POSITION EMBEDDINGS only — deformable-attention reference points stay
    at pixel centers (Deformable-DETR get_reference_points linspace): the
    two conventions genuinely differ in the reference stacks, and trained
    checkpoints bake in the difference."""
    eps = 1e-6
    pts = []
    for (h, w) in spatial_shapes:
        ys, xs = np.meshgrid(
            (np.arange(h) + 1.0) / (h + eps),
            (np.arange(w) + 1.0) / (w + eps),
            indexing="ij",
        )
        pts.append(np.stack([xs, ys], -1).reshape(-1, 2))
    return np.concatenate(pts, 0).astype(np.float32)


class MSDeformAttnLayer(nn.Module):
    """Learned-offset multi-scale deformable attention.

    ``points_per_level`` (optional, static): deploy-time sample-point
    pruning — only the first K_l of the K learned points are gathered per
    level and the softmax weights are renormalized over the kept subset
    (a convex combination again).  The PARAMETER tree is unchanged (the
    offset/weight Denses keep their full K width, so converted
    checkpoints load as-is); only the gather work shrinks.  None = exact
    parity."""

    dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    points_per_level: Optional[Tuple[int, ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,              # [Lq, C]
        value: jnp.ndarray,              # [Lv, C]
        spatial_shapes: Sequence[Tuple[int, int]],
        reference_points: jnp.ndarray,   # [Lq, 2] centers or [Lq, 4] boxes (cxcywh), normalized
    ) -> jnp.ndarray:                    # [Lq, C]
        Lq = query.shape[0]
        nH, L, K = self.num_heads, self.num_levels, self.num_points
        hd = self.dim // nH

        v = nn.Dense(self.dim, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(1, -1, nH, hd)

        off = nn.Dense(
            nH * L * K * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_grid_offset_init(nH, L, K),
            name="sampling_offsets",
        )(query).reshape(1, Lq, nH, L, K, 2)
        attn = nn.Dense(
            nH * L * K,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(1, Lq, nH, L * K)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(
            1, Lq, nH, L, K
        )
        if self.points_per_level is not None:
            # renormalize over the kept (level, point<K_l) subset so the
            # pruned combination stays convex; dropped columns keep their
            # (now unused) weights — ms_deform_attn never gathers them
            keep = np.zeros((L, K), np.float32)
            for lvl, kl in enumerate(self.points_per_level):
                keep[lvl, : int(kl)] = 1.0
            attn = attn * keep
            attn = attn / jnp.maximum(
                attn.sum(axis=(-2, -1), keepdims=True), 1e-9
            )

        if reference_points.shape[-1] == 2:
            # offsets in units of each level's pixels (Deformable DETR eq. 2)
            sizes = jnp.asarray(
                [(w, h) for (h, w) in spatial_shapes], dtype=jnp.float32
            )                                            # [L, 2] as (x, y)
            loc = (
                reference_points[None, :, None, None, None, :]
                + off.astype(jnp.float32) / sizes[None, None, None, :, None, :]
            )
        else:
            # box references: offsets scaled by half the box size
            centers = reference_points[..., :2]
            wh = reference_points[..., 2:]
            loc = (
                centers[None, :, None, None, None, :]
                + off.astype(jnp.float32) / K * wh[None, :, None, None, None, :] * 0.5
            )

        out = ms_deform_attn(
            v, spatial_shapes, loc, attn,
            points_per_level=self.points_per_level,
        )[0]                                                   # [Lq, C]
        return nn.Dense(self.dim, dtype=self.dtype, name="output_proj")(out)


def _grid_offset_init(nH: int, L: int, K: int):
    """Bias init spreading initial samples on a ring per head (Deformable
    DETR's ``_reset_parameters``), so training starts with a sane pattern."""
    theta = np.arange(nH) * (2.0 * np.pi / nH)
    grid = np.stack([np.cos(theta), np.sin(theta)], -1)   # [nH, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, L, K, 1))
    for k in range(K):
        grid[:, :, k] *= k + 1

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.asarray(grid.reshape(-1), dtype=dtype).reshape(shape)

    return init


class FFN(nn.Module):
    dim: int = 256
    hidden: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x + h)


class DeformableEncoderLayer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    ffn_hidden: int = 2048
    points_per_level: Optional[Tuple[int, ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, spatial_shapes, reference_points, pos_embed):
        q = src + pos_embed
        attn_out = MSDeformAttnLayer(
            self.dim, self.num_heads, self.num_levels, self.num_points,
            points_per_level=self.points_per_level,
            dtype=self.dtype, name="self_attn",
        )(q, src, spatial_shapes, reference_points)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn_out)
        return FFN(self.dim, self.ffn_hidden, dtype=self.dtype, name="ffn")(src)


class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"fc{self.layers - 1}")(x)


def _sine_1d(v: jnp.ndarray, half: int, temperature: float) -> jnp.ndarray:
    """One normalized coordinate [..., 1] → [..., half] with d2's
    PositionEmbeddingSine layout: interleaved (sin, cos) pairs over a
    shared frequency ladder (detectron2 position_encoding.py) — weight
    converters rely on this exact element order."""
    dim_t = temperature ** (2.0 * (np.arange(half) // 2) / half)
    ang = v * (2.0 * np.pi) / dim_t                     # [..., half]
    sin = jnp.sin(ang[..., 0::2])
    cos = jnp.cos(ang[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*ang.shape[:-1], half)


def sine_pos_embed(coords: jnp.ndarray, dim: int = 256, temperature: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding of normalized (x, y) coords [..., 2] → [..., dim].

    Matches d2/DETR ``PositionEmbeddingSine``: output = [y-features,
    x-features], each dim/2 wide, interleaved sin/cos."""
    half = dim // 2
    y = _sine_1d(coords[..., 1:2], half, temperature)
    x = _sine_1d(coords[..., 0:1], half, temperature)
    return jnp.concatenate([y, x], axis=-1)


def box_sine_embed(boxes: jnp.ndarray, dim: int = 256, temperature: float = 10000.0) -> jnp.ndarray:
    """DAB/MaskDINO ``gen_sineembed_for_position``: normalized (cx, cy, w, h)
    boxes [..., 4] → [..., 2*dim] ordered [y, x, w, h] blocks of dim/2."""
    half = dim // 2
    parts = [
        _sine_1d(boxes[..., 1:2], half, temperature),  # cy
        _sine_1d(boxes[..., 0:1], half, temperature),  # cx
        _sine_1d(boxes[..., 2:3], half, temperature),  # w
        _sine_1d(boxes[..., 3:4], half, temperature),  # h
    ]
    return jnp.concatenate(parts, axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))
