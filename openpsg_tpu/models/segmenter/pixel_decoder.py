"""Deformable-encoder pixel decoder (MaskDINO / Mask2Former style).

Produces (a) encoder-enhanced multi-scale memory over strides 8/16/32 and
(b) dense stride-4 ``mask_features`` — the tensor the whole relation stack
consumes (reference surfaces it by patching the segmenter; SURVEY.md §2.10
and kings_sgg/models/relation_heads/mask2former_relation_head.py:57-121).

Replaces mmdet's ``MSDeformAttnPixelDecoder`` (CUDA) with the XLA/Pallas
deformable attention from openpsg_tpu.ops.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.segmenter.deform_layers import (
    DeformableEncoderLayer,
    make_cumsum_points,
    make_reference_points,
    sine_pos_embed,
)


class _ScannedEncoderLayer(nn.Module):
    """Adapter giving DeformableEncoderLayer an nn.scan carry signature."""

    dim: int
    num_heads: int
    num_levels: int
    num_points: int
    ffn_hidden: int
    spatial_shapes: tuple
    points_per_level: tuple = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        src, ref, pos_embed = carry
        src = DeformableEncoderLayer(
            self.dim, self.num_heads, self.num_levels, self.num_points,
            self.ffn_hidden, points_per_level=self.points_per_level,
            dtype=self.dtype, name="layer",
        )(src, self.spatial_shapes, ref, pos_embed)
        return (src, ref, pos_embed), None


def _gn32(x, dtype, name):
    """GroupNorm(32) over a SINGLE [H, W, C] map.  flax GroupNorm treats
    the leading axis as batch (it would normalize per-row here — torch-GN-
    incompatible), so normalize with an explicit batch axis.

    ``use_fast_variance=False``: flax's default one-pass variance
    (E[x²] − mean²) cancels catastrophically on high-mean channels —
    conv outputs with |mean|/std ≈ 3e3 lose ~7 significant digits and the
    normalized map diverges from torch ``F.group_norm`` by 1e-1 (caught
    by the assembled full-trunk golden, tests/test_full_trunk_golden.py).
    Torch always uses the two-pass form; match it."""
    return nn.GroupNorm(
        num_groups=32, epsilon=1e-5, dtype=dtype, name=name,
        use_fast_variance=False,
    )(x[None])[0]


class PixelDecoder(nn.Module):
    dim: int = 256
    num_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    ffn_hidden: int = 2048
    mask_dim: int = 256
    # total encoder levels: 3 backbone strides (8/16/32) + extra stride-2
    # downsamples of the last (MaskDINO TOTAL_NUM_FEATURE_LEVELS=4 adds a
    # stride-64 level via a 3x3/s2 conv on res5)
    total_levels: int = 3
    # deploy-time encoder sample-point pruning (per level, each <= K):
    # the encoder is the one stage ~10x off its hardware floor and is
    # gather-RATE bound (PARITY.md speed-of-light table) — gathering only
    # K_l of the K learned points per level shaves time proportionally.
    # Params are unchanged (checkpoints load as-is); None = exact parity.
    enc_points_per_level: tuple = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        """features: NHWC maps at strides (4, 8, 16, 32), single image.

        Returns:
          memory: [Lv, dim] encoder output (flattened, level-major,
                  high-res first, matching ``spatial_shapes`` order)
          spatial_shapes: static [(h, w)] per encoder level
          mask_features: [H/4, W/4, mask_dim]
        """
        c2, c3, c4, c5 = features  # strides 4, 8, 16, 32
        # high-to-low resolution order internally: (8, 16, 32[, 64...]);
        # the weight converter permutes checkpoint level order onto this.
        levels = [c3, c4, c5]
        tokens = []
        for i, f in enumerate(levels):
            t = nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"input_proj{i}")(f)
            t = _gn32(t, self.dtype, f"input_norm{i}")
            tokens.append(t)
        prev = c5
        for i in range(len(levels), self.total_levels):
            # extra low-res level: 3x3 stride-2 conv (first from raw res5,
            # subsequent ones from the previous extra level)
            # explicit torch-style padding: SAME would pad (0, 1) on even
            # dims (a one-pixel shift vs the checkpoint's Conv2d padding=1)
            t = nn.Conv(self.dim, (3, 3), strides=(2, 2), use_bias=True,
                        padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"input_proj{i}")(prev)
            t = _gn32(t, self.dtype, f"input_norm{i}")
            tokens.append(t)
            prev = t
        spatial_shapes = tuple((f.shape[0], f.shape[1]) for f in tokens)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.total_levels, self.dim),
        )
        pos = []
        for i, t in enumerate(tokens):
            # pos embeds use the cumsum coordinate convention, NOT pixel
            # centers — trained d2/mmdet checkpoints bake in the difference
            p = sine_pos_embed(
                jnp.asarray(make_cumsum_points([spatial_shapes[i]])), self.dim
            )
            pos.append(
                p.astype(self.dtype) + level_embed[i][None, :].astype(self.dtype)
            )

        src = jnp.concatenate([t.reshape(-1, self.dim) for t in tokens], 0)
        pos_embed = jnp.concatenate(pos, 0)
        ref = jnp.asarray(make_reference_points(spatial_shapes))

        scanned = nn.scan(
            _ScannedEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
        )(
            self.dim, self.num_heads, self.total_levels, self.num_points,
            self.ffn_hidden, tuple(spatial_shapes),
            points_per_level=(
                tuple(self.enc_points_per_level)
                if self.enc_points_per_level else None
            ),
            dtype=self.dtype, name="layers",
        )
        (src, _, _), _ = scanned((src, ref, pos_embed), None)

        # FPN top-down to stride 4 for mask features (res2 lateral joins the
        # stride-8 encoder output; d2 Conv2d-with-norm convention: no bias)
        h8, w8 = spatial_shapes[0]
        enc8 = src[: h8 * w8].reshape(h8, w8, self.dim)
        lat4 = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                       name="lateral4")(c2)
        lat4 = _gn32(lat4, self.dtype, "lateral4_norm")
        up = jax.image.resize(
            enc8, (c2.shape[0], c2.shape[1], self.dim), method="bilinear"
        ).astype(self.dtype)
        fused = lat4 + up
        fused = nn.Conv(self.dim, (3, 3), use_bias=False, dtype=self.dtype,
                        name="output4")(fused)
        fused = _gn32(fused, self.dtype, "output4_norm")
        fused = nn.relu(fused)
        mask_features = nn.Conv(
            self.mask_dim, (1, 1), dtype=self.dtype, name="mask_feature_proj"
        )(fused)

        return src, spatial_shapes, mask_features
