"""OpenSeeD-style panoptic segmenter assembly (TPU-native).

Replaces the reference's 3rdparty OpenSeeD (Swin-T + MaskDINO + CLIP
language encoder; SURVEY.md §2.10).  The forward contract mirrors what the
detector consumes (openseed_relation_v2.py:107-139):

    outputs, mask_features = segmenter(image)

where outputs carry class logits / mask logits / boxes for Q queries and
``mask_features`` is the dense stride-4 map the relation head pools from.

The whole forward is one jitted function of static input shape: backbone →
deformable-encoder pixel decoder → two-stage query decoder → (fusion done
by the caller so the relation head can fuse it into the same jit).
Classification is open-vocabulary against a class-embedding matrix that is
computed once (language.get_text_embeddings) and passed in as a constant —
exactly the reference's precompute-at-init pattern.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.segmenter.decoder import QueryDecoder
from openpsg_tpu.models.segmenter.pixel_decoder import PixelDecoder
from openpsg_tpu.models.segmenter.swin import SwinTransformer

# ImageNet normalization, identical in mmdet & OpenSeeD
# (configs/psg/baseline_v4_ov.py:74-75; openseed_relation_v2.py:97-99).
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class SegmenterConfig:
    """Defaults match the published OpenSeeD Swin-T checkpoint geometry
    (``model_state_dict_swint_51.2ap.pt``: MaskDINO with 300 queries, 6
    encoder / 9 decoder layers, 4 total feature levels, 512-d language
    projection — openseed_relation_v2.py:37-41, SURVEY.md §2.10)."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    dim: int = 256
    mask_dim: int = 256
    num_queries: int = 300
    enc_layers: int = 6
    dec_layers: int = 9
    num_points: int = 4
    ffn_hidden: int = 2048
    # total deformable-encoder levels: 3 backbone strides (8/16/32) plus
    # extra stride-2 downsamples (MaskDINO TOTAL_NUM_FEATURE_LEVELS=4)
    total_levels: int = 4
    proj_dim: int = 512        # language-space projection width (DIM_PROJ)
    # Level order of the TRAINED checkpoint's deformable-attention axis
    # (weight_convert.convert_openseed permutes onto our fine-first internal
    # order).  Also drives the two-stage proposal anchor sizes: MaskDINO's
    # gen_encoder_output_proposals assigns wh = 0.05 * 2**lvl by ITS level
    # index, so the anchor a trained model expects at a given stride depends
    # on this order.  Keep this field and the conversion-time argument in
    # sync (VALIDATION.md runbook).
    ckpt_level_strides: Tuple[int, ...] = (32, 16, 8, 64)
    # Deploy-time encoder sample-point pruning (per level, fine-first
    # internal order, each <= num_points).  None = exact checkpoint
    # parity (all 4 points on all levels).  The encoder is the one
    # inference stage ~10x off its hardware floor and is gather-RATE
    # bound, so gathers scale down proportionally; weights renormalize
    # over the kept points and the param tree is unchanged (PARITY.md,
    # measured).  A quality knob — keep None unless validated on data.
    enc_points_per_level: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test() -> "SegmenterConfig":
        """Minimal config for CPU tests: same topology, tiny widths."""
        return SegmenterConfig(
            embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
            window=4, dim=32, mask_dim=32, num_queries=20, enc_layers=1,
            dec_layers=2, ffn_hidden=64, total_levels=3, proj_dim=32,
        )


class OpenSeedSegmenter(nn.Module):
    """Single-image segmenter; returns query predictions + mask features."""

    cfg: SegmenterConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, class_embeds: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """image: [H, W, 3] normalized ((x-mean)/std), H, W static, ÷32.

        Returns dict: cls_logits [Q, num_classes] (f32), masks [Q, H/4, W/4]
        (f32 logits), boxes [Q, 4], query_embed [Q, C],
        mask_features [H/4, W/4, mask_dim].
        """
        c = self.cfg
        feats = SwinTransformer(
            embed_dim=c.embed_dim, depths=c.depths, num_heads=c.num_heads,
            window=c.window, dtype=c.dtype, name="backbone",
        )(image)
        memory, spatial_shapes, mask_features = PixelDecoder(
            dim=c.dim, num_layers=c.enc_layers, num_points=c.num_points,
            ffn_hidden=c.ffn_hidden, mask_dim=c.mask_dim,
            total_levels=c.total_levels,
            enc_points_per_level=c.enc_points_per_level, dtype=c.dtype,
            name="pixel_decoder",
        )(feats)
        internal_strides = [8, 16, 32] + [64 * (2 ** i)
                                          for i in range(c.total_levels - 3)]
        wh_exp = tuple(
            c.ckpt_level_strides.index(s)
            for s in internal_strides[: c.total_levels]
        )
        out = QueryDecoder(
            dim=c.dim, num_queries=c.num_queries, num_layers=c.dec_layers,
            num_points=c.num_points, ffn_hidden=c.ffn_hidden,
            mask_dim=c.mask_dim, proj_dim=c.proj_dim,
            level_wh_exp=wh_exp, dtype=c.dtype,
            name="decoder",
        )(memory, spatial_shapes, mask_features, class_embeds)
        out["mask_features"] = mask_features
        return out


def normalize_image(image_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [H, W, 3] RGB 0-255 → normalized float32."""
    mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(PIXEL_STD, jnp.float32)
    return (image_u8.astype(jnp.float32) - mean) / std
