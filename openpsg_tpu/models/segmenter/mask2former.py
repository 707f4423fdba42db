"""Mask2Former panoptic segmenter assembly (v1/v2/v3 model generations).

backbone (R50 / Swin) → deformable-encoder pixel decoder (shared with the
OpenSeeD path; replaces mmdet's MSDeformAttnPixelDecoder CUDA op) →
masked-attention query decoder.  Returns query predictions with a void
class column + the stride-4 ``mask_features`` that
``Mask2FormerRelationHead`` exposes in the reference
(kings_sgg/models/relation_heads/mask2former_relation_head.py:57-121).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.segmenter.mask2former_decoder import Mask2FormerDecoder
from openpsg_tpu.models.segmenter.pixel_decoder import PixelDecoder
from openpsg_tpu.models.segmenter.resnet import ResNet
from openpsg_tpu.models.segmenter.swin import SwinTransformer


@dataclasses.dataclass(frozen=True)
class Mask2FormerConfig:
    backbone: str = "r50"             # r50 | swin_t | swin_b
    dim: int = 256
    mask_dim: int = 256
    num_queries: int = 100
    enc_layers: int = 6
    dec_layers: int = 9
    ffn_hidden: int = 2048            # transformer decoder FFN width
    # pixel-decoder (deformable encoder) FFN width; the reference's
    # MSDeformAttnPixelDecoder uses 1024 vs the decoder's 2048
    # (baseline_r50.py:70-75 vs :100-104).  None → ffn_hidden.
    enc_ffn_hidden: Any = None
    num_classes: int = 133
    # deploy-time encoder sample-point pruning (see SegmenterConfig /
    # PixelDecoder docstrings); None = exact parity
    enc_points_per_level: Any = None
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test() -> "Mask2FormerConfig":
        return Mask2FormerConfig(
            backbone="tiny", dim=32, mask_dim=32, num_queries=20,
            enc_layers=1, dec_layers=3, ffn_hidden=64, num_classes=8,
        )


class Mask2FormerSegmenter(nn.Module):
    cfg: Mask2FormerConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        if c.backbone == "r50":
            feats = ResNet(dtype=c.dtype, name="backbone")(image)
        elif c.backbone == "tiny_r50":
            # test-scale ResNet with the full key schema (converter tests)
            feats = ResNet(depths=(1, 1, 1, 1), base_ch=8, dtype=c.dtype,
                           name="backbone")(image)
        elif c.backbone == "swin_t":
            feats = SwinTransformer(dtype=c.dtype, name="backbone")(image)
        elif c.backbone == "swin_b":
            feats = SwinTransformer(
                embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                window=12, dtype=c.dtype, name="backbone",
            )(image)
        elif c.backbone == "tiny":
            feats = SwinTransformer(
                embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
                window=4, dtype=c.dtype, name="backbone",
            )(image)
        else:
            raise ValueError(c.backbone)

        memory, spatial_shapes, mask_features = PixelDecoder(
            dim=c.dim, num_layers=c.enc_layers,
            ffn_hidden=c.enc_ffn_hidden or c.ffn_hidden,
            mask_dim=c.mask_dim,
            enc_points_per_level=c.enc_points_per_level,
            dtype=c.dtype, name="pixel_decoder",
        )(feats)
        out = Mask2FormerDecoder(
            dim=c.dim, num_queries=c.num_queries, num_layers=c.dec_layers,
            ffn_hidden=c.ffn_hidden, mask_dim=c.mask_dim,
            num_classes=c.num_classes, dtype=c.dtype, name="decoder",
        )(memory, spatial_shapes, mask_features)
        out["mask_features"] = mask_features
        return out
