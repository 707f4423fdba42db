"""Mask-centric ops: pooling, pair OR-masks, resampling.

TPU-native replacements for host-side hot spots in the reference:
  * ``mask_pool``      — per-object feature pooling
    (kings_sgg/models/detectors/mask2former_relation.py:84-109)
  * ``pair_or_masks``  — the N² python list comprehension of
    ``logical_or(mask_i, mask_j)`` at
    kings_sgg/models/relation_heads/relation_transformer_head_v4.py:401-404,
    expressed as one broadcast (maximum over the two axes)
  * ``downsample_mask_bilinear`` — ``F.interpolate(..., bilinear) > 0.5``
    used to project GT/panoptic masks onto the patch grid
    (relation_transformer_head_v4.py:379-388)
  * ``downsample_nearest`` — nearest-neighbour id-map resize
    (relation_transformer_head_v4.py:417-423)

All functions take static shapes and are jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_pool(features: jnp.ndarray, masks: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Masked average pool: one feature vector per mask.

    features: [C, H, W]; masks: [N, H, W] (bool or {0,1}); → [N, C].
    Empty masks yield the zero vector (reference behaviour,
    openseed_relation.py:182-183).
    """
    m = masks.astype(features.dtype)
    num = jnp.einsum("chw,nhw->nc", features, m)
    den = jnp.sum(m, axis=(1, 2))[:, None]
    return num / jnp.maximum(den, eps)


def pair_or_masks(masks: jnp.ndarray) -> jnp.ndarray:
    """All ordered-pair unions of N masks.

    masks: [N, P] (bool/float over P spatial positions) →
    [N, N, P] where out[i, j] = masks[i] OR masks[j].
    Pair-major flattening (i * N + j) matches the reference's
    ``for i ... for j`` ordering.
    """
    a = masks[:, None, :]
    b = masks[None, :, :]
    if masks.dtype == jnp.bool_:
        return a | b
    return jnp.maximum(a, b)


def downsample_mask_bilinear(masks: jnp.ndarray, out_hw: tuple, threshold: float = 0.5) -> jnp.ndarray:
    """Bilinear-resize binary masks then threshold (> threshold).

    masks: [N, H, W] → bool [N, h, w].  Matches
    ``F.interpolate(mode='bilinear', align_corners=False) > 0.5``.
    """
    n = masks.shape[0]
    resized = jax.image.resize(
        masks.astype(jnp.float32), (n,) + tuple(out_hw), method="bilinear",
        antialias=False,  # F.interpolate has no antialiasing on downscale
    )
    return resized > threshold


def downsample_nearest(idmap: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Nearest-neighbour resize of an integer id map [H, W] → [h, w]."""
    return jax.image.resize(idmap, tuple(out_hw), method="nearest")


def masks_from_idmap(idmap: jnp.ndarray, object_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-object boolean masks from a panoptic id map.

    idmap: [h, w] int; object_ids: [N] int → [N, h, w] bool.
    Replaces the reference's per-object ``pan_masks == object_id`` loop
    (relation_transformer_head_v4.py:426-429) with one broadcast compare.
    """
    return idmap[None, :, :] == object_ids[:, None, None]
