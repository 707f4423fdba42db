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


def mask_pool_chunked(
    features: jnp.ndarray, masks: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Reference ``_mask_pooling(output_size=S)`` with static shapes.

    features: [C, H, W]; masks: [N, H, W]; → [N, S, C] object tokens.

    Semantics (kings_sgg/models/detectors/mask2former_relation.py:84-109):
    take the masked pixels (``mask >= 0.5``) in row-major scan order, split
    them into S contiguous chunks — the first ``n % S`` chunks one pixel
    longer — and mean each chunk.  If ``0 < n < S`` the pixel sequence is
    tiled and truncated to exactly S, so token k is the single pixel of
    rank ``k % n``.  Empty masks yield zero tokens.

    TPU design: instead of gathering a dynamic-length pixel list (dynamic
    shapes), each pixel's chunk id is computed from its mask-rank
    (``cumsum``) and the pooling becomes ONE [C, P] × [P, S] matmul per
    object — MXU work, jit-safe, differentiable w.r.t. ``features``.
    """
    if size == 1:
        return mask_pool(features, masks)[:, None, :]
    C = features.shape[0]
    flat = features.reshape(C, -1)                       # [C, P]
    m = (masks >= 0.5).reshape(masks.shape[0], -1)       # [N, P]
    ks = jnp.arange(size)

    def weights_one(mrow):
        n = mrow.sum()
        r0 = jnp.cumsum(mrow) - 1                        # pixel rank, 0-based
        base, rem = n // size, n % size
        big = jnp.where(
            r0 < rem * (base + 1),
            r0 // jnp.maximum(base + 1, 1),
            rem + (r0 - rem * (base + 1)) // jnp.maximum(base, 1),
        )
        w_big = mrow[:, None] & (big[:, None] == ks[None, :])
        # n < S: tile-and-truncate — token k is the pixel of rank k % n
        w_small = mrow[:, None] & (
            (ks[None, :] % jnp.maximum(n, 1)) == r0[:, None]
        )
        return jnp.where(n >= size, w_big, w_small)      # [P, S]

    w = jax.vmap(weights_one)(m).astype(features.dtype)  # [N, P, S]
    num = jnp.einsum("cp,nps->nsc", flat, w)
    den = jnp.sum(w, axis=1)[:, :, None]                 # [N, S, 1]
    return num / jnp.maximum(den, 1.0)


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
