"""Vectorized panoptic fusion + mmdet-scheme id assignment.

Reimplements, as pure XLA (no per-query python loops):
  * the greedy score-weighted per-pixel argmax fusion of
    kings_sgg/models/seg_heads/maskformer_fusion_relation_head.py:11-111
    ('raw' mode: winner per pixel, area/iou_thr filtering, stuff merged per
    class, things get instance ids, per-segment score = mean winner score);
  * the OpenSeeD→mmdet panoptic id remap loop of
    kings_sgg/models/detectors/openseed_relation_v2.py:113-131
    (category_id + INSTANCE_OFFSET * per-class occurrence counter) — fused
    directly into id assignment instead of a CPU numpy pass.

Conventions:
  * ids follow mmdet: ``category + INSTANCE_OFFSET * instance``; void = 133
    (the sentinel tools/predict.py:65-67 skips).  We use void=133 for the
    OpenSeeD path too (the reference leaves void at 0 there, which can
    collide with {category 0, instance 0}; documented deviation — our
    scheme is collision-free and downstream-compatible).
  * ``instance_mode='per_class'`` reproduces the OpenSeeD remap counters;
    ``'global'`` reproduces the mmdet fusion head (shared thing counter
    starting at 1).

All outputs are static-shaped [Q] arrays + the [H, W] id map; the host
derives python lists (sorted-unique object ids) without device syncs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from openpsg_tpu.data.vocab import INSTANCE_OFFSET, NUM_OBJECT_CLASSES, NUM_THING_CLASSES

VOID_ID = NUM_OBJECT_CLASSES  # 133


class FusionResult(NamedTuple):
    pan_seg: jnp.ndarray        # [H, W] int32 mmdet-scheme ids, void=133
    winner_score: jnp.ndarray   # [H, W] f32 winning query's weighted prob
    object_ids: jnp.ndarray     # [Q] int32 id per query (valid where survive)
    survive: jnp.ndarray        # [Q] bool — query produced a segment
    query_scores: jnp.ndarray   # [Q] f32 mean winner score over the segment
    labels: jnp.ndarray         # [Q] int32 class per query


def panoptic_fusion(
    cls_logits: jnp.ndarray,    # [Q, K] or [Q, K+1] (softmax_void mode)
    mask_logits: jnp.ndarray,   # [Q, H, W]
    *,
    cls_mode: str = "sigmoid",           # 'sigmoid' (OpenSeeD) | 'softmax_void' (mmdet)
    object_mask_thr: float = 0.25,
    iou_thr: float = 0.8,
    filter_low_score: bool = False,
    instance_mode: str = "per_class",    # 'per_class' | 'global'
    num_things: int = NUM_THING_CLASSES,
    region_mask: jnp.ndarray | None = None,  # [H, W] bool valid-image region
) -> FusionResult:
    Q = cls_logits.shape[0]
    logits32 = cls_logits.astype(jnp.float32)
    if cls_mode == "softmax_void":
        probs = jax.nn.softmax(logits32, axis=-1)
        scores = jnp.max(probs, axis=-1)
        labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        keep = (labels != probs.shape[-1] - 1) & (scores > object_mask_thr)
        labels = jnp.minimum(labels, probs.shape[-1] - 2)  # clamp void label
    elif cls_mode == "sigmoid":
        probs = jax.nn.sigmoid(logits32)
        scores = jnp.max(probs, axis=-1)
        labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        keep = scores > object_mask_thr
    else:
        raise ValueError(cls_mode)

    mask_probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))  # [Q, H, W]
    if region_mask is not None:
        # padding pixels belong to no segment (the reference strips padding
        # before the segmenter, openseed_relation_v2.py:101-103)
        mask_probs = jnp.where(region_mask[None], mask_probs, 0.0)
    weighted = scores[:, None, None] * mask_probs
    weighted = jnp.where(keep[:, None, None], weighted, -1.0)
    winner = jnp.argmax(weighted, axis=0).astype(jnp.int32)       # [H, W]
    winner_score = jnp.max(weighted, axis=0)
    any_keep = jnp.any(keep)
    winner_score = jnp.where(any_keep, winner_score, 0.0)

    # per-query areas (one-hot free: compare winner to each q via broadcast)
    assigned = winner[None] == jnp.arange(Q, dtype=jnp.int32)[:, None, None]
    assigned = assigned & keep[:, None, None]
    if region_mask is not None:
        assigned = assigned & region_mask[None]
    binary = mask_probs >= 0.5
    if filter_low_score:
        write_mask = assigned & binary
    else:
        write_mask = assigned
    mask_area = jnp.sum(assigned, axis=(1, 2))                    # pre-intersection
    orig_area = jnp.sum(binary, axis=(1, 2))
    ratio_ok = mask_area >= iou_thr * orig_area                   # mask/orig >= thr
    survive = keep & (mask_area > 0) & (orig_area > 0) & ratio_ok

    # ---- instance id assignment, vectorized ----
    is_thing = labels < num_things
    if instance_mode == "global":
        # mmdet fusion head: shared counter over surviving thing queries, from 1
        inst = jnp.cumsum((survive & is_thing).astype(jnp.int32)) * (
            survive & is_thing
        )
        object_ids = jnp.where(is_thing, labels + INSTANCE_OFFSET * inst, labels)
    elif instance_mode == "per_class":
        # OpenSeeD remap: per-class occurrence counter, from 0, over segments
        # in query order.  Stuff queries of the same class merge into one
        # segment → they must share occurrence 0, so only things count.
        onehot = jax.nn.one_hot(labels, cls_logits.shape[-1], dtype=jnp.int32)
        counted = onehot * (survive & is_thing)[:, None]
        occ = jnp.cumsum(counted, axis=0) - counted               # exclusive
        inst = jnp.take_along_axis(occ, labels[:, None], axis=1)[:, 0]
        object_ids = jnp.where(is_thing, labels + INSTANCE_OFFSET * inst, labels)
    else:
        raise ValueError(instance_mode)
    object_ids = object_ids.astype(jnp.int32)

    # final map: oid of winning surviving query, else void
    pix_ok = jnp.take(survive, winner) & jnp.take(keep, winner)
    pix_ok = pix_ok & jnp.any(write_mask, axis=0)
    pan_seg = jnp.where(pix_ok, jnp.take(object_ids, winner), VOID_ID)

    # per-query segment score = mean winner_score over its surviving pixels
    seg_mask = write_mask & pix_ok[None]
    seg_area = jnp.sum(seg_mask, axis=(1, 2))
    seg_sum = jnp.sum(jnp.where(seg_mask, winner_score[None], 0.0), axis=(1, 2))
    query_scores = seg_sum / jnp.maximum(seg_area, 1)

    return FusionResult(
        pan_seg=pan_seg.astype(jnp.int32),
        winner_score=winner_score,
        object_ids=object_ids,
        survive=survive & (seg_area > 0),
        query_scores=query_scores,
        labels=labels,
    )


def panoptic_fusion_area(
    cls_logits: jnp.ndarray,    # [Q, K+1] (softmax over classes + void)
    mask_logits: jnp.ndarray,   # [Q, H, W]
    *,
    object_mask_thr: float = 0.8,
    num_things: int = NUM_THING_CLASSES,
    region_mask: jnp.ndarray | None = None,
):
    """The reference's unused ``mode='area'`` fusion
    (maskformer_fusion_relation_head.py:37-63), vectorized: kept queries are
    painted largest-binary-area first so smaller masks overwrite larger ones.
    Per pixel the winner is therefore the covering query with the smallest
    (area, index) — an argmin, no sequential painting.  Thing instance ids
    count from 1 in paint order; stuff paints its bare class id.  Unlike
    'raw' mode the reference does NOT re-derive objects from the final map:
    every painted query stays in the object list (even if fully overpainted)
    and its score is the mean of its own score-weighted probs over its own
    binary mask.

    Returns (FusionResult, paint_pos [Q] i32) — paint_pos orders the object
    list (invalid queries get Q).  ``survive`` marks painted queries;
    ``query_scores`` is the own-mask mean described above.
    """
    Q = cls_logits.shape[0]
    logits32 = cls_logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits32, axis=-1)
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    keep = (labels != probs.shape[-1] - 1) & (scores > object_mask_thr)
    labels = jnp.minimum(labels, probs.shape[-1] - 2)

    mask_probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    if region_mask is not None:
        mask_probs = jnp.where(region_mask[None], mask_probs, 0.0)
    binary = mask_probs >= 0.5
    area = jnp.sum(binary, axis=(1, 2)).astype(jnp.int32)
    valid = keep & (area > 0)

    # paint order = area descending, ties broken by HIGHER index first
    # (torch ascending stable sort, flipped), so the per-pixel winner —
    # the query painted last among those covering it — minimizes
    # key = area * Q + index over covering valid queries.
    key = area * Q + jnp.arange(Q, dtype=jnp.int32)             # [Q]
    cover_key = jnp.where(
        valid[:, None, None] & binary, key[:, None, None], jnp.iinfo(jnp.int32).max
    )
    winner = jnp.argmin(cover_key, axis=0).astype(jnp.int32)     # [H, W]
    covered = jnp.min(cover_key, axis=0) < jnp.iinfo(jnp.int32).max

    is_thing = labels < num_things
    # instance id = 1 + number of valid things painted earlier (larger key)
    thing_key = jnp.where(valid & is_thing, key, -1)
    inst = 1 + jnp.sum(
        (thing_key[None, :] > key[:, None]) & (thing_key[None, :] >= 0), axis=1
    ).astype(jnp.int32)
    object_ids = jnp.where(
        is_thing, labels + INSTANCE_OFFSET * inst, labels
    ).astype(jnp.int32)

    pan_seg = jnp.where(covered, jnp.take(object_ids, winner), VOID_ID)

    # own-mask score: mean of this query's score-weighted probs over its
    # binary mask (computed pre-overwrite in the reference loop)
    weighted = scores[:, None, None] * mask_probs
    own_sum = jnp.sum(jnp.where(binary, weighted, 0.0), axis=(1, 2))
    query_scores = own_sum / jnp.maximum(area, 1)

    winner_score = jnp.where(
        covered, jnp.take_along_axis(weighted, winner[None], axis=0)[0], 0.0
    )

    # paint position: rank of key in descending order among valid queries
    paint_pos = jnp.where(
        valid,
        jnp.sum((key[None, :] > key[:, None]) & valid[None, :], axis=1),
        Q,
    ).astype(jnp.int32)

    result = FusionResult(
        pan_seg=pan_seg.astype(jnp.int32),
        winner_score=winner_score,
        object_ids=object_ids,
        survive=valid,
        query_scores=query_scores,
        labels=labels,
    )
    return result, paint_pos


def extract_object_lists_area(result: FusionResult, paint_pos) -> tuple:
    """Host-side object lists for 'area' mode: painted queries in paint
    order, overpainted segments included (reference appends during the
    paint loop and never re-derives, :52-63)."""
    import numpy as np

    pos = np.asarray(paint_pos)
    order = np.argsort(pos, kind="stable")
    surv = np.asarray(result.survive)
    obj_ids = np.asarray(result.object_ids)       # one host fetch, not per-q
    q_scores = np.asarray(result.query_scores)
    oids, scores = [], []
    for q in order:
        if not surv[q]:
            break  # invalid queries sort last (pos == Q)
        oids.append(int(obj_ids[q]))
        scores.append(float(q_scores[q]))
    return oids, scores


def extract_object_lists(result: FusionResult):
    """Host-side: sorted-unique object ids + scores, reference semantics
    (torch.unique over the final map, maskformer_fusion_relation_head:100-108).
    Stuff queries merged to one entry per class (first survivor's score kept
    via segment mean, identical across the merged segment)."""
    import numpy as np

    oids = np.asarray(result.object_ids)
    surv = np.asarray(result.survive)
    scores = np.asarray(result.query_scores)
    seen = {}
    for q in np.nonzero(surv)[0]:
        oid = int(oids[q])
        if oid not in seen:
            seen[oid] = float(scores[q])
    ordered = sorted(seen)
    return ordered, [seen[o] for o in ordered]
