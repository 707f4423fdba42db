"""Panoptic segmenter training: Hungarian matching + mask/class losses.

The reference NEVER trains its segmenters (every config freezes them and
loads external checkpoints — SURVEY.md §2.2), which leaves users dependent
on unavailable weights.  This module adds the standard MaskFormer-family
recipe (arXiv 2107.06278 / 2112.01527) so the framework is trainable
end-to-end from scratch:

  * per-image cost matrix (class NLL + mask BCE + dice) computed in ONE
    jitted program over all images;
  * exact Hungarian assignment on host via scipy (the reference's own
    stack does the same — mmdet's MaskHungarianAssigner is scipy on CPU);
  * loss step jitted with the assignment passed as static-shape index
    arrays: softmax CE with a void class for unmatched queries
    (eos_coef-weighted), mask BCE + dice on the stride-4 grid.

The two-phase (cost-jit → host assign → loss-jit) structure is the
TPU-idiomatic version of mmdet's per-image python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openpsg_tpu.models.segmenter.openseed import normalize_image


class SegTrainBatch(NamedTuple):
    image: jnp.ndarray          # [B, H, W, 3] RGB 0-255
    gt_masks: jnp.ndarray       # [B, M, H4, W4] bool (stride-4 grid)
    gt_labels: jnp.ndarray      # [B, M] i32
    gt_valid: jnp.ndarray       # [B, M] bool


def dice_loss(pred_logits: jnp.ndarray, target: jnp.ndarray, eps: float = 1.0):
    """pred_logits/target: [..., P] → [...] dice loss."""
    p = jax.nn.sigmoid(pred_logits)
    num = 2.0 * jnp.sum(p * target, -1)
    den = jnp.sum(p, -1) + jnp.sum(target, -1)
    return 1.0 - (num + eps) / (den + eps)


def _mask_bce(pred_logits, target):
    per = jnp.maximum(pred_logits, 0) - pred_logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred_logits))
    )
    return jnp.mean(per, -1)


@dataclasses.dataclass
class SegmenterTrainer:
    """cls_mode='softmax_void' for Mask2Former-style outputs (void column);
    'sigmoid' for OpenSeeD/MaskDINO-style open-vocab logits (no void —
    unmatched queries train toward all-zero labels).  ``apply_fn``
    overrides the forward (e.g. to close over class embeddings for the
    open-vocab segmenter)."""

    segmenter: Any              # flax module: image -> {cls_logits, masks}
    num_classes: int
    cls_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    void_coef: float = 0.1      # eos coefficient for unmatched queries
    cls_mode: str = "softmax_void"
    apply_fn: Any = None

    def _forward(self, params, image):
        if self.apply_fn is not None:
            return self.apply_fn(params, normalize_image(image))
        return self.segmenter.apply(params, normalize_image(image))

    # ------------------------------------------------------------- cost
    def cost_matrices(self, params, batch: SegTrainBatch) -> jnp.ndarray:
        """[B, Q, M] assignment costs (jitted by the caller)."""

        def one(image, gt_masks, gt_labels, gt_valid):
            out = self._forward(params, image)
            if self.cls_mode == "softmax_void":
                logp = jax.nn.log_softmax(out["cls_logits"], -1)  # [Q, K+1]
            else:
                logp = jax.nn.log_sigmoid(out["cls_logits"])      # [Q, K]
            cost_cls = -jnp.take(logp, gt_labels, axis=1)        # [Q, M]
            pm = out["masks"].reshape(out["masks"].shape[0], -1) # [Q, P]
            gm = gt_masks.reshape(gt_masks.shape[0], -1).astype(jnp.float32)
            cost_mask = jax.vmap(
                lambda q: jax.vmap(lambda g: _mask_bce(q, g))(gm)
            )(pm)                                                # [Q, M]
            cost_dice = jax.vmap(
                lambda q: jax.vmap(lambda g: dice_loss(q, g))(gm)
            )(pm)
            cost = (
                self.cls_weight * cost_cls
                + self.mask_weight * cost_mask
                + self.dice_weight * cost_dice
            )
            return jnp.where(gt_valid[None, :], cost, 1e9)

        return jax.vmap(one)(
            batch.image, batch.gt_masks, batch.gt_labels, batch.gt_valid
        )

    @staticmethod
    def assign(costs: np.ndarray, gt_valid: np.ndarray):
        """Host: exact Hungarian per image → (match_gt [B, Q] i32 with -1
        for unmatched, as the gt index each query owns)."""
        from scipy.optimize import linear_sum_assignment

        B, Q, M = costs.shape
        match = np.full((B, Q), -1, np.int32)
        for b in range(B):
            n = int(gt_valid[b].sum())
            if n == 0:
                continue
            rows, cols = linear_sum_assignment(costs[b][:, :n])
            match[b, rows] = cols
        return match

    # ------------------------------------------------------------- loss
    def loss(self, params, batch: SegTrainBatch, match: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        def one(image, gt_masks, gt_labels, gt_valid, m):
            out = self._forward(params, image)
            Q = out["cls_logits"].shape[0]
            matched = m >= 0
            if self.cls_mode == "softmax_void":
                tgt_cls = jnp.where(
                    matched, jnp.take(gt_labels, jnp.maximum(m, 0)), self.num_classes
                )
                logp = jax.nn.log_softmax(out["cls_logits"], -1)
                nll = -jnp.take_along_axis(logp, tgt_cls[:, None], 1)[:, 0]
                w = jnp.where(matched, 1.0, self.void_coef)
                loss_cls = jnp.sum(nll * w) / jnp.sum(w)
            else:
                # sigmoid multi-label: matched → one-hot(gt), unmatched → 0.
                # The positive entry is 1-of-K and would get ~1/K of the
                # gradient; weight it up (focal-style alpha balance) so the
                # matched class actually crosses the fusion keep threshold.
                K = out["cls_logits"].shape[-1]
                onehot = jax.nn.one_hot(
                    jnp.take(gt_labels, jnp.maximum(m, 0)), K
                ) * matched[:, None]
                lg = out["cls_logits"]
                per = jnp.maximum(lg, 0) - lg * onehot + jnp.log1p(
                    jnp.exp(-jnp.abs(lg))
                )
                elem_w = jnp.where(onehot > 0, float(K) / 2.0, 1.0)
                w = jnp.where(matched, 1.0, self.void_coef)[:, None]
                loss_cls = jnp.sum(per * elem_w * w) / jnp.sum(w) / K * 20.0

            pm = out["masks"].reshape(Q, -1)
            gm = jnp.take(
                gt_masks.reshape(gt_masks.shape[0], -1),
                jnp.maximum(m, 0), axis=0,
            ).astype(jnp.float32)                                # [Q, P]
            mw = matched.astype(jnp.float32)
            loss_mask = jnp.sum(_mask_bce(pm, gm) * mw) / jnp.maximum(mw.sum(), 1.0)
            loss_dice = jnp.sum(dice_loss(pm, gm) * mw) / jnp.maximum(mw.sum(), 1.0)
            return {
                "loss_cls": self.cls_weight * loss_cls,
                "loss_mask": self.mask_weight * loss_mask,
                "loss_dice": self.dice_weight * loss_dice,
            }

        per = jax.vmap(one)(
            batch.image, batch.gt_masks, batch.gt_labels, batch.gt_valid, match
        )
        return jax.tree_util.tree_map(jnp.mean, per)

    # -------------------------------------------------------------- step
    def make_step_fns(self, optimizer):
        """→ (cost_fn jitted, train_step jitted).  The host calls
        cost_fn → assign → train_step each iteration."""

        cost_fn = jax.jit(self.cost_matrices)

        @jax.jit
        def train_step(params, opt_state, batch, match):
            def loss_fn(p):
                d = self.loss(p, batch, match)
                return sum(d.values()), d

            (total, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            d["loss"] = total
            return params, opt_state, d

        return cost_fn, train_step
