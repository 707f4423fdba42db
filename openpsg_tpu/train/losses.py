"""Loss functions for relation training (all heads).

Reference semantics (re-implemented per head in the reference; single
canonical module here — SURVEY.md §2.3 'loss functions shared across
heads'):

  * ``multilabel_categorical_crossentropy`` — su jianlin's circular-softmax
    multi-label loss (kexue.fm/archives/7359), used by v1/v2/v3 heads and
    the v4 multiclass existence filter
    (relation_transformer_head_v4.py:484-495);
  * loss-max reweighting ``(loss/loss.max())**alpha``
    (relation_transformer_head.py:230-246, v4 :478-479);
  * binary BCE-with-logits for the pair-existence filter (v4 :472-474);
  * LLM CE with ``-100`` label masking + shift-by-one teacher forcing
    (v4 :332-341);
  * ``recall_at_k`` in-training metric (relation_transformer_head.py:317-367).

All are static-shape; invalid entries are excluded via weight masks rather
than dynamic slicing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -9999.0  # the reference's masking constant


def multilabel_categorical_crossentropy(
    y_true: jnp.ndarray, y_pred: jnp.ndarray
) -> jnp.ndarray:
    """[..., C] {0,1} targets, [..., C] logits → [...] loss."""
    y_pred = (1.0 - 2.0 * y_true) * y_pred
    pred_neg = y_pred - y_true * -NEG_INF          # positives pushed to -inf
    pred_pos = y_pred - (1.0 - y_true) * -NEG_INF  # negatives pushed to -inf
    zeros = jnp.zeros_like(y_pred[..., :1])
    neg = jax.nn.logsumexp(jnp.concatenate([pred_neg, zeros], -1), axis=-1)
    pos = jax.nn.logsumexp(jnp.concatenate([pred_pos, zeros], -1), axis=-1)
    return neg + pos


def reweighted_mcce(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, alpha: float = 1.0,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MCCE with the reference's self-normalized reweighting
    ``loss * (loss / loss.max())**alpha`` then mean."""
    loss = multilabel_categorical_crossentropy(y_true, y_pred)
    if sample_weight is not None:
        loss = loss * sample_weight
    w = (loss / (jnp.max(loss) + 1e-12)) ** alpha
    loss = loss * w
    if sample_weight is not None:
        return jnp.sum(loss) / jnp.maximum(jnp.sum(sample_weight), 1.0)
    return jnp.mean(loss)


def binary_existence_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, weight: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Mean BCE-with-logits over (optionally masked) pairs."""
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if weight is None:
        return jnp.mean(per)
    return jnp.sum(per * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def llm_teacher_forcing_loss(
    logits: jnp.ndarray,      # [B, L, V] over the label region
    label_ids: jnp.ndarray,   # [B, L]
    label_mask: jnp.ndarray,  # [B, L] bool (False == reference's -100)
) -> jnp.ndarray:
    """Shift-by-one CE: logits[t] predicts label[t+1]; masked mean."""
    shift_logits = logits[:, :-1]
    shift_labels = label_ids[:, 1:]
    shift_mask = label_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * shift_mask) / jnp.maximum(jnp.sum(shift_mask), 1.0)


def recall_at_k(
    pred: jnp.ndarray,    # [B, R, N, N] scores
    target: jnp.ndarray,  # [B, R, N, N] {0,1}
    k: int = 20,
) -> jnp.ndarray:
    """In-training recall@k over flattened (rel, sub, obj) triplets —
    fraction of the top-k GT triplets recovered in the top-k predictions
    (relation_transformer_head.py:317-367), vectorized (no python loops)."""
    B = pred.shape[0]
    flat_p = pred.reshape(B, -1)
    flat_t = target.reshape(B, -1)
    _, p_idx = jax.lax.top_k(flat_p, k)
    t_val, t_idx = jax.lax.top_k(flat_t, k)
    t_valid = t_val > 0
    hit = (p_idx[:, :, None] == t_idx[:, None, :]) & t_valid[:, None, :]
    n_hit = jnp.sum(jnp.any(hit, axis=1), axis=-1)
    n_true = jnp.sum(t_valid, axis=-1)
    return jnp.mean(n_hit / (n_true + 1e-8)) * 100.0
