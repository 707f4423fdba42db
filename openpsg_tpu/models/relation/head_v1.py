"""Relation head v1 — transformer encoder + per-relation bilinear scores.

Reference: kings_sgg/models/relation_heads/relation_transformer_head.py.
Pipeline (ref line refs): optional input projection (:151-155), a
BERT-or-CLIP tower over ≤N object tokens (:156-175), output projection
(:176-177), then either

  * per-relation Q/K projections → bilinear [B, R, N, N] scores via
    'attention' (scaled q·kᵀ) or 'einsum' mode (:179-191), or
  * the predicate-prompt path: predicate-text embeddings (optionally with
    learnable prompts) fused with object tokens by the
    InteractiveFusionModule (:193-205).

Loss modes v0_softmax / v0_sigmoid / v1 / v1_no_bs_limit with the -9999
pad masking and recall@20 logging (:207-270) live in ``loss``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.commons.interactive_fusion import InteractiveFusionModule
from openpsg_tpu.models.commons.text_encoder import (
    BertStyleConfig,
    BertStyleEncoder,
    DenseLN,
)
from openpsg_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class HeadV1Config:
    encoder: BertStyleConfig = BertStyleConfig()
    input_feature_size: int = 256
    output_feature_size: int = 768
    num_relation_classes: int = 56
    cls_qk_size: int = 64
    pred_type: str = "attention"          # attention | einsum
    use_relation_prompts: bool = False    # predicate-text fusion path
    fusion_pred_type: str = "einsum"
    graph_transformer_type: Optional[str] = None  # ref :9 (None | 'base')
    use_learnable_prompts: bool = False   # per-relation prompt rows (ref :117)
    learnable_prompts_size: int = 16      # ref :29
    semantic_type: str = "relation_classes"  # description vocabulary (§2.1)
    loss_type: str = "v1"
    loss_weight: float = 50.0
    loss_alpha: float = 1.0
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test(**kw) -> "HeadV1Config":
        base = dict(
            encoder=BertStyleConfig.tiny_test(),
            input_feature_size=16, output_feature_size=32, cls_qk_size=8,
        )
        base.update(kw)
        return HeadV1Config(**base)


class RelationHeadV1(nn.Module):
    cfg: HeadV1Config

    @nn.compact
    def __call__(
        self,
        object_embeds: jnp.ndarray,          # [B, N, C_in] mask-pooled tokens
        attention_mask: jnp.ndarray,         # [B, N] bool
        semantic_embeds: Optional[jnp.ndarray] = None,  # [R, D] predicate text
        semantic_token_ids: Optional[jnp.ndarray] = None,   # [R, L] int32
        semantic_token_mask: Optional[jnp.ndarray] = None,  # [R, L] bool
    ) -> jnp.ndarray:                        # [B, R, N, N] scores
        c = self.cfg
        x = object_embeds
        if x.shape[-1] != c.output_feature_size:
            # fc_input = Linear+LN (ref :83-94), applied only on size
            # mismatch (ref :153-156)
            x = DenseLN(c.output_feature_size, dtype=c.dtype, name="fc_input")(x)

        enc_cfg = dataclasses.replace(c.encoder, hidden_size=c.output_feature_size)
        # object tokens get CONSTANT position id 1 (torch.ones, ref :159-163)
        x = BertStyleEncoder(enc_cfg, name="encoder")(
            input_embeds=x, attention_mask=attention_mask, position_ids=1
        )
        x = DenseLN(c.output_feature_size, dtype=c.dtype, name="fc_output")(x)

        B, N, _ = x.shape
        R = c.num_relation_classes
        if not c.use_relation_prompts:
            q = nn.Dense(R * c.cls_qk_size, dtype=c.dtype, name="cls_q")(x)
            k = nn.Dense(R * c.cls_qk_size, dtype=c.dtype, name="cls_k")(x)
            q = q.reshape(B, N, R, c.cls_qk_size).transpose(0, 2, 1, 3)
            k = k.reshape(B, N, R, c.cls_qk_size).transpose(0, 2, 1, 3)
            if c.pred_type == "attention":
                scores = jnp.einsum(
                    "brnc,brmc->brnm", q, k, preferred_element_type=jnp.float32
                ) / (c.cls_qk_size ** 0.5)
            elif c.pred_type == "einsum":
                scores = jnp.einsum(
                    "brnc,brmc->brnm", q, k, preferred_element_type=jnp.float32
                )
            else:
                raise ValueError(c.pred_type)
            return scores

        if semantic_embeds is None:
            # in-head semantic encoder: predicate descriptions → pooled
            # text embeddings, trained end-to-end with the head (the
            # reference encodes self.relation_prompts through its text
            # tower each forward, relation_transformer_head.py:193-205)
            assert semantic_token_ids is not None, (
                "prompt path needs semantic_embeds or semantic_token_ids"
            )
            sem_cfg = dataclasses.replace(
                c.encoder, hidden_size=c.output_feature_size
            )
            prompts = None
            if c.use_learnable_prompts:
                # PER-RELATION prompt rows [R, P, D] spliced after the
                # embeddings (ref :117-122 + bert_with_learnable_embeds)
                prompts = self.param(
                    "learnable_prompts_embedding",
                    nn.initializers.normal(0.02),
                    (R, c.learnable_prompts_size, c.output_feature_size),
                )
            semantic_embeds = BertStyleEncoder(sem_cfg, name="sem_encoder")(
                token_ids=semantic_token_ids,
                attention_mask=semantic_token_mask,
                pool=True,                       # BERT pooler (ref :60-69)
                learnable_embeds=prompts,
            )
        # the reference feeds the UNBATCHED [R, De] semantic table straight
        # into the fusion module (no extra projection — cls_r/fc_edge
        # project from the raw semantic width, ref :137-139)
        return InteractiveFusionModule(
            pred_type=c.fusion_pred_type, output_size=c.cls_qk_size,
            use_graph_transformer=c.graph_transformer_type is not None,
            dtype=c.dtype, name="fusion",
        )(x, semantic_embeds)

    # ------------------------------------------------------------------ loss
    def loss(
        self,
        pred: jnp.ndarray,     # [B, R, N, N]
        target: jnp.ndarray,   # [B, R, N, N]
        valid: jnp.ndarray,    # [B, N] bool object validity
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        B, R, N, _ = pred.shape
        pair = valid[:, None, :, None] & valid[:, None, None, :]
        mask = jnp.broadcast_to(pair, pred.shape).astype(pred.dtype)
        pred = pred * mask + L.NEG_INF * (1.0 - mask)

        if c.loss_type == "v0_sigmoid":
            per = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
                jnp.exp(-jnp.abs(pred))
            )
            loss = jnp.mean(per)
        elif c.loss_type == "v0_softmax":
            # 57-way CE with background class along the relation axis
            labels = jnp.argmax(target, axis=1)            # [B, N, N]
            has = jnp.any(target > 0, axis=1)
            labels = jnp.where(has, labels, R)             # background idx R
            logits = jnp.concatenate(
                [pred, jnp.zeros((B, 1, N, N), pred.dtype)], axis=1
            ).transpose(0, 2, 3, 1)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
            w = jnp.broadcast_to(pair[:, 0], nll.shape).astype(nll.dtype)
            loss = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
        elif c.loss_type in ("v1", "v1_no_bs_limit"):
            flat_p = pred.transpose(1, 0, 2, 3).reshape(R, -1)
            flat_t = target.transpose(1, 0, 2, 3).reshape(R, -1)
            per = L.multilabel_categorical_crossentropy(flat_t, flat_p)
            w = (per / (jnp.max(per) + 1e-12)) ** c.loss_alpha
            loss = jnp.mean(per * w)
        else:
            raise ValueError(c.loss_type)

        out = {"loss_relation": loss * c.loss_weight}
        if c.loss_type != "v0_softmax":
            out["relation.recall@20"] = L.recall_at_k(pred, target, k=20)
        return out
