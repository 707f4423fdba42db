"""Relation head v2 — five switchable experts + learned MoE gate.

Reference: kings_sgg/models/relation_heads/relation_transformer_head_v2.py
(:184-388).  Each enabled expert produces a dense [B, R, N, N] score map:

  * object_vision_only  — BERT over object tokens, per-relation sub/obj
    projections, einsum (:197-217)  [the config-enabled default]
  * pair_vision_only    — BERT over all N² pair tokens (sub⊕obj concat)
    (:219-242)
  * pair_text2vision    — pair text embeddings cross-attend to object
    vision tokens (:244-270)
  * pair_vision2text    — object vision tokens cross-attend to pair text
    (:271-298)
  * triplet_text_w_vision — triplet text embeddings scored against pair
    vision features per relation (:300-338)

A learned gate (MLP over mean object features → softmax over enabled
experts) mixes them (:340-377).  The 'MoE' here is a mixture over
prediction branches, NOT expert parallelism (SURVEY.md §2.11).

Pair/triplet text embeddings come from the offline KV stores
(openpsg_tpu.data.text_kv) and are passed in as arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.commons.text_encoder import BertStyleConfig, BertStyleEncoder


@dataclasses.dataclass(frozen=True)
class HeadV2Config:
    encoder: BertStyleConfig = BertStyleConfig()
    feature_size: int = 768
    num_relation_classes: int = 56
    cls_qk_size: int = 64
    text_embedding_size: int = 1536      # ada-002 (mask2former_relation_v2.py:58)
    experts: Tuple[str, ...] = ("object_vision_only",)
    use_moe_gate: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test(**kw) -> "HeadV2Config":
        base = dict(
            encoder=BertStyleConfig.tiny_test(),
            feature_size=32, cls_qk_size=8, text_embedding_size=16,
        )
        base.update(kw)
        return HeadV2Config(**base)


class RelationHeadV2(nn.Module):
    cfg: HeadV2Config

    @nn.compact
    def __call__(
        self,
        object_embeds: jnp.ndarray,              # [B, N, D]
        attention_mask: jnp.ndarray,             # [B, N] bool
        pair_text_embeds: Optional[jnp.ndarray] = None,    # [B, N, N, T]
        triplet_text_embeds: Optional[jnp.ndarray] = None, # [B, N, N, R, T] or [B,N,N,T]
    ) -> jnp.ndarray:
        c = self.cfg
        B, N, D0 = object_embeds.shape
        R = c.num_relation_classes
        D = c.feature_size
        x = object_embeds
        if D0 != D:
            x = nn.Dense(D, dtype=c.dtype, name="fc_input")(x)

        expert_maps = []

        if "object_vision_only" in c.experts:
            enc_cfg = dataclasses.replace(c.encoder, hidden_size=D)
            # constant position id 0 (torch.zeros, ref :199-203)
            h = BertStyleEncoder(enc_cfg, name="ovo_encoder")(
                input_embeds=x, attention_mask=attention_mask, position_ids=0
            )
            q = nn.Dense(R * c.cls_qk_size, dtype=c.dtype, name="ovo_sub")(h)
            k = nn.Dense(R * c.cls_qk_size, dtype=c.dtype, name="ovo_obj")(h)
            q = q.reshape(B, N, R, c.cls_qk_size)
            k = k.reshape(B, N, R, c.cls_qk_size)
            expert_maps.append(
                jnp.einsum("bnrc,bmrc->brnm", q, k,
                           preferred_element_type=jnp.float32)
                / (c.cls_qk_size ** 0.5)
            )

        if "pair_vision_only" in c.experts:
            pair = jnp.concatenate(
                [
                    jnp.broadcast_to(x[:, :, None], (B, N, N, D)),
                    jnp.broadcast_to(x[:, None, :], (B, N, N, D)),
                ],
                axis=-1,
            ).reshape(B, N * N, 2 * D)
            pair = nn.Dense(D, dtype=c.dtype, name="pvo_proj")(pair)
            pm = attention_mask[:, :, None] & attention_mask[:, None, :]
            enc_cfg = dataclasses.replace(
                c.encoder, hidden_size=D,
                max_len=max(c.encoder.max_len, N * N),
            )
            h = BertStyleEncoder(enc_cfg, name="pvo_encoder")(
                input_embeds=pair, attention_mask=pm.reshape(B, N * N),
                position_ids=0,
            )
            s = nn.Dense(R, dtype=c.dtype, name="pvo_cls")(h)
            expert_maps.append(
                s.reshape(B, N, N, R).transpose(0, 3, 1, 2).astype(jnp.float32)
            )

        if "pair_text2vision" in c.experts or "pair_vision2text" in c.experts:
            assert pair_text_embeds is not None
            pt = nn.Dense(D, dtype=c.dtype, name="pair_text_proj")(
                pair_text_embeds
            ).reshape(B, N * N, D)
            pm = (attention_mask[:, :, None] & attention_mask[:, None, :]).reshape(B, N * N)
            enc_cfg = dataclasses.replace(
                c.encoder, hidden_size=D, add_cross_attention=True,
                encoder_hidden_size=D,
                max_len=max(c.encoder.max_len, N * N),
            )
            if "pair_text2vision" in c.experts:
                h = BertStyleEncoder(enc_cfg, name="pt2v_encoder")(
                    input_embeds=pt, attention_mask=pm,
                    encoder_hidden=x, encoder_mask=attention_mask,
                    position_ids=0,
                )
                s = nn.Dense(R, dtype=c.dtype, name="pt2v_cls")(h)
                expert_maps.append(
                    s.reshape(B, N, N, R).transpose(0, 3, 1, 2).astype(jnp.float32)
                )
            if "pair_vision2text" in c.experts:
                pairv = jnp.concatenate(
                    [
                        jnp.broadcast_to(x[:, :, None], (B, N, N, D)),
                        jnp.broadcast_to(x[:, None, :], (B, N, N, D)),
                    ],
                    axis=-1,
                ).reshape(B, N * N, 2 * D)
                pairv = nn.Dense(D, dtype=c.dtype, name="pv2t_proj")(pairv)
                h = BertStyleEncoder(enc_cfg, name="pv2t_encoder")(
                    input_embeds=pairv, attention_mask=pm,
                    encoder_hidden=pt, encoder_mask=pm,
                    position_ids=0,
                )
                s = nn.Dense(R, dtype=c.dtype, name="pv2t_cls")(h)
                expert_maps.append(
                    s.reshape(B, N, N, R).transpose(0, 3, 1, 2).astype(jnp.float32)
                )

        if "triplet_text_w_vision" in c.experts:
            assert triplet_text_embeds is not None
            tt = nn.Dense(D, dtype=c.dtype, name="triplet_text_proj")(
                triplet_text_embeds
            )
            pairv = x[:, :, None, :] * x[:, None, :, :]            # [B,N,N,D]
            if tt.ndim == 5:  # per-relation triplet text [B,N,N,R,D]
                s = jnp.einsum("bnmd,bnmrd->brnm", pairv, tt,
                               preferred_element_type=jnp.float32)
            else:             # shared pair text [B,N,N,D]
                gate = nn.Dense(R, dtype=c.dtype, name="ttwv_cls")(
                    pairv * tt
                )
                s = gate.transpose(0, 3, 1, 2)
            expert_maps.append(s.astype(jnp.float32) / (D ** 0.5))

        assert expert_maps, "no experts enabled"
        if len(expert_maps) == 1 or not c.use_moe_gate:
            return sum(expert_maps) / len(expert_maps)

        pooled = jnp.sum(
            x * attention_mask[..., None].astype(x.dtype), axis=1
        ) / jnp.maximum(
            jnp.sum(attention_mask, axis=1)[:, None].astype(x.dtype), 1.0
        )
        gate = nn.Dense(len(expert_maps), dtype=c.dtype, name="moe_gate")(
            nn.relu(nn.Dense(D, dtype=c.dtype, name="moe_fc")(pooled))
        )
        gate = jax.nn.softmax(gate.astype(jnp.float32), axis=-1)    # [B, E]
        stacked = jnp.stack(expert_maps, axis=1)                    # [B, E, R, N, N]
        return jnp.einsum("be,bernm->brnm", gate, stacked)
