"""Relation head v3 — truncated LLaMA as relation encoder (closed + open vocab).

Reference: kings_sgg/models/relation_heads/relation_transformer_head_v3.py.

Closed-vocab path (:167-220): project object tokens 256→llm_dim, run the
first ``shave_language_decoder_at`` LLaMA layers (optionally NON-causal,
configs/psg/baseline_v3_ov.py:64), project back, per-relation bilinear
Q/K scores — i.e. head v1 with the LLaMA trunk as encoder.

Open-vocab path (:94-97, 224-262): the object tokens are concatenated
with the embedded predicate-name token sequence
("<rel₁> <rel₂> … <rel₅₆>" with separators); LLaMA runs over the joint
sequence; each predicate's token span is mean-pooled back into one
embedding; those 56 embeddings act as a *dynamic classifier* (weights +
bias via a linear map) over pair features — predicates are text, so new
predicates need no retraining.

TPU notes: the predicate span pooling is a precomputed [R, L_rel]
span-membership matrix → one matmul; the joint sequence is static length.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openpsg_tpu.models.llm.llama import Llama, LlamaConfig
from openpsg_tpu.models.relation.tokenizer import WordTokenizer


@dataclasses.dataclass(frozen=True)
class HeadV3Config:
    llm: LlamaConfig = LlamaConfig(n_layers=6, causal=True)  # shave@6
    object_feature_size: int = 256
    num_relation_classes: int = 56
    cls_qk_size: int = 64
    ov_relation: bool = False
    sub_obj_merge_type: str = "concat"   # baseline_v3_ov.py:66
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test(**kw) -> "HeadV3Config":
        base = dict(
            llm=LlamaConfig.tiny_test(vocab_size=512).truncate(2),
            object_feature_size=16, cls_qk_size=8,
        )
        base.update(kw)
        return HeadV3Config(**base)


def build_relation_token_layout(
    tokenizer: WordTokenizer, relation_names: List[str]
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (token_ids [L_rel], span_matrix [R, L_rel]) for the joined
    predicate-name sequence (reference builds "<|relation|> over
    <|relation|> in front of ..." and records per-predicate spans,
    :94-97, 224-239).  Span matrix rows are normalized for mean pooling."""
    ids: List[int] = []
    spans = []
    for name in relation_names:
        toks = tokenizer.encode(name)
        spans.append((len(ids), len(ids) + len(toks)))
        ids.extend(toks)
        ids.append(tokenizer.eos_id)   # separator token
    L = len(ids)
    span = np.zeros((len(relation_names), L), np.float32)
    for r, (a, b) in enumerate(spans):
        span[r, a:b] = 1.0 / (b - a)
    return np.asarray(ids, np.int32), span


class RelationHeadV3(nn.Module):
    cfg: HeadV3Config

    def setup(self):
        c = self.cfg
        self.fc_input = nn.Dense(c.llm.dim, dtype=c.dtype, name="fc_input")
        self.llama = Llama(c.llm, name="llama")
        self.rel_tok_embed = nn.Embed(
            c.llm.vocab_size, c.llm.dim, dtype=c.dtype, name="rel_tok_embed"
        )
        self.fc_output = nn.Dense(
            c.object_feature_size, dtype=c.dtype, name="fc_output"
        )
        if not c.ov_relation:
            self.cls_q = nn.Dense(
                c.num_relation_classes * c.cls_qk_size, dtype=c.dtype, name="cls_q"
            )
            self.cls_k = nn.Dense(
                c.num_relation_classes * c.cls_qk_size, dtype=c.dtype, name="cls_k"
            )
        else:
            # dynamic classifier: predicate embedding -> (weight, bias)
            pair_dim = (
                2 * c.object_feature_size
                if c.sub_obj_merge_type == "concat"
                else c.object_feature_size
            )
            self.dyn_weight = nn.Dense(
                pair_dim, dtype=c.dtype, name="dyn_weight"
            )
            self.dyn_bias = nn.Dense(1, dtype=c.dtype, name="dyn_bias")

    def __call__(
        self,
        object_embeds: jnp.ndarray,      # [B, N, C]
        attention_mask: jnp.ndarray,     # [B, N] bool
        relation_token_ids: Optional[jnp.ndarray] = None,  # [L_rel] (OV)
        relation_spans: Optional[jnp.ndarray] = None,      # [R, L_rel] (OV)
    ) -> jnp.ndarray:                    # [B, R, N, N]
        c = self.cfg
        B, N, _ = object_embeds.shape
        R = c.num_relation_classes
        x = self.fc_input(object_embeds)

        if c.ov_relation:
            assert relation_token_ids is not None and relation_spans is not None
            L = relation_token_ids.shape[0]
            rel_emb = self.rel_tok_embed(relation_token_ids)[None]      # [1, L, D]
            rel_emb = jnp.broadcast_to(rel_emb, (B, L, c.llm.dim))
            joint = jnp.concatenate([x, rel_emb], axis=1)               # [B, N+L, D]
            mask = jnp.concatenate(
                [attention_mask, jnp.ones((B, L), bool)], axis=1
            )
            pos = jnp.broadcast_to(
                jnp.arange(N + L, dtype=jnp.int32)[None], (B, N + L)
            )
            hidden, _ = self.llama(
                input_embeds=joint, attention_mask=mask, positions=pos,
                return_hidden=True,
            )
            obj_h = self.fc_output(hidden[:, :N])                       # [B, N, C]
            rel_h = jnp.einsum(
                "rl,bld->brd", relation_spans.astype(jnp.float32),
                hidden[:, N:].astype(jnp.float32),
            )                                                           # [B, R, D]
            # dynamic per-predicate linear classifier over pair features
            if c.sub_obj_merge_type == "concat":
                pair = jnp.concatenate(
                    [
                        jnp.broadcast_to(obj_h[:, :, None], (B, N, N, obj_h.shape[-1])),
                        jnp.broadcast_to(obj_h[:, None, :], (B, N, N, obj_h.shape[-1])),
                    ],
                    axis=-1,
                )
            else:  # 'add'
                pair = obj_h[:, :, None, :] + obj_h[:, None, :, :]
            w = self.dyn_weight(rel_h.astype(c.dtype))                  # [B, R, P]
            b = self.dyn_bias(rel_h.astype(c.dtype))[..., 0]            # [B, R]
            scores = jnp.einsum(
                "bnmp,brp->brnm", pair.astype(jnp.float32), w.astype(jnp.float32)
            ) + b[:, :, None, None].astype(jnp.float32)
            return scores

        pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        hidden, _ = self.llama(
            input_embeds=x, attention_mask=attention_mask, positions=pos,
            return_hidden=True,
        )
        h = self.fc_output(hidden)
        q = self.cls_q(h).reshape(B, N, R, c.cls_qk_size).transpose(0, 2, 1, 3)
        k = self.cls_k(h).reshape(B, N, R, c.cls_qk_size).transpose(0, 2, 1, 3)
        return jnp.einsum(
            "brnc,brmc->brnm", q, k, preferred_element_type=jnp.float32
        ) / (c.cls_qk_size ** 0.5)
