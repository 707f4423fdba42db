"""Relation head v3 — truncated LLaMA as relation encoder (closed + open vocab).

Reference: kings_sgg/models/relation_heads/relation_transformer_head_v3.py.

Closed-vocab path (:104-119, 180-193): ``fc_object_vision_only_input``
(Linear+LayerNorm) projects object tokens input→llm dim, the first
``shave_language_decoder_at`` LLaMA layers run (optionally NON-causal —
``causal_mask`` is True in baseline_v3_r50.py:143, False in
baseline_v3_ov.py:64), ``fc_object_vision_only_output`` projects llm→
output dim, and two per-relation Dense maps produce D-dim sub/obj
embeddings combined by a plain (unscaled) ``einsum('nrsc,nroc->nrso')``.

Open-vocab path (:116-159, 194-262): object tokens are projected into a
768-d "former" space (``fc_object_in_former`` + an optional raw
BertEncoder stack ``o_in_former`` — 0 layers in the published config,
baseline_v3_ov.py:68-70), lifted to llm dim, and concatenated with the
embedded predicate-name token sequence ("<|relation|> rel₁ <|relation|>
rel₂ …", embedded through the LLM's own ``tok_embeddings``).  LLaMA runs
over the joint sequence; the object half flows llm→former
(``o_out_former``)→output, the relation half is mean-pooled per
predicate span (separator-to-next-separator, :225-233), flows
llm→former (``r_out_former``)→``fc_relation_out_former`` whose output
splits into a per-predicate dynamic classifier weight [P] + bias [1]
(:240-242).  ``fc_sub_pred``/``fc_obj_pred`` produce pair features
(concat: [sub;obj], 'multiply': sub⊙obj) scored by that classifier
(:244-262) — predicates are text, so new predicates need no retraining.

Documented deviations from the reference source:
  * :229-233 pools ``object_embedding`` (a 512-d tensor indexed with
    relation-token indices) into a 4096-d buffer — a shape-incompatible
    typo for ``relation_embedding`` that cannot execute as written; we
    implement the evident intent (pool the LLM's relation-segment
    output).
  * :239 indexes batch row 0 (``...[0]``) — the reference asserts
    batch_size==1 elsewhere; we keep the batch dimension.
  * the reference's dynamic shapes pass no attention masks into the LLM
    or formers; our static padded layout masks pad keys — identical on
    valid entries (padding invariance is golden-tested).

TPU notes: the predicate span pooling is a precomputed [R, L_rel]
span-membership matrix → one matmul; the joint sequence is static
length; the per-relation bilinear is one einsum on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openpsg_tpu.models.commons.text_encoder import (
    BertStyleConfig,
    BertStyleEncoder,
    DenseLN,
)
from openpsg_tpu.models.llm.llama import (
    Llama,
    LlamaConfig,
    LlamaWithEmbeddings,
)
from openpsg_tpu.models.relation.tokenizer import WordTokenizer


@dataclasses.dataclass(frozen=True)
class HeadV3Config:
    llm: LlamaConfig = LlamaConfig(n_layers=6, causal=True)  # shave@6
    input_feature_size: int = 256       # ref :45
    former_feature_size: int = 768      # ref :46
    output_feature_size: int = 512      # ref :48
    num_relation_classes: int = 56
    ov_relation: bool = False
    sub_obj_merge_type: str = "concat"  # 'concat' | 'multiply' (ref :78)
    num_object_in_layers: int = 0       # baseline_v3_ov.py:68-70
    num_object_out_layers: int = 0
    num_relation_out_layers: int = 0
    former_heads: int = 12              # BertConfig() defaults (ref :116-121)
    former_intermediate: int = 3072
    dtype: Any = jnp.float32

    @property
    def object_feature_size(self) -> int:  # legacy alias
        return self.input_feature_size

    def former_cfg(self, num_layers: int) -> BertStyleConfig:
        return BertStyleConfig(
            hidden_size=self.former_feature_size,
            num_layers=num_layers,
            num_heads=self.former_heads,
            intermediate=self.former_intermediate,
            bare=True,
            dtype=self.dtype,
        )

    @property
    def relation_output_size(self) -> int:  # ref :140-146
        per_pair = (
            2 * self.output_feature_size
            if self.sub_obj_merge_type == "concat"
            else self.output_feature_size
        )
        return per_pair + 1

    @staticmethod
    def tiny_test(**kw) -> "HeadV3Config":
        base = dict(
            llm=LlamaConfig.tiny_test(vocab_size=512).truncate(2),
            input_feature_size=16, former_feature_size=32,
            output_feature_size=16, former_heads=2, former_intermediate=64,
        )
        base.update(kw)
        return HeadV3Config(**base)


def build_relation_token_layout(
    tokenizer: WordTokenizer,
    relation_names: List[str],
    sep_id: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (token_ids [L_rel], span_matrix [R, L_rel]) for the joined
    predicate-name sequence.  The reference builds
    "<|relation|> rel₁ <|relation|> rel₂ …" and pools each predicate
    from its '<|relation|>' separator up to the next one (:94-97,
    225-233) — so a span INCLUDES its leading separator token.  Span
    rows are normalized for mean pooling."""
    sep = tokenizer.eos_id if sep_id is None else sep_id
    ids: List[int] = []
    starts: List[int] = []
    for name in relation_names:
        starts.append(len(ids))
        ids.append(sep)
        ids.extend(tokenizer.encode(name))
    L = len(ids)
    span = np.zeros((len(relation_names), L), np.float32)
    bounds = starts + [L]
    for r in range(len(relation_names)):
        a, b = bounds[r], bounds[r + 1]
        span[r, a:b] = 1.0 / (b - a)
    return np.asarray(ids, np.int32), span


class RelationHeadV3(nn.Module):
    cfg: HeadV3Config

    @nn.compact
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
        dt = c.dtype

        if not c.ov_relation:
            # closed-vocab (ref :180-193): project → LLaMA trunk → project
            # → per-relation D-dim bilinear, plain einsum (no 1/√d).
            x = DenseLN(c.llm.dim, dtype=dt, name="fc_input")(object_embeds)
            pos = jnp.broadcast_to(
                jnp.arange(N, dtype=jnp.int32)[None], (B, N)
            )
            hidden, _ = Llama(c.llm, name="llama")(
                input_embeds=x, attention_mask=attention_mask,
                positions=pos, return_hidden=True,
            )
            h = DenseLN(c.output_feature_size, dtype=dt, name="fc_output")(
                hidden
            )
            D = c.output_feature_size
            q = nn.Dense(R * D, dtype=dt, name="ovo_sub")(h)
            k = nn.Dense(R * D, dtype=dt, name="ovo_obj")(h)
            q = q.reshape(B, N, R, D).transpose(0, 2, 1, 3)
            k = k.reshape(B, N, R, D).transpose(0, 2, 1, 3)
            return jnp.einsum(
                "brnc,brmc->brnm", q, k, preferred_element_type=jnp.float32
            )

        # ------------------------------------------------------ open vocab
        assert relation_token_ids is not None and relation_spans is not None
        L = relation_token_ids.shape[0]

        x = DenseLN(c.former_feature_size, dtype=dt, name="fc_in_former")(
            object_embeds
        )
        if c.num_object_in_layers > 0:
            x = BertStyleEncoder(
                c.former_cfg(c.num_object_in_layers), name="o_in_former"
            )(input_embeds=x, attention_mask=attention_mask)
        x = DenseLN(c.llm.dim, dtype=dt, name="fc_former_to_llm")(x)

        llama = LlamaWithEmbeddings(c.llm, name="llama")
        rel_emb = llama.embed(relation_token_ids)[None]          # [1, L, D]
        rel_emb = jnp.broadcast_to(rel_emb, (B, L, c.llm.dim)).astype(dt)
        joint = jnp.concatenate([x.astype(dt), rel_emb], axis=1)
        mask = jnp.concatenate(
            [attention_mask, jnp.ones((B, L), bool)], axis=1
        )
        # RoPE positions: the reference runs COMPACT shapes, so its
        # relation tokens sit at positions n_valid..n_valid+L-1.  Objects
        # are prefix-packed in our padded layout; restart the relation
        # segment at the VALID count so padded ≡ compact (else every
        # relation token's rotary phase would shift by the pad amount).
        n_valid = jnp.sum(attention_mask, axis=-1, dtype=jnp.int32)  # [B]
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N)),
                n_valid[:, None] + jnp.arange(L, dtype=jnp.int32)[None],
            ],
            axis=1,
        )
        hidden, _ = llama(
            input_embeds=joint, attention_mask=mask, positions=pos,
            return_hidden=True,
        )

        obj_h = DenseLN(
            c.former_feature_size, dtype=dt, name="fc_llm_to_former"
        )(hidden[:, :N])
        if c.num_object_out_layers > 0:
            obj_h = BertStyleEncoder(
                c.former_cfg(c.num_object_out_layers), name="o_out_former"
            )(input_embeds=obj_h, attention_mask=attention_mask)
        obj_h = DenseLN(
            c.output_feature_size, dtype=dt, name="fc_out_former"
        )(obj_h)

        # per-predicate span mean over the LLM's relation-segment output
        # (the reference's evident intent at :225-233 — see module
        # docstring for the as-written typo)
        rel_h = jnp.einsum(
            "rl,bld->brd", relation_spans.astype(jnp.float32),
            hidden[:, N:].astype(jnp.float32),
        )                                                        # [B, R, D]
        rel_h = DenseLN(
            c.former_feature_size, dtype=dt, name="fc_rel_llm_to_former"
        )(rel_h.astype(dt))
        if c.num_relation_out_layers > 0:
            rel_h = BertStyleEncoder(
                c.former_cfg(c.num_relation_out_layers), name="r_out_former"
            )(input_embeds=rel_h)
        rel_h = DenseLN(
            c.relation_output_size, dtype=dt, name="fc_rel_out_former"
        )(rel_h)
        w = rel_h[..., :-1]                                      # [B, R, P]
        b = rel_h[..., -1]                                       # [B, R]

        sub = nn.Dense(
            c.output_feature_size, dtype=dt, name="fc_sub_pred"
        )(obj_h)
        obj = nn.Dense(
            c.output_feature_size, dtype=dt, name="fc_obj_pred"
        )(obj_h)
        if c.sub_obj_merge_type == "concat":
            # ref :247-256: repeat_interleave(sub) ⊗ tile(obj) — pair
            # (i, j) = [sub_i ; obj_j]
            pair = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        sub[:, :, None], (B, N, N, sub.shape[-1])
                    ),
                    jnp.broadcast_to(
                        obj[:, None, :], (B, N, N, obj.shape[-1])
                    ),
                ],
                axis=-1,
            )
        elif c.sub_obj_merge_type == "multiply":                 # ref :257-261
            pair = sub[:, :, None, :] * obj[:, None, :, :]
        else:
            raise ValueError(
                f"sub_obj_merge_type must be concat|multiply, "
                f"got {c.sub_obj_merge_type!r}"
            )
        scores = jnp.einsum(
            "bnmp,brp->brnm", pair.astype(jnp.float32), w.astype(jnp.float32)
        ) + b.astype(jnp.float32)[:, :, None, None]
        return scores
