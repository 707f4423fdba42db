"""Relation head v2 — five switchable experts + learned MoE gate.

Reference: kings_sgg/models/relation_heads/relation_transformer_head_v2.py.
Each enabled expert produces a dense [B, R, N, N] score map:

  * object_vision_only  — DenseLN in → BERT over object tokens → DenseLN
    out → per-relation sub/obj projections of width D, plain einsum with
    NO 1/√d scale (:197-216)  [the config-enabled default]
  * pair_vision_only    — all N² pair tokens (raw sub⊕obj concat) through
    the SHARED pair encoder, self-attention only (:219-242)
  * pair_text2vision    — pair TEXT embeddings cross-attend to pair VISION
    tokens (:244-270; reference name use_pair_text_vision_cross)
  * pair_vision2text    — pair vision tokens cross-attend to pair text
    (:271-298; reference name use_pair_vision_text_cross)
  * triplet_text_w_vision — pair vision tokens cross-attend to PER-RELATION
    triplet text; per-relation Linear(D,1) heads (:300-338; reference name
    use_triplet_vision_text_cross).  The reference loops the encoder R
    times in Python; here the relation axis folds into the batch so the
    whole expert is ONE batched encoder call (TPU: one big MXU program
    instead of 56 small ones).

Structural fidelity points (all checkpoint-relevant):
  * every fc_* is Linear→LayerNorm (DenseLN), applied per expert on the
    RAW inputs — there is no shared input projection (:82-141);
  * experts 2-5 share ONE cross-attention-capable BERT
    (sub_obj_pair_level_model, :77-79); expert 1 has its own plain BERT
    (object_level_model, :70-76);
  * all encoder calls use constant position id 0 (torch.zeros, :199-303);
  * the reference runs DYNAMIC shapes (object_num varies per image) so it
    omits masks where every token is valid (ovo encoder, experts 3/4's
    cross keys); our static padded layout passes validity masks in those
    spots — the computation on VALID entries is identical (padding
    invariance is golden-tested against the unpadded torch mirror);
  * an expert's output DenseLN runs before its classifier head;
  * MoE (:340-377): per-PAIR-TOKEN gate — DenseLN(pair vision) +
    DenseLN(pair text) + DenseLN(mean-over-R triplet text) → [DenseLN →
    ReLU]×2 → Linear; weight type 'v1' softmaxes over experts per pair,
    'v2' per (relation, pair).

The head returns a dict of per-expert maps (+ 'moe'); the reference's
detector computes one loss per entry at train time and takes the LAST
enabled entry (moe wins) at inference (mask2former_relation_v2.py:639-668,
783-800) — mirrored by :func:`RelationHeadV2.primary`.

Pair/triplet text embeddings come from the offline KV stores
(openpsg_tpu.data.text_kv) and are passed in as dense arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.commons.text_encoder import (
    BertStyleConfig,
    BertStyleEncoder,
    DenseLN,
)

# reference cascade order (mask2former_relation_v2.py:789-800): later
# entries overwrite earlier ones at inference; moe always wins.
EXPERT_ORDER = (
    "object_vision_only",
    "pair_vision_only",
    "pair_text2vision",
    "pair_vision2text",
    "triplet_text_w_vision",
)


@dataclasses.dataclass(frozen=True)
class HeadV2Config:
    encoder: BertStyleConfig = BertStyleConfig()
    feature_size: int = 768              # output_feature_size (baseline_v2_r50.py:144)
    num_relation_classes: int = 56
    text_embedding_size: int = 1536      # ada-002 (mask2former_relation_v2.py:58)
    experts: Tuple[str, ...] = ("object_vision_only",)
    use_moe_gate: bool = False
    moe_weight_type: str = "v1"          # v1 (per-pair) | v2 (per-pair-per-relation)
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test(**kw) -> "HeadV2Config":
        base = dict(
            encoder=BertStyleConfig.tiny_test(),
            feature_size=32, text_embedding_size=16,
        )
        base.update(kw)
        return HeadV2Config(**base)


class RelationHeadV2(nn.Module):
    cfg: HeadV2Config

    @nn.compact
    def __call__(
        self,
        object_embeds: jnp.ndarray,              # [B, N, D0] raw pooled tokens
        attention_mask: jnp.ndarray,             # [B, N] bool
        pair_text_embeds: Optional[jnp.ndarray] = None,    # [B, N, N, T]
        triplet_text_embeds: Optional[jnp.ndarray] = None, # [B,N,N,R,T] or [B,N,N,T]
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        B, N, D0 = object_embeds.shape
        R = c.num_relation_classes
        D = c.feature_size
        dt = c.dtype
        out: Dict[str, jnp.ndarray] = {}

        pair_expert_names = set(EXPERT_ORDER[1:])
        enabled_pair = pair_expert_names & set(c.experts)
        pm2 = attention_mask[:, :, None] & attention_mask[:, None, :]
        pm = pm2.reshape(B, N * N)

        pair_raw = None
        if enabled_pair or c.use_moe_gate:
            # sub_obj_pair_embedding: sub-major concat of RAW object tokens
            # (the reference detector builds it host-side,
            # mask2former_relation_v2.py:279-301)
            pair_raw = jnp.concatenate(
                [
                    jnp.broadcast_to(object_embeds[:, :, None], (B, N, N, D0)),
                    jnp.broadcast_to(object_embeds[:, None, :], (B, N, N, D0)),
                ],
                axis=-1,
            ).reshape(B, N * N, 2 * D0)

        pair_encoder = None
        if enabled_pair:
            # BertWrapper(add_cross_attention=True) sets config.is_decoder,
            # and HF decoder-mode BERT applies a CAUSAL self-attention mask
            # (get_extended_attention_mask) — so the reference's pair tower
            # really is causal over sub-major pair order (verified against
            # transformers; golden-tested).  Padding preserves pair order,
            # so causal-over-padded ≡ causal-over-compact on valid pairs.
            pair_encoder = BertStyleEncoder(
                dataclasses.replace(
                    c.encoder, hidden_size=D, add_cross_attention=True,
                    encoder_hidden_size=D, causal=True,
                    max_len=max(c.encoder.max_len, N * N),
                ),
                name="pair_encoder",
            )

        def pair_scores(h, cls_name):  # [B, N², R] sub-major → [B, R, N, N]
            s = nn.Dense(R, dtype=dt, name=cls_name)(h)
            return s.reshape(B, N, N, R).transpose(0, 3, 1, 2).astype(jnp.float32)

        if "object_vision_only" in c.experts:
            x = DenseLN(D, dtype=dt, name="fc_ovo_input")(object_embeds)
            x = BertStyleEncoder(
                dataclasses.replace(c.encoder, hidden_size=D),
                name="object_encoder",
            )(input_embeds=x, attention_mask=attention_mask, position_ids=0)
            x = DenseLN(D, dtype=dt, name="fc_ovo_output")(x)
            # per-relation sub/obj projections are FULL width D (ref :87-94);
            # plain einsum, no 1/√d (ref 'nrsc,nroc->nrso', :211-213)
            q = nn.Dense(R * D, dtype=dt, name="ovo_sub")(x).reshape(B, N, R, D)
            k = nn.Dense(R * D, dtype=dt, name="ovo_obj")(x).reshape(B, N, R, D)
            out["object_vision_only"] = jnp.einsum(
                "bsrc,borc->brso", q, k, preferred_element_type=jnp.float32
            )

        if "pair_vision_only" in c.experts:
            p = DenseLN(D, dtype=dt, name="fc_pvo_input")(pair_raw)
            h = pair_encoder(input_embeds=p, attention_mask=pm, position_ids=0)
            h = DenseLN(D, dtype=dt, name="fc_pvo_output")(h)
            out["pair_vision_only"] = pair_scores(h, "pvo_cls")

        if "pair_text2vision" in c.experts:
            assert pair_text_embeds is not None
            t = DenseLN(D, dtype=dt, name="fc_pt2v_text_input")(
                pair_text_embeds.reshape(B, N * N, -1)
            )
            v = DenseLN(D, dtype=dt, name="fc_pt2v_vision_prompt")(pair_raw)
            # the reference passes no encoder_attention_mask here — but its
            # shapes are DYNAMIC, so every cross key is a valid pair.  In
            # our static padded layout the equivalent computation masks the
            # pad pairs out of the keys (padding invariance, golden-tested).
            h = pair_encoder(
                input_embeds=t, attention_mask=pm,
                encoder_hidden=v, encoder_mask=pm, position_ids=0,
            )
            h = DenseLN(D, dtype=dt, name="fc_pt2v_output")(h)
            out["pair_text2vision"] = pair_scores(h, "pt2v_cls")

        if "pair_vision2text" in c.experts:
            assert pair_text_embeds is not None
            v = DenseLN(D, dtype=dt, name="fc_pv2t_vision_input")(pair_raw)
            t = DenseLN(D, dtype=dt, name="fc_pv2t_text_prompt")(
                pair_text_embeds.reshape(B, N * N, -1)
            )
            h = pair_encoder(
                input_embeds=v, attention_mask=pm,
                encoder_hidden=t, encoder_mask=pm, position_ids=0,
            )
            h = DenseLN(D, dtype=dt, name="fc_pv2t_output")(h)
            out["pair_vision2text"] = pair_scores(h, "pv2t_cls")

        if "triplet_text_w_vision" in c.experts:
            assert triplet_text_embeds is not None
            assert triplet_text_embeds.ndim == 5, (
                "triplet expert needs per-relation text [B,N,N,R,T]"
            )
            v = DenseLN(D, dtype=dt, name="fc_ttwv_vision_input")(pair_raw)
            t = DenseLN(D, dtype=dt, name="fc_ttwv_text_prompt")(
                triplet_text_embeds.reshape(B, N * N, R, -1)
            )
            # fold the relation axis into batch: ONE encoder call over B·R
            # sequences replaces the reference's R-iteration Python loop
            vr = jnp.broadcast_to(v[:, None], (B, R) + v.shape[1:]).reshape(
                B * R, N * N, D
            )
            tr = t.transpose(0, 2, 1, 3).reshape(B * R, N * N, D)
            pmr = jnp.broadcast_to(pm[:, None], (B, R, N * N)).reshape(
                B * R, N * N
            )
            h = pair_encoder(
                input_embeds=vr, attention_mask=pmr,
                encoder_hidden=tr, encoder_mask=pmr,  # masked (ref :318-325)
                position_ids=0,
            )
            h = DenseLN(D, dtype=dt, name="fc_ttwv_output")(h)
            # per-relation Linear(D, 1) heads (nn.ModuleList, ref :140-141)
            w = self.param(
                "ttwv_cls_w", nn.initializers.normal(D ** -0.5), (R, D)
            )
            b = self.param("ttwv_cls_b", nn.initializers.zeros, (R,))
            h = h.reshape(B, R, N * N, D)
            s = jnp.einsum(
                "brpd,rd->brp", h, w.astype(h.dtype),
                preferred_element_type=jnp.float32,
            ) + b.astype(jnp.float32)[None, :, None]
            out["triplet_text_w_vision"] = s.reshape(B, R, N, N)

        assert out, "no experts enabled"

        if c.use_moe_gate:
            assert pair_text_embeds is not None and triplet_text_embeds is not None
            mv = DenseLN(D, dtype=dt, name="moe_input_pair_vision")(pair_raw)
            mt = DenseLN(D, dtype=dt, name="moe_input_pair_text")(
                pair_text_embeds.reshape(B, N * N, -1)
            )
            tt = triplet_text_embeds.reshape(
                (B, N * N) + triplet_text_embeds.shape[3:]
            )
            mtr = DenseLN(D, dtype=dt, name="moe_input_triplet_text")(tt)
            if mtr.ndim == 4:          # [B, N², R, D] → mean over relations
                mtr = jnp.mean(mtr, axis=2)
            g = mv + mt + mtr
            g = nn.relu(DenseLN(D, dtype=dt, name="moe_fc1")(g))
            g = nn.relu(DenseLN(D, dtype=dt, name="moe_fc2")(g))
            maps = jnp.stack(
                [out[k] for k in EXPERT_ORDER if k in out], axis=1
            )                                            # [B, E, R, N, N]
            E = maps.shape[1]
            if c.moe_weight_type == "v1":
                g = nn.Dense(E, dtype=dt, name="moe_out")(g)   # [B, N², E]
                wgt = jax.nn.softmax(g.astype(jnp.float32), axis=-1)
                wgt = wgt.transpose(0, 2, 1).reshape(B, E, 1, N, N)
            elif c.moe_weight_type == "v2":
                g = nn.Dense(R * E, dtype=dt, name="moe_out")(g)
                wgt = jax.nn.softmax(
                    g.reshape(B, N * N, R, E).astype(jnp.float32), axis=-1
                )
                wgt = wgt.transpose(0, 3, 2, 1).reshape(B, E, R, N, N)
            else:
                raise ValueError(c.moe_weight_type)
            out["moe"] = jnp.sum(maps * wgt, axis=1)

        return out

    @staticmethod
    def primary(out: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Reference inference selection: the LAST enabled expert in cascade
        order; moe overrides everything (mask2former_relation_v2.py:789-800)."""
        sel = None
        for k in EXPERT_ORDER + ("moe",):
            if k in out:
                sel = out[k]
        assert sel is not None
        return sel
