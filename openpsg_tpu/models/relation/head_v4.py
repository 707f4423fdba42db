"""Relation head v4 — the paper's model (Q-Former + existence filter + LLM).

Reference: kings_sgg/models/relation_heads/relation_transformer_head_v4.py.
Stages (reference line refs in brackets):
  (a) PatchEmbed(patch=16) over the 256-ch mask_features [:75-76, 362];
  (b) per-pair cross-attention mask = OR(mask_i, mask_j) on the patch grid
      [:401-404, 430-433];
  (c) 2-layer Q-Former, queries = 1 cls + 32 relation queries, per-pair
      instruction "Is there a relation between {sub} and {obj}?" [:26, 87-90,
      144-186];
  (d) pair-existence filter: binary and/or 56-way heads on the cls token
      [:91-95, 187-214];
  (e) LLM decode over projected query tokens (handled by the detector via
      openpsg_tpu.models.llm — batched, not the reference's python loop).

TPU redesign: everything below is a single static-shape jitted region.
Instruction token ids are *assembled on device* from a precomputed
[num_classes, name_len] token table (host tokenizes 133 names once at
init) — no per-image host tokenization, no device↔host ping-pong.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openpsg_tpu.models.relation.qformer import QFormerConfig, RelationQFormer
from openpsg_tpu.models.relation.tokenizer import WordTokenizer
from openpsg_tpu.ops.mask_ops import downsample_mask_bilinear, pair_or_masks

NAME_TOKENS = 4  # word-tokenizer default; real tokenizers size the table
                 # from their actual per-name token counts (BPE/wordpiece
                 # split 'baseball glove' etc. into more pieces)


@dataclasses.dataclass(frozen=True)
class HeadV4Config:
    qformer: QFormerConfig = QFormerConfig()
    patch_size: int = 16
    object_feature_size: int = 256
    num_relation_classes: int = 56
    max_object_num: int = 30          # reference cap (:44)
    max_objects_padded: int = 32      # static padding (≥ max_object_num)
    rel_cls_type: str = "binary+multiclass"  # see SURVEY.md §7.3 quirk #1
    llm_feature_size: int = 4096
    sampled_qformer_batch_size: int = 32   # train subsample (:29)
    qformer_neg_over_pos: int = 3          # (:30)
    max_llm_forward_num: int = 4           # train pairs through LLM (:38)
    top_pairs: int = 20                    # inference pairs through LLM (:237)
    dtype: Any = jnp.float32

    @property
    def max_pairs(self) -> int:
        return self.max_objects_padded ** 2

    @staticmethod
    def tiny_test() -> "HeadV4Config":
        return HeadV4Config(
            qformer=QFormerConfig.tiny_test(), patch_size=4,
            object_feature_size=16, max_object_num=6, max_objects_padded=8,
            llm_feature_size=32, top_pairs=4, sampled_qformer_batch_size=8,
        )


def build_instruction_table(tokenizer: WordTokenizer, class_names, template: str,
                            min_len: int):
    """Host-side, once at init: template prefix/infix/suffix token ids and a
    [num_classes, name_tokens] name-token table (pad_id-padded).

    ``name_tokens`` is the tokenizer's actual longest class-name encoding —
    NOT a fixed constant — so BPE/wordpiece tokenizers that split names
    into many pieces fit (reference tokenizes per pair at runtime,
    relation_transformer_head_v4.py:146-152; we precompute).  The emitted
    ``max_len`` is the static instruction width: at least ``min_len``,
    grown to fit the longest possible instruction."""
    pad_id = getattr(tokenizer, "pad_id", 0)
    pre, rest = template.split("{}", 1)
    mid, post = rest.split("{}", 1)
    seg = lambda s: np.asarray(tokenizer.encode(s), np.int32).reshape(-1)
    name_ids = [tokenizer.encode(n) for n in class_names]
    name_tokens = max(max(len(e) for e in name_ids), 1)
    names = np.full((len(class_names), name_tokens), pad_id, np.int32)
    for i, ids in enumerate(name_ids):
        names[i, : len(ids)] = ids
    parts = {"pre": seg(pre), "mid": seg(mid), "post": seg(post), "names": names,
             "pad_id": pad_id}
    total = (len(parts["pre"]) + len(parts["mid"]) + len(parts["post"])
             + 2 * name_tokens)
    parts["max_len"] = max(min_len, total)
    return parts


def right_align(ids: jnp.ndarray, mask: jnp.ndarray):
    """Shift each row so its LAST real token sits in the last column
    (pads wrap to the front; token order preserved).

    Needed for LLM prompts: generation reads logits at the final slot, and
    a pretrained LLM has never queried from a pad position — the reference
    guarantees this via left-padded tokenization (:262); our device-side
    assembly right-pads, so we re-align with one gather."""
    NP, L = ids.shape
    last_real = L - 1 - jnp.argmax(mask[:, ::-1], axis=1)      # [NP]
    shift = (L - 1 - last_real)[:, None]                        # right shift
    cols = jax.lax.broadcasted_iota(jnp.int32, (NP, L), 1)
    src = (cols - shift) % L
    return (
        jnp.take_along_axis(ids, src, axis=1),
        jnp.take_along_axis(mask, src, axis=1),
    )


def assemble_pair_instructions(parts, sub_labels: jnp.ndarray, obj_labels: jnp.ndarray):
    """Device-side: [NP] class labels → ([NP, max_len] ids, [NP, max_len] mask).

    Layout: pre ⧺ name(sub) ⧺ mid ⧺ name(obj) ⧺ post, with name slots
    pad_id-padded in place (mask marks real tokens)."""
    NP = sub_labels.shape[0]
    pad_id = int(parts.get("pad_id", 0))
    pre = jnp.broadcast_to(jnp.asarray(parts["pre"]), (NP, len(parts["pre"])))
    mid = jnp.broadcast_to(jnp.asarray(parts["mid"]), (NP, len(parts["mid"])))
    post = jnp.broadcast_to(jnp.asarray(parts["post"]), (NP, len(parts["post"])))
    names = jnp.asarray(parts["names"])
    sub = jnp.take(names, sub_labels, axis=0)
    obj = jnp.take(names, obj_labels, axis=0)
    ids = jnp.concatenate([pre, sub, mid, obj, post], axis=1)
    pad = parts["max_len"] - ids.shape[1]
    ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=pad_id)
    mask = ids != pad_id
    return ids, mask


class RelationHeadV4(nn.Module):
    cfg: HeadV4Config

    @nn.compact
    def __call__(
        self,
        mask_features: jnp.ndarray,   # [H4, W4, C] stride-4 features
        object_masks: jnp.ndarray,    # [M, H4, W4] bool per-object masks (padded)
        object_valid: jnp.ndarray,    # [M] bool
        text_ids: jnp.ndarray,        # [NP, T] per-pair instruction ids
        text_mask: jnp.ndarray,       # [NP, T]
        pair_select: jnp.ndarray | None = None,  # [S] int32 — train subsample
    ) -> Dict[str, jnp.ndarray]:
        """Runs (a)-(d).  NP must equal M² (all ordered pairs, pair-major)
        unless ``pair_select`` gathers S pairs (training).  Returns
        qformer outputs, existence logits, and projected LLM visual tokens
        for every processed pair."""
        c = self.cfg
        M = object_masks.shape[0]
        D = c.qformer.hidden_size

        # (a) patch embedding of mask features
        patches = nn.Conv(
            c.object_feature_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            dtype=c.dtype,
            name="patch_embed",
        )(mask_features)                                   # [hp, wp, C]
        hp, wp, _ = patches.shape
        patches = patches.reshape(hp * wp, c.object_feature_size)

        # (b) pair OR-masks on the patch grid
        obj_patch_masks = downsample_mask_bilinear(object_masks, (hp, wp))
        obj_patch_masks = obj_patch_masks & object_valid[:, None, None]
        flat = obj_patch_masks.reshape(M, hp * wp)
        pmask = pair_or_masks(flat).reshape(M * M, hp * wp)  # [NP, P]

        # (c) relation Q-Former over pairs
        rel_query = self.param(
            "relation_query", nn.initializers.normal(1.0),
            (c.qformer.num_relation_queries, D),
        )
        cls_query = self.param(
            "rel_cls_query", nn.initializers.normal(1.0), (1, D)
        )
        query = jnp.concatenate([cls_query, rel_query], axis=0)

        if pair_select is not None:
            pmask = jnp.take(pmask, pair_select, axis=0)
            text_ids = jnp.take(text_ids, pair_select, axis=0)
            text_mask = jnp.take(text_mask, pair_select, axis=0)
        NP = pmask.shape[0]

        queries = jnp.broadcast_to(query[None], (NP,) + query.shape)
        qf_out = RelationQFormer(c.qformer, name="qformer")(
            queries, text_ids, text_mask, patches, pmask
        )                                                  # [NP, 1+R, D]

        out: Dict[str, jnp.ndarray] = {"qformer_out": qf_out, "pair_mask": pmask}
        cls_feat = qf_out[:, 0]
        if "binary" in c.rel_cls_type:
            out["binary_logits"] = nn.Dense(
                1, dtype=c.dtype, name="binary_rel_cls"
            )(cls_feat)[:, 0].astype(jnp.float32)
        if "multiclass" in c.rel_cls_type:
            out["multiclass_logits"] = nn.Dense(
                c.num_relation_classes, dtype=c.dtype, name="multiclass_rel_cls"
            )(cls_feat).astype(jnp.float32)

        pair_feature = qf_out[:, 1:]                       # [NP, R, D]
        out["llm_visual_tokens"] = nn.Dense(
            c.llm_feature_size, dtype=c.dtype, name="language_projection"
        )(pair_feature)
        return out


def select_topk_pairs(binary_logits: jnp.ndarray, pair_valid: jnp.ndarray, k: int):
    """Inference pair selection: top-k pairs by binary existence score
    (reference: sigmoid → topk → first 20, :235-237).  Invalid (padding)
    pairs are excluded via -inf."""
    scored = jnp.where(pair_valid, binary_logits, -jnp.inf)
    scores, idx = jax.lax.top_k(scored, k)
    return idx.astype(jnp.int32), jax.nn.sigmoid(scores)


def multiclass_topk_triplets(
    multiclass_logits: jnp.ndarray,   # [NP, R]
    pair_valid: jnp.ndarray,          # [NP]
    n_obj_padded: int,
    k: int = 100,
):
    """Top-k (sub, obj, rel) triplets from the multiclass branch.

    Intended semantics of reference :238-257 (its index arithmetic has
    latent bugs — SURVEY.md §7.3 quirk — the flattening is pair-major):
    sigmoid scores, self-pairs zeroed, flatten [NP*R], top-100."""
    NP, R = multiclass_logits.shape
    probs = jax.nn.sigmoid(multiclass_logits)
    pair_idx = jnp.arange(NP, dtype=jnp.int32)
    sub = pair_idx // n_obj_padded
    obj = pair_idx % n_obj_padded
    valid = pair_valid & (sub != obj)                      # diag zeroed (:240-241)
    probs = jnp.where(valid[:, None], probs, 0.0)
    flat = probs.reshape(-1)
    scores, idx = jax.lax.top_k(flat, k)
    tsub = (idx // R) // n_obj_padded
    tobj = (idx // R) % n_obj_padded
    trel = idx % R
    return (
        jnp.stack([tsub, tobj, trel], axis=1).astype(jnp.int32),
        scores,
    )
