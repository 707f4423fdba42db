"""HF InstructBLIP Q-Former checkpoint → RelationQFormer params.

The reference builds its relation Q-Former from an
``InstructBlipQFormerModel`` config (tokenizer from
``Salesforce/instructblip-vicuna-7b``, relation_transformer_head_v4.py:
78-86) and trains it from scratch; this converter makes the stronger claim
in qformer.py's docstring concrete — HF-format Q-Former weights slot into
our batched module.  Schema (verified against the installed transformers
``modeling_instructblip``):

  embeddings.word_embeddings.weight / position_embeddings.weight
  embeddings.layernorm.{weight,bias}           (norms [queries ; text])
  encoder.layer.{i}.attention.attention.{query,key,value}.{weight,bias}
  encoder.layer.{i}.attention.output.{dense,LayerNorm}.*
  encoder.layer.{i}.crossattention.attention.{query,key,value}.*  (kv in
                                               encoder_hidden_size)
  encoder.layer.{i}.crossattention.output.{dense,LayerNorm}.*
  encoder.layer.{i}.intermediate_query / output_query.*   (query FFN)
  encoder.layer.{i}.intermediate / output.*               (text FFN)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from openpsg_tpu.models.relation.qformer import QFormerConfig


def _t(a):
    return np.asarray(a).T


def _dense(state, base):
    return {"kernel": _t(state[base + ".weight"]),
            "bias": np.asarray(state[base + ".bias"])}


def _ln(state, base):
    return {"scale": np.asarray(state[base + ".weight"]),
            "bias": np.asarray(state[base + ".bias"])}


def convert_qformer(
    state: Mapping[str, np.ndarray],
    cfg: QFormerConfig,
    prefix: str = "",
) -> Dict[str, Any]:
    """→ params dict matching ``RelationQFormer`` exactly."""
    g = lambda k: state[prefix + k]
    out: Dict[str, Any] = {
        "word_embed": {"embedding": np.asarray(g("embeddings.word_embeddings.weight"))},
        "pos_embed": np.asarray(
            g("embeddings.position_embeddings.weight")
        )[: cfg.max_text_len],
        "embed_ln": _ln(state, prefix + "embeddings.layernorm"),
    }
    for i in range(cfg.num_layers):
        L = prefix + f"encoder.layer.{i}."
        out[f"self_attn{i}"] = {
            "q": _dense(state, L + "attention.attention.query"),
            "k": _dense(state, L + "attention.attention.key"),
            "v": _dense(state, L + "attention.attention.value"),
            "o": _dense(state, L + "attention.output.dense"),
        }
        out[f"self_ln{i}"] = _ln(state, L + "attention.output.LayerNorm")
        out[f"cross_attn{i}"] = {
            "q": _dense(state, L + "crossattention.attention.query"),
            "k": _dense(state, L + "crossattention.attention.key"),
            "v": _dense(state, L + "crossattention.attention.value"),
            "o": _dense(state, L + "crossattention.output.dense"),
        }
        out[f"cross_ln{i}"] = _ln(state, L + "crossattention.output.LayerNorm")
        out[f"ffn_q_up{i}"] = _dense(state, L + "intermediate_query.dense")
        out[f"ffn_q_down{i}"] = _dense(state, L + "output_query.dense")
        out[f"ffn_q_ln{i}"] = _ln(state, L + "output_query.LayerNorm")
        out[f"ffn_t_up{i}"] = _dense(state, L + "intermediate.dense")
        out[f"ffn_t_down{i}"] = _dense(state, L + "output.dense")
        out[f"ffn_t_ln{i}"] = _ln(state, L + "output.LayerNorm")
    return out
