"""Config-dict → model builder (reference config compatibility).

The reference's de-facto API is its config files (SURVEY.md §2.8); this
module maps a loaded ``configs/psg/baseline_v4_ov.py``-style dict onto our
TPU pipeline classes, so

    cfg = Config.fromfile('configs/psg/baseline_v4_ov.py')
    model = build_detector_from_config(cfg)

mirrors mmdet's ``build_detector(cfg.model)`` (tools/train.py:213-222).
Unknown/mmdet-only fields are accepted and ignored (they configure torch
machinery we replace); TPU-specific sizing lives under the optional
``cfg.tpu`` dict.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def _head_cfg_from_dict(d: Dict[str, Any], tpu: Dict[str, Any]):
    from openpsg_tpu.models.relation.head_v4 import HeadV4Config
    from openpsg_tpu.models.relation.qformer import QFormerConfig

    if tpu.get("head_preset") == "tiny":
        return HeadV4Config.tiny_test()
    qf = QFormerConfig(
        hidden_size=d.get("qformer_feature_size", 768),
        num_layers=d.get("qformer_layer_num", 2),
        encoder_hidden_size=d.get("object_feature_size", 256),
        dtype=jnp.bfloat16 if tpu.get("bf16", True) else jnp.float32,
    )
    return HeadV4Config(
        qformer=qf,
        patch_size=d.get("patch_size", 16),
        object_feature_size=d.get("object_feature_size", 256),
        num_relation_classes=len(d.get("relation_classes", [])) or 56,
        max_object_num=d.get("max_object_num", 30),
        rel_cls_type=d.get("rel_cls_type", "binary+multiclass"),
        sampled_qformer_batch_size=d.get("sampled_qformer_batch_size", 32),
        qformer_neg_over_pos=d.get("qformer_neg_over_pos", 3),
        max_llm_forward_num=d.get("max_llm_forward_num", 4),
        llm_feature_size=d.get("llm_feature_size", 4096),
        dtype=jnp.bfloat16 if tpu.get("bf16", True) else jnp.float32,
    )


def _llm_cfg_from_dict(d: Dict[str, Any], tpu: Dict[str, Any]):
    from openpsg_tpu.models.llm.llama import LlamaConfig

    preset = tpu.get("llm_preset", "tiny")
    if preset == "llama2_7b":
        cfg = LlamaConfig.llama2_7b()
    else:
        cfg = LlamaConfig.tiny_test()
        cfg = dataclasses.replace(
            cfg,
            n_layers=tpu.get("llm_layers", cfg.n_layers),
            dim=tpu.get("llm_dim", cfg.dim),
        )
    trunc = d.get("llm_truncate_num", -1)
    if trunc and trunc > 0:
        cfg = cfg.truncate(min(trunc, cfg.n_layers))
    return cfg


def _segmenter_cfg_from_dict(tpu: Dict[str, Any]):
    from openpsg_tpu.models.segmenter.openseed import SegmenterConfig

    preset = tpu.get("segmenter_preset", "swin_t")
    if preset == "tiny":
        return SegmenterConfig.tiny_test()
    dtype = jnp.bfloat16 if tpu.get("bf16", True) else jnp.float32
    return SegmenterConfig(dtype=dtype)


def build_detector_from_config(cfg, rng: Optional[jax.Array] = None):
    """cfg: a Config (or plain dict) with the reference's ``model`` layout."""
    from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config

    model_cfg = cfg["model"] if "model" in cfg else cfg
    tpu = dict(cfg.get("tpu", {})) if hasattr(cfg, "get") else {}
    mtype = model_cfg.get("type", "OpenSeeDRelationV2")
    if mtype not in ("OpenSeeDRelationV2",):
        raise NotImplementedError(
            f"detector {mtype!r} not yet built for TPU (v4 pipeline first)"
        )

    head_dict = dict(model_cfg.get("relation_head", {}))
    thing = list(model_cfg.get("thing_classes", []) or cfg.get("thing_classes", []))
    stuff = list(model_cfg.get("stuff_classes", []) or cfg.get("stuff_classes", []))
    relations = list(head_dict.get("relation_classes", []) or cfg.get("relation_classes", []))

    pcfg = PSGv4Config(
        segmenter=_segmenter_cfg_from_dict(tpu),
        head=_head_cfg_from_dict(head_dict, tpu),
        llm=_llm_cfg_from_dict(head_dict, tpu),
    )
    class_names = (thing + stuff) or None
    return PSGv4(
        pcfg,
        rng if rng is not None else jax.random.PRNGKey(cfg.get("seed", 0) or 0),
        class_names=class_names,
        relation_names=relations or None,
        num_things=len(thing) if thing else None,
    )
