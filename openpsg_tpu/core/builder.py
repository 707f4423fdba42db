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
    # deploy knobs (PARITY.md / selfcheck_knobs knob matrix): weight-only
    # int8 (fits the 7B on one v5e chip) and dynamic int8-activation
    # prefill (needs quant=True; measured zero R@20 delta on the r5
    # harness).  Parity configs leave both unset.
    if tpu.get("llm_int8") is not None or tpu.get("act_int8") is not None:
        cfg = dataclasses.replace(
            cfg,
            quant=bool(tpu.get("llm_int8", cfg.quant)),
            act_int8=bool(tpu.get("act_int8", cfg.act_int8)),
        )
    return cfg


def _backbone_preset(model_cfg: Dict[str, Any]) -> str:
    """Derive the backbone preset from the reference's ``model.backbone``
    dict (field-deep: baseline_swin_b.py:14-34 switches type/embed_dims
    with no `tpu` section)."""
    bb = dict(model_cfg.get("backbone", {}) or {})
    if bb.get("type") == "SwinTransformer":
        ed = int(bb.get("embed_dims", 96))
        # exact geometries only: guessing would build the WRONG model
        # silently (e.g. Swin-L embed_dims=192 must not get Swin-B widths
        # and then shape-error at weight-load time)
        if ed == 96:
            return "swin_t"
        if ed == 128:
            return "swin_b"
        raise ValueError(
            f"unsupported SwinTransformer embed_dims={ed}: known presets "
            "are swin_t (96) and swin_b (128); set tpu.segmenter_preset "
            "explicitly for other geometries"
        )
    return "r50"


def _apply_panoptic_head_fields(seg, ph: Dict[str, Any]):
    """Field-deep mapping of the reference's ``panoptic_head`` dict onto
    Mask2FormerConfig (reference baseline_r50.py:48-109) — the "config IS
    the API" contract (SURVEY.md §2.8): loading the reference's own
    config must build the reference's model GEOMETRY, not a preset.

    Mapped: num_queries, feat_channels→dim, out_channels→mask_dim,
    pixel_decoder.encoder.num_layers→enc_layers (+ its FFN width),
    transformer_decoder.num_layers→dec_layers (+ its FFN width).
    Backbone-derived fields (in_channels, strides) follow the backbone
    preset; class counts come from the vocabulary lists."""
    if not ph:
        return seg
    upd: Dict[str, Any] = {}
    if "num_queries" in ph:
        upd["num_queries"] = int(ph["num_queries"])
    if "feat_channels" in ph:
        upd["dim"] = int(ph["feat_channels"])
    if "out_channels" in ph:
        upd["mask_dim"] = int(ph["out_channels"])
    enc = (ph.get("pixel_decoder") or {}).get("encoder") or {}
    if "num_layers" in enc:
        upd["enc_layers"] = int(enc["num_layers"])
    enc_ffn = ((enc.get("transformerlayers") or {}).get("ffn_cfgs") or {}).get(
        "feedforward_channels"
    )
    if enc_ffn:
        upd["enc_ffn_hidden"] = int(enc_ffn)
    td = ph.get("transformer_decoder") or {}
    if "num_layers" in td:
        upd["dec_layers"] = int(td["num_layers"])
    tdl = td.get("transformerlayers") or {}
    dec_ffn = (tdl.get("ffn_cfgs") or {}).get("feedforward_channels") or tdl.get(
        "feedforward_channels"
    )
    if dec_ffn:
        upd["ffn_hidden"] = int(dec_ffn)
    return dataclasses.replace(seg, **upd)


def _segmenter_cfg_from_dict(tpu: Dict[str, Any]):
    from openpsg_tpu.models.segmenter.openseed import SegmenterConfig

    preset = tpu.get("segmenter_preset", "swin_t")
    if preset == "tiny":
        seg = SegmenterConfig.tiny_test()
    else:
        dtype = jnp.bfloat16 if tpu.get("bf16", True) else jnp.float32
        seg = SegmenterConfig(dtype=dtype)
    if tpu.get("enc_points_per_level"):
        # deploy-time encoder sample-point pruning (quality/speed knob,
        # SegmenterConfig docstring); configs give a list — tuple-ize for
        # the frozen/hashable dataclass
        seg = dataclasses.replace(
            seg, enc_points_per_level=tuple(tpu["enc_points_per_level"])
        )
    return seg


def build_detector_from_config(cfg, rng: Optional[jax.Array] = None):
    """cfg: a Config (or plain dict) with the reference's ``model`` layout.

    Dispatches on ``model.type`` exactly like mmdet's registry:
      OpenSeeDRelationV2                      → PSGv4 (flagship)
      Mask2FormerRelation / ...V2 / OpenSeeDRelation → PSGMask2FormerRelation
    """
    model_cfg = cfg["model"] if "model" in cfg else cfg
    tpu = dict(cfg.get("tpu", {})) if hasattr(cfg, "get") else {}
    mtype = model_cfg.get("type", "OpenSeeDRelationV2")
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.get("seed", 0) or 0)

    head_dict = dict(model_cfg.get("relation_head", {}))
    thing = list(model_cfg.get("thing_classes", []) or cfg.get("thing_classes", []))
    stuff = list(model_cfg.get("stuff_classes", []) or cfg.get("stuff_classes", []))
    relations = list(head_dict.get("relation_classes", []) or cfg.get("relation_classes", []))
    class_names = (thing + stuff) or None
    num_things = len(thing) if thing else None

    if mtype == "OpenSeeDRelationV2":
        from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config

        pcfg = PSGv4Config(
            segmenter=_segmenter_cfg_from_dict(tpu),
            head=_head_cfg_from_dict(head_dict, tpu),
            llm=_llm_cfg_from_dict(head_dict, tpu),
        )
        if tpu.get("input_hw"):
            pcfg = dataclasses.replace(pcfg, input_hw=tuple(tpu["input_hw"]))
        # deployment knobs (PSGv4Config docstrings): decode budget/early
        # exit and the fusion pre-selection caps are TPU sizing choices,
        # so they live in the config's `tpu` dict like the other presets
        for knob in ("max_new_tokens", "decode_early_exit",
                     "fusion_stride", "fusion_candidates"):
            if knob in tpu:
                pcfg = dataclasses.replace(pcfg, **{knob: tpu[knob]})
        # real tokenizers (reference: SentencePiece for the LLM, wordpiece
        # for the Q-Former, relation_transformer_head_v4.py:85-86, 99-105).
        # Accept explicit *_tokenizer_path fields or model-name fields that
        # resolve to local directories; default closed-vocab word tokenizer.
        import os

        def _hf_tok(*keys):
            for k in keys:
                p = head_dict.get(k)
                if p and os.path.exists(str(p)):
                    if str(p).endswith(".model"):
                        # the reference's llama tokenizer_path points at a
                        # SentencePiece file (llama_tokenizer.py:14-16);
                        # loaded by the dependency-free SP reader
                        from openpsg_tpu.models.relation.sp_tokenizer import (
                            SentencePieceTokenizer,
                        )

                        return SentencePieceTokenizer.from_file(str(p))
                    from openpsg_tpu.models.relation.hf_tokenizer import (
                        HFTokenizer,
                    )

                    return HFTokenizer.from_pretrained(str(p))
            return None

        model = PSGv4(
            pcfg, rng, class_names=class_names,
            relation_names=relations or None, num_things=num_things,
            precomputed_class_embeds=model_cfg.get("precomputed_class_embeds")
            or None,
            tokenizer=_hf_tok("tokenizer_path", "llm_model_name"),
            qformer_tokenizer=_hf_tok(
                "qformer_tokenizer_path", "qformer_model_name"
            ),
        )
        # converted OpenSeeD trunk (reference: from_pretrained at init,
        # openseed_relation_v2.py:37-41)
        seg_path = model_cfg.get("openseed_pretrained_path")
        if seg_path:
            import os

            if os.path.exists(seg_path):
                model.load_segmenter_weights(seg_path)
            else:
                print(f"[builder] openseed_pretrained_path {seg_path!r} "
                      "not found — using random segmenter init")
        return model

    if mtype in ("Mask2FormerRelation", "Mask2FormerRelationV2", "OpenSeeDRelation"):
        return _build_m2f_family(cfg, model_cfg, head_dict, tpu, rng,
                                 class_names, relations, num_things)

    raise NotImplementedError(f"detector {mtype!r} is not a known PSG model")


def m2f_relation_config(cfg):
    """Assemble the M2FRelationConfig from a loaded config file WITHOUT
    initializing parameters — geometry inspection and tests (the config-IS-
    the-API contract, SURVEY.md §2.8)."""
    model_cfg = cfg["model"] if "model" in cfg else cfg
    tpu = dict(cfg.get("tpu", {})) if hasattr(cfg, "get") else {}
    head_dict = dict(model_cfg.get("relation_head", {}))
    relations = list(
        head_dict.get("relation_classes", []) or cfg.get("relation_classes", [])
    )
    return _m2f_config(model_cfg, head_dict, tpu, relations)


def _m2f_config(model_cfg, head_dict, tpu, relations):
    import jax.numpy as jnp

    from openpsg_tpu.models.detectors.mask2former_relation import (
        M2FRelationConfig,
    )
    from openpsg_tpu.models.relation.head_v1 import HeadV1Config
    from openpsg_tpu.models.relation.head_v2 import HeadV2Config
    from openpsg_tpu.models.relation.head_v3 import HeadV3Config
    from openpsg_tpu.models.segmenter.mask2former import Mask2FormerConfig
    from openpsg_tpu.models.commons.text_encoder import BertStyleConfig
    from openpsg_tpu.models.llm.llama import LlamaConfig

    dtype = jnp.bfloat16 if tpu.get("bf16", True) else jnp.float32
    head_type = head_dict.get("type", "RelationTransformerHead")
    version = {
        "RelationTransformerHead": "v1",
        "RelationTransformerHeadV2": "v2",
        "RelationTransformerHeadV3": "v3",
    }[head_type]

    preset = tpu.get("segmenter_preset") or _backbone_preset(model_cfg)
    if preset in ("tiny", "tiny_r50"):
        # explicit test override: tiny topology, reference panoptic_head
        # geometry deliberately ignored (tiny_r50 keeps the full ResNet
        # key schema at test scale — converter drills)
        seg = Mask2FormerConfig.tiny_test()
        if preset == "tiny_r50":
            import dataclasses as _dc

            seg = _dc.replace(seg, backbone="tiny_r50", num_queries=10,
                              enc_layers=2, dec_layers=3)
        input_hw = (64, 64)
        max_obj, max_pad = 6, 8
    else:
        backbone = {"r50": "r50", "swin_t": "swin_t", "swin_b": "swin_b"}[preset]
        seg = Mask2FormerConfig(backbone=backbone, dtype=dtype)
        seg = _apply_panoptic_head_fields(
            seg, dict(model_cfg.get("panoptic_head", {}) or {})
        )
        input_hw = tuple(tpu.get("input_hw", (1344, 1344)))
        max_obj, max_pad = 30, 32

    enc = BertStyleConfig(
        num_layers=head_dict.get("num_transformer_layer", 2),
        dtype=dtype,
    ) if preset not in ("tiny", "tiny_r50") else BertStyleConfig.tiny_test()

    use_prompts = bool(head_dict.get("use_relation_prompts", False))
    pred_type = head_dict.get("pred_type", "attention")
    v1 = HeadV1Config(
        encoder=enc,
        input_feature_size=head_dict.get("input_feature_size", seg.mask_dim),
        output_feature_size=head_dict.get("output_feature_size", 768)
        if preset not in ("tiny", "tiny_r50") else 32,
        num_relation_classes=len(relations) or 56,
        pred_type=pred_type if not use_prompts else "attention",
        use_relation_prompts=use_prompts,
        # on the prompt path the reference's pred_type selects the
        # InteractiveFusionModule scoring mode (einsum/einsum_v1/...)
        fusion_pred_type=pred_type if use_prompts else "einsum",
        graph_transformer_type=head_dict.get("graph_transformer_type"),
        use_learnable_prompts=head_dict.get("use_learnable_prompts", False),
        learnable_prompts_size=head_dict.get("learnable_prompts_size", 16),
        semantic_type=head_dict.get("semantic_type", "relation_classes"),
        loss_type=head_dict.get("loss_type", "v1"),
        loss_weight=head_dict.get("loss_weight", 50.0),
        loss_alpha=head_dict.get("loss_alpha", 1.0),
        dtype=dtype,
    ) if version == "v1" else (
        HeadV1Config.tiny_test() if preset in ("tiny", "tiny_r50") else HeadV1Config()
    )

    experts = []
    for flag, name in (
        # reference flag names (baseline_v2_r50.py:150-156)
        ("use_object_vision_only", "object_vision_only"),
        ("use_pair_vision_only", "pair_vision_only"),
        ("use_pair_text_vision_cross", "pair_text2vision"),
        ("use_pair_vision_text_cross", "pair_vision2text"),
        ("use_triplet_vision_text_cross", "triplet_text_w_vision"),
    ):
        if head_dict.get(flag, False):
            experts.append(name)
    v2 = HeadV2Config(
        encoder=enc,
        feature_size=head_dict.get("output_feature_size", 768),
        num_relation_classes=len(relations) or 56,
        text_embedding_size=head_dict.get(
            "text_embedding_size", model_cfg.get("text_embedding_size", 1536)
        ),
        experts=tuple(experts) or ("object_vision_only",),
        use_moe_gate=head_dict.get("use_moe", False),
        moe_weight_type=head_dict.get("moe_weight_type", "v1"),
        dtype=dtype,
    ) if version == "v2" else (
        HeadV2Config.tiny_test() if preset in ("tiny", "tiny_r50") else HeadV2Config()
    )

    shave = head_dict.get("shave_language_decoder_at", 6)
    llm_preset = tpu.get("llm_preset", "llama2_7b" if preset not in ("tiny", "tiny_r50") else "tiny")
    base_llm = (
        LlamaConfig.llama2_7b(dtype)
        if llm_preset == "llama2_7b"
        else LlamaConfig.tiny_test(vocab_size=512)
    )
    if tpu.get("llm"):
        # explicit geometry override (tpu sizing dict), e.g. to match a
        # checkpoint trunk in tests/imports
        base_llm = dataclasses.replace(base_llm, **dict(tpu["llm"]))
    tiny = preset in ("tiny", "tiny_r50")
    v3 = HeadV3Config(
        llm=dataclasses.replace(
            base_llm.truncate(min(shave, base_llm.n_layers)),
            causal=head_dict.get("causal_mask", True),
        ),
        input_feature_size=head_dict.get("input_feature_size", seg.mask_dim),
        # reference defaults (relation_transformer_head_v3.py:45-48);
        # tiny presets shrink the former/output dims to test scale
        former_feature_size=head_dict.get(
            "former_feature_size", 32 if tiny else 768
        ),
        output_feature_size=head_dict.get(
            "output_feature_size", 16 if tiny else 512
        ),
        former_heads=2 if tiny else 12,
        former_intermediate=64 if tiny else 3072,
        num_relation_classes=len(relations) or 56,
        ov_relation=head_dict.get("ov_relation", False),
        sub_obj_merge_type=head_dict.get("sub_obj_merge_type", "concat"),
        num_object_in_layers=head_dict.get("num_object_in_layers", 0),
        num_object_out_layers=head_dict.get("num_object_out_layers", 0),
        num_relation_out_layers=head_dict.get("num_relation_out_layers", 0),
        dtype=dtype,
    ) if version == "v3" else (
        HeadV3Config.tiny_test() if preset in ("tiny", "tiny_r50") else HeadV3Config()
    )

    return M2FRelationConfig(
        segmenter=seg, head_version=version,
        head_v1=v1, head_v2=v2, head_v3=v3,
        max_objects=max_obj, max_objects_padded=max_pad,
        # optional v1 token embellishments (reference relation_head fields,
        # baseline_r50.py:160-163; `positional_encoding` is a Sine-PE dict
        # or None — Sine has no params, so presence IS the toggle)
        embedding_add_cls=head_dict.get("embedding_add_cls", True),
        merge_cls_type=head_dict.get("merge_cls_type", "add"),
        use_positional_encoding=(
            head_dict.get("positional_encoding") is not None
        ),
        use_background_feature=head_dict.get("use_background_feature", False),
        object_token_size=int(head_dict.get("object_token_size", 1)),
        object_mask_thr=model_cfg.get("test_cfg", {}).get("object_mask_thr", 0.8)
        if model_cfg.get("test_cfg") else 0.8,
        input_hw=input_hw,
    )


def _build_m2f_family(cfg, model_cfg, head_dict, tpu, rng, class_names,
                      relations, num_things):
    from openpsg_tpu.models.detectors.mask2former_relation import (
        PSGMask2FormerRelation,
    )

    mcfg = _m2f_config(model_cfg, head_dict, tpu, relations)

    text_kv = None
    db_dir = model_cfg.get("text_embed_db_dir")
    if db_dir:
        from openpsg_tpu.data.text_kv import TextKVStore

        text_kv = TextKVStore(
            path=None if not db_dir else f"{db_dir}/kv.db",
            embedding_size=model_cfg.get("text_embedding_size", 1536),
        )

    model = PSGMask2FormerRelation(
        mcfg, rng, class_names=class_names,
        relation_names=relations or None, num_things=num_things,
        text_kv=text_kv,
    )
    # converted mmdet Mask2Former trunk.  `segmenter_pretrained_path` is our
    # spelling; the reference's `load_from` (baseline_r50.py:3) points at the
    # raw mmdet .pth, which load_segmenter_weights also accepts directly.
    seg_path = model_cfg.get("segmenter_pretrained_path") or cfg.get("load_from")
    if seg_path:
        import os

        if os.path.exists(str(seg_path)):
            model.load_segmenter_weights(str(seg_path))
        else:
            print(f"[builder] segmenter checkpoint {seg_path!r} not found — "
                  "using random segmenter init")
    return model
