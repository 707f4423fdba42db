"""Builder: every ported reference config constructs its TPU model."""

import os

import jax
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
