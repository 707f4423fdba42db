import os
import textwrap

import numpy as np
import pytest

from openpsg_tpu.core.config import Config
from openpsg_tpu.core.registry import Registry, build_from_cfg
from openpsg_tpu.data import vocab
from openpsg_tpu.utils.panoptic import id2rgb, rgb2id, random_colors


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


class TestConfig:
    def test_basic_load(self, tmp_path):
        p = _write(tmp_path, "a.py", """
            lr = 0.1
            model = dict(type='Foo', depth=3)
        """)
        cfg = Config.fromfile(p)
        assert cfg.lr == 0.1
        assert cfg.model.type == "Foo"
        assert cfg.model["depth"] == 3

    def test_base_inheritance_and_delete(self, tmp_path):
        _write(tmp_path, "base.py", """
            model = dict(type='Foo', depth=3, head=dict(type='H', n=1))
            lr = 0.1
        """)
        p = _write(tmp_path, "child.py", """
            _base_ = ['base.py']
            model = dict(head=dict(_delete_=True, type='H2'))
            wd = 0.05
        """)
        cfg = Config.fromfile(p)
        assert cfg.model.type == "Foo"           # inherited
        assert cfg.model.depth == 3
        assert cfg.model.head.type == "H2"
        assert "n" not in cfg.model.head          # _delete_ dropped it
        assert cfg.lr == 0.1 and cfg.wd == 0.05

    def test_merge_from_dict(self, tmp_path):
        p = _write(tmp_path, "a.py", "model = dict(type='Foo', depth=3)\n")
        cfg = Config.fromfile(p)
        cfg.merge_from_dict({"model.depth": 7, "new_key": 1})
        assert cfg.model.depth == 7
        assert cfg.model.type == "Foo"
        assert cfg.new_key == 1

    def test_reference_config_loads(self):
        """The ported baseline_v4_ov config must parse with same field names."""
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(here, "configs", "psg", "baseline_v4_ov.py")
        if not os.path.exists(path):
            pytest.skip("config not written yet")
        cfg = Config.fromfile(path, import_custom_modules=False)
        assert cfg.model.type == "OpenSeeDRelationV2"
        assert len(cfg.relation_classes) == 56
        assert cfg.optimizer.lr == 1e-4
        assert cfg.optimizer_config.grad_clip.max_norm == 0.01


class TestRegistry:
    def test_register_and_build(self):
        REG = Registry("test")

        @REG.register_module()
        class Thing:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        obj = build_from_cfg({"type": "Thing", "a": 1}, REG)
        assert obj.a == 1 and obj.b == 2
        with pytest.raises(KeyError):
            REG.get("Missing")

    def test_duplicate_raises(self):
        REG = Registry("dup")
        REG.register_module(name="x", module=int)
        with pytest.raises(KeyError):
            REG.register_module(name="x", module=float)


class TestVocab:
    def test_counts(self):
        assert vocab.NUM_OBJECT_CLASSES == 133
        assert len(vocab.OBJECT_CLASSES) == 133
        assert vocab.NUM_RELATION_CLASSES == 56

    def test_clean_names(self):
        assert vocab.clean_name("sky-other-merged") == "sky"
        assert vocab.clean_name("door-stuff") == "door"
        assert vocab.OBJECT_CLASSES[80 + 6] == "door"  # stuff idx 6
        # no suffixes survive
        for name in vocab.OBJECT_CLASSES:
            assert "-stuff" not in name and "-merged" not in name


class TestPanopticIds:
    def test_roundtrip(self):
        ids = np.array([[0, 1, 255], [256, 70000, 16777215]], dtype=np.int64)
        assert np.array_equal(rgb2id(id2rgb(ids)), ids)

    def test_random_colors_distinct_and_seeded(self):
        c1 = random_colors(64, seed=0)
        c2 = random_colors(64, seed=0)
        assert np.array_equal(c1, c2)
        assert len({tuple(x) for x in c1}) == 64
        assert not any((c == 0).all() for c in c1)


class TestReplaceCfgVals:
    def test_interpolation(self, tmp_path):
        """mmdet ${var} interpolation (SURVEY §5; applied by tools/train.py
        after fromfile like the reference's replace_cfg_vals)."""
        from openpsg_tpu.core.config import Config, replace_cfg_vals

        f = tmp_path / "c.py"
        f.write_text(
            "lr = 0.01\n"
            "model = dict(head=dict(lr='${lr}', tag='run-${lr}'))\n"
        )
        cfg = replace_cfg_vals(
            Config.fromfile(str(f), import_custom_modules=False)
        )
        assert cfg["model"]["head"]["lr"] == 0.01      # typed whole-ref
        assert cfg["model"]["head"]["tag"] == "run-0.01"


class TestUpdateDataRoot:
    """MMDET_DATASETS env override (reference tools/train.py:117-118 →
    mmdet.utils.update_data_root)."""

    def _cfg(self, tmp_path):
        p = tmp_path / "c.py"
        p.write_text(
            "data_root = 'data/coco/'\n"
            "data = dict(train=dict(ann_file='data/coco/psg.json',\n"
            "                       img_prefix='data/coco'),\n"
            "            other=123)\n"
        )
        from openpsg_tpu.core.config import Config

        return Config.fromfile(str(p), import_custom_modules=False)

    def test_noop_without_env(self, tmp_path, monkeypatch):
        from openpsg_tpu.core.config import update_data_root

        monkeypatch.delenv("MMDET_DATASETS", raising=False)
        cfg = update_data_root(self._cfg(tmp_path))
        assert cfg["data_root"] == "data/coco/"

    def test_rewrites_all_strings(self, tmp_path, monkeypatch):
        from openpsg_tpu.core.config import update_data_root

        monkeypatch.setenv("MMDET_DATASETS", "/mnt/ssd/coco")
        cfg = update_data_root(self._cfg(tmp_path))
        assert cfg["data_root"] == "/mnt/ssd/coco/"
        assert cfg["data"]["train"]["ann_file"] == "/mnt/ssd/coco/psg.json"
        # prefix WITHOUT trailing slash also rewritten (mmdet behavior)
        assert cfg["data"]["train"]["img_prefix"] == "/mnt/ssd/coco"
        assert cfg["data"]["other"] == 123


def test_ckpt_meta_has_version_and_hash():
    """tools/train.py embeds framework version + git hash in every save
    (reference train.py:231-236 mmdet_version + git hash)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "train_tool", _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "tools", "train.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    meta = mod._ckpt_meta()
    import openpsg_tpu

    assert meta["version"].startswith(openpsg_tpu.__version__ + "+")
    assert len(meta["version"].split("+", 1)[1]) >= 4   # short git hash
