"""tools/train.py driven end-to-end through the CLI surface.

The trainer internals are covered by test_pipeline.py (plain step) and
test_pipeline_parallel.py (pipelined == plain); this file pins the TOOL
wiring: config → mesh construction → param shardings → step selection →
batch sharding → checkpoint.  The mesh here is the full 3D composition
(``tpu.mesh = dict(dp=2, pp=2, tp=2)`` on the 8-virtual-device CPU
mesh), i.e. the exact config surface a v5e-8 user writes.
"""

import glob
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def train_fixture(tmp_path_factory):
    from tests.fixtures import make_fixture

    root = tmp_path_factory.mktemp("train_psg")
    path = make_fixture(str(root), n_images=8, hw=(64, 64))
    return str(root), path


def test_train_cli_3d_mesh(train_fixture, tmp_path, monkeypatch):
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    root, ann = train_fixture
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        f"_base_ = ['{REPO}/configs/psg/tiny_v4_ov.py']\n"
        "tpu = dict(mesh=dict(dp=2, pp=2, tp=2))\n"
        "data = dict(\n"
        f"    train=dict(ann_file='{ann}', img_prefix='{root}',\n"
        f"               seg_prefix='{root}', pipeline=[]),\n"
        ")\n"
        "runner = dict(max_epochs=1)\n"
        "log_config = dict(interval=1)\n"
    )
    wd = tmp_path / "wd"
    import train as train_tool

    monkeypatch.setattr(
        sys, "argv",
        ["train.py", str(cfg_path), "--work-dir", str(wd),
         "--max-steps", "2", "--seed", "0"],
    )
    train_tool.main()

    # the pp branch engaged (mesh line in the run log) …
    logs = glob.glob(str(wd / "*.log"))
    assert logs, wd
    text = "".join(open(p).read() for p in logs)
    assert "GPipe pp×tp" in text, text[-2000:]
    assert "'pp': 2" in text and "'tp': 2" in text
    # … losses were finite (every logged step prints the metrics dict).
    # Parse the numeric values on metric lines rather than substring-guarding
    # the whole log ("Environment info:" contains " inf" — r4 lesson).
    import math
    import re

    assert "rel_llm_loss" in text
    metric_lines = [ln for ln in text.splitlines() if "rel_llm_loss" in ln]
    assert metric_lines, text[-2000:]
    for ln in metric_lines:
        for key, val in re.findall(r"(\w+): ([-\w.]+)", ln):
            if key == "time":
                continue
            v = float(val)  # raises on 'nan-like' garbage strings too
            assert math.isfinite(v), (key, val, ln)
    # … and a part-checkpoint landed
    assert (wd / "ckpts").is_dir()
    assert any(os.scandir(wd / "ckpts")), "no checkpoint written"


def test_deprecated_gpu_args_accepted(monkeypatch, capsys):
    """Reference launch scripts pass --gpus/--gpu-ids (reference
    tools/train.py:40-56 deprecation surface); they must parse and warn,
    not crash."""
    import train as train_tool

    monkeypatch.setattr(
        sys, "argv",
        ["train.py", "cfg.py", "--gpus", "1", "--gpu-ids", "0", "1"],
    )
    args = train_tool.parse_args()
    assert args.gpus == 1 and args.gpu_ids == [0, 1]
    assert "deprecated" in capsys.readouterr().err


def test_workflow_config_enables_validation(train_fixture, tmp_path, monkeypatch):
    """mmcv two-phase ``workflow=[('train',1),('val',1)]`` (reference
    tools/train.py:224-230) must enable the per-epoch PQ validation pass
    straight from the config, without --validate."""
    root, ann = train_fixture
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        f"_base_ = ['{REPO}/configs/psg/tiny_v4_ov.py']\n"
        "workflow = [('train', 1), ('val', 1)]\n"
        "data = dict(\n"
        f"    train=dict(ann_file='{ann}', img_prefix='{root}',\n"
        f"               seg_prefix='{root}', pipeline=[]),\n"
        f"    val=dict(ann_file='{ann}', img_prefix='{root}',\n"
        f"             seg_prefix='{root}', pipeline=[]),\n"
        ")\n"
        "runner = dict(max_epochs=1)\n"
        "log_config = dict(interval=1)\n"
    )
    wd = tmp_path / "wd"
    import train as train_tool

    monkeypatch.setattr(
        sys, "argv",
        ["train.py", str(cfg_path), "--work-dir", str(wd),
         "--max-steps", "1", "--seed", "0", "--val-limit", "2"],
    )
    train_tool.main()
    logs = glob.glob(str(wd / "*.log"))
    text = "".join(open(p).read() for p in logs)
    assert "enabling per-epoch validation" in text
    assert "] val " in text, text[-2000:]   # the PQ line was logged
