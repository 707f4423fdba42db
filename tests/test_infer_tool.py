"""tools/infer.py driven end-to-end on a mixed-aspect fixture.

Covers the multi-bucket inference path (per-bucket jitted programs,
bucket-grouped batching, submission re-ordered by test_idx) through the
actual CLI surface — the reference flow is tools/infer.py:65-188.
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def mixed_fixture(tmp_path_factory):
    from tests.fixtures import make_fixture

    root = tmp_path_factory.mktemp("mixed_psg")
    path = make_fixture(
        str(root),
        n_images=8,
        hw=[(96, 64), (64, 96), (96, 96), (64, 128)],
    )
    return str(root), path


def test_infer_multibucket_batched(mixed_fixture, tmp_path, capsys, monkeypatch):
    root, ann = mixed_fixture
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        f"_base_ = ['{REPO}/configs/psg/tiny_v4_ov.py']\n"
        "tpu = dict(input_hw=(128, 128))\n"
    )
    import infer as infer_tool

    monkeypatch.setattr(
        sys, "argv",
        ["infer.py", "--config", str(cfg_path),
         "--test-file", ann, "--data-dir", root,
         "--output-dir", str(tmp_path),
         "--img-scale", "128", "128",
         "--batch-size", "2"],
    )
    infer_tool.main()
    out = capsys.readouterr().out

    # three buckets hit: portrait 128x96, landscape 96x128, square 128x128
    assert "buckets:" in out
    assert "96x128:2" in out and "128x96:1" in out and "128x128:1" in out

    recs = json.load(open(tmp_path / "submission" / "relation.json"))
    assert len(recs) == 4  # test_image_ids = last half of 8
    # positional order restored despite bucket-grouped processing
    assert [r["pan_seg_file_name"] for r in recs] == [
        f"{i}.png" for i in range(4)
    ]
    for i in range(4):
        png = tmp_path / "submission" / "panseg" / f"{i}.png"
        assert png.exists()
        import cv2

        im = cv2.imread(str(png))
        # PNG is at the ORIGINAL image resolution of its record
        exp_hw = [(96, 64), (64, 96), (96, 96), (64, 128)][i]
        assert im.shape[:2] == exp_hw
    for r in recs:
        assert len(r["relations"]) >= 1
        assert len(r["segments_info"]) >= 1
