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

from openpsg_tpu.models.detectors.psg_v4 import AUTO_MB_SIZE

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


def test_infer_gt_masks_m2f_family(mixed_fixture, tmp_path, monkeypatch):
    """--gt-masks must also run for the Mask2Former family through the
    TOOL surface (r3 review: M2FRelationConfig keeps max_objects_padded
    at top level, and _load_gt_objects crashed on cfg.head before any
    image — tests that called infer_gt directly never saw it)."""
    root, ann = mixed_fixture
    import infer as infer_tool

    monkeypatch.setattr(
        sys, "argv",
        ["infer.py", "--config", os.path.join(REPO, "configs/psg/tiny_r50.py"),
         "--test-file", ann, "--data-dir", root,
         "--output-dir", str(tmp_path),
         "--img-scale", "64", "64", "--single-bucket", "--gt-masks"],
    )
    infer_tool.main()
    recs = json.load(open(tmp_path / "submission" / "relation.json"))
    assert len(recs) == 4
    for r in recs:
        assert len(r["segments_info"]) == 3  # the GT segments survived


def test_infer_gt_masks_ablation(mixed_fixture, tmp_path, monkeypatch):
    """--gt-masks upper-bound ablation (reference's commented-out harness,
    tools/infer.py:102-147): predicted panoptic replaced by ground truth;
    submission masks must round-trip the GT segments near-perfectly."""
    import cv2

    from openpsg_tpu.utils.panoptic import rgb2id

    root, ann = mixed_fixture
    import infer as infer_tool

    monkeypatch.setattr(
        sys, "argv",
        ["infer.py", "--config", os.path.join(REPO, "configs/psg/tiny_v4_ov.py"),
         "--test-file", ann, "--data-dir", root,
         "--output-dir", str(tmp_path),
         "--img-scale", "64", "64", "--single-bucket", "--gt-masks"],
    )
    infer_tool.main()

    recs = json.load(open(tmp_path / "submission" / "relation.json"))
    assert len(recs) == 4
    gt = json.load(open(ann))
    gt_recs = [d for d in gt["data"]
               if d["image_id"] in set(gt["test_image_ids"]) and d["relations"]]
    for rec, gt_rec in zip(recs, gt_recs):
        # all three GT segments present with the right classes
        assert len(rec["segments_info"]) == 3
        assert sorted(s["category_id"] - 1 for s in rec["segments_info"]) == \
            sorted(s["category_id"] for s in gt_rec["segments_info"])
        # masks round-trip: submission PNG IoU vs GT PNG > 0.8 per segment
        png = cv2.imread(
            str(tmp_path / "submission" / "panseg" / rec["pan_seg_file_name"])
        )
        ids = rgb2id(png[..., ::-1])
        gt_png = cv2.imread(os.path.join(root, gt_rec["pan_seg_file_name"]))
        gt_ids = rgb2id(gt_png[..., ::-1])
        for seg, gt_seg in zip(rec["segments_info"], gt_rec["segments_info"]):
            pm = ids == seg["id"]
            gm = gt_ids == gt_seg["id"]
            iou = (pm & gm).sum() / max((pm | gm).sum(), 1)
            assert iou > 0.8, (seg, gt_seg, iou)


def test_infer_micro_batch(mixed_fixture, tmp_path, capsys, monkeypatch):
    """--micro-batch 2 (single-chip pipelined path: lax.map segmenter +
    ONE flattened LLM decode per chunk, psg_v4.make_pipelined_infer)
    through the CLI surface — must produce the same submission as the
    per-image path, including tail-chunk padding and bucket grouping."""
    root, ann = mixed_fixture
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        f"_base_ = ['{REPO}/configs/psg/tiny_v4_ov.py']\n"
        "tpu = dict(input_hw=(128, 128))\n"
    )
    import infer as infer_tool

    def run(outdir, extra):
        monkeypatch.setattr(
            sys, "argv",
            ["infer.py", "--config", str(cfg_path),
             "--test-file", ann, "--data-dir", root,
             "--output-dir", str(outdir),
             "--img-scale", "128", "128"] + extra,
        )
        infer_tool.main()
        return json.load(open(outdir / "submission" / "relation.json"))

    micro = run(tmp_path / "micro", ["--micro-batch", "2"])
    plain = run(tmp_path / "plain", [])
    capsys.readouterr()

    assert len(micro) == 4
    assert [r["pan_seg_file_name"] for r in micro] == [
        f"{i}.png" for i in range(4)
    ]
    for m, p in zip(micro, plain):
        assert m["relations"] == p["relations"]
        assert [s["category_id"] for s in m["segments_info"]] == [
            s["category_id"] for s in p["segments_info"]
        ]


class TestAutoMicroBatch:
    """Flag-free v4 auto-selection (VERDICT r3 next #4a): the default path
    must switch itself to the micro-batched program when decode runs long,
    and stay per-image when it doesn't."""

    @staticmethod
    def _run(tmp_path, monkeypatch, ann, root, name, extra, cfg_extra=""):
        import infer as infer_tool

        cfg_path = tmp_path / f"cfg_{name}.py"
        cfg_path.write_text(
            f"_base_ = ['{REPO}/configs/psg/tiny_v4_ov.py']\n" + cfg_extra
        )
        outdir = tmp_path / name
        monkeypatch.setattr(
            sys, "argv",
            ["infer.py", "--config", str(cfg_path),
             "--test-file", ann, "--data-dir", root,
             "--output-dir", str(outdir),
             "--img-scale", "64", "64", "--single-bucket"] + extra,
        )
        stats = infer_tool.main()
        return json.load(open(outdir / "submission" / "relation.json")), stats

    def test_pinned_decode_switches_immediately(
        self, mixed_fixture, tmp_path, monkeypatch
    ):
        root, ann = mixed_fixture
        cfg = "tpu = dict(decode_early_exit=False)\n"
        auto, st = self._run(tmp_path, monkeypatch, ann, root, "auto", [], cfg)
        assert st["micro_batch"] > 1, st   # switched without any flag
        pinned, st2 = self._run(
            tmp_path, monkeypatch, ann, root, "plain",
            ["--no-auto-micro-batch"], cfg,
        )
        assert st2["micro_batch"] == 0, st2
        for a, p in zip(auto, pinned):
            assert a["relations"] == p["relations"]

    def test_calibration_switches_when_median_crosses(
        self, mixed_fixture, tmp_path, monkeypatch
    ):
        from openpsg_tpu.models.detectors import psg_v4

        root, ann = mixed_fixture
        # threshold 1: any realized decode median trips the switch once the
        # calibration window fills — deterministic drive of the decision
        monkeypatch.setattr(psg_v4, "AUTO_MB_DECODE_STEPS", 1)
        auto, st = self._run(tmp_path, monkeypatch, ann, root, "calib", [])
        assert st["micro_batch"] > 1, st   # calibration tripped the switch
        plain, st2 = self._run(
            tmp_path, monkeypatch, ann, root, "pi", ["--no-auto-micro-batch"]
        )
        assert st2["micro_batch"] == 0, st2
        assert [r["pan_seg_file_name"] for r in auto] == [
            r["pan_seg_file_name"] for r in plain
        ]
        for a, p in zip(auto, plain):
            assert a["relations"] == p["relations"]

    def test_act_int8_program_selects_micro_batch_outright(
        self, mixed_fixture, tmp_path, monkeypatch
    ):
        """With int8-activation prefill (the recommended deployment
        program) the micro-batch wins at every decode length (r5,
        PARITY.md): the flag-free path must select mb AUTO_MB_SIZE
        immediately, no calibration, and results must match per-image."""
        root, ann = mixed_fixture
        cfg = "tpu = dict(llm_int8=True, act_int8=True)\n"
        auto, st = self._run(tmp_path, monkeypatch, ann, root, "actmb",
                             [], cfg)
        assert st["micro_batch"] == AUTO_MB_SIZE, st
        assert st["mb_switches"] == [], st
        plain, st2 = self._run(
            tmp_path, monkeypatch, ann, root, "actpi",
            ["--no-auto-micro-batch"], cfg,
        )
        assert st2["micro_batch"] == 0, st2
        for a, p in zip(auto, plain):
            assert a["relations"] == p["relations"]

    def test_short_decode_stays_per_image(
        self, mixed_fixture, tmp_path, monkeypatch
    ):
        # decode budget capped at 4 < AUTO_MB_DECODE_STEPS=10: calibration
        # must KEEP the per-image path (faster in the short-decode regime).
        # (Without the cap the tiny model's random LLM never emits EOS and
        # realizes all 16 default steps — correctly trip-switching.)
        root, ann = mixed_fixture
        _, st = self._run(tmp_path, monkeypatch, ann, root, "short", [],
                          "tpu = dict(max_new_tokens=4)\n")
        assert st["micro_batch"] == 0, st
        assert st["mb_switches"] == [], st

    def test_controller_median_and_hysteresis(self):
        """Pure controller semantics (VERDICT r4 #6): median over a rolling
        window (one outlier can't pin the run), switch up at threshold,
        back down only past the hysteresis margin, window cleared on every
        switch."""
        import infer as infer_tool

        c = infer_tool.AutoMBController(threshold=10, k=4, hysteresis=2, mb=2)
        # an atypically long FIRST image must not decide anything
        c.observe(16)
        assert c.decide() is None
        for s in (3, 3, 3):
            c.observe(s)
        assert c.decide() is None          # median(16,3,3,3)=3 < 10
        # sustained long decode → up-switch once the window median crosses
        for s in (16, 16, 12, 12):
            c.observe(s)
        assert c.decide() == 2
        assert c.mode == 2 and len(c.window) == 0
        # 9 ≥ threshold−hysteresis: sticky (mb-mode trips are maxes)
        for s in (9, 9, 9, 9):
            c.observe(s)
        assert c.decide() is None
        # sustained short decode → switch back
        for s in (3, 4, 3, 4):
            c.observe(s)
        assert c.decide() == 1
        assert c.mode == 1
        assert c.switches == [(8, 2), (16, 1)]
        # None observations (non-v4 results) are ignored
        c.observe(None)
        assert len(c.window) == 0

    def test_calibration_switches_both_ways(
        self, tmp_path_factory, tmp_path, monkeypatch
    ):
        """Drives a mixed-length decode sequence through BOTH transitions
        via the real CLI loop: long decodes up-switch to the micro-batched
        program mid-run, later short decodes switch back to per-image, and
        the re-chunked remainder still produces a correctly ordered
        submission (VERDICT r4 #6 'test drives both switches')."""
        from tests.fixtures import make_fixture

        import infer as infer_tool

        root = tmp_path_factory.mktemp("calib_psg")
        ann = make_fixture(str(root), n_images=24, hw=(64, 64))

        # script the controller's observations: the tiny random-weight LLM
        # can't produce controllable decode lengths, so feed a deterministic
        # long→short sequence while the real model/results still flow
        script = iter([16, 16, 16, 16] + [3] * 100)
        orig = infer_tool.AutoMBController.observe

        def scripted_observe(self, steps):
            # only substitute when the model actually reported a decode
            # (preserves the None-handling path)
            orig(self, next(script) if steps is not None else None)

        monkeypatch.setattr(
            infer_tool.AutoMBController, "observe", scripted_observe
        )
        auto, st = self._run(tmp_path, monkeypatch, ann, str(root), "both", [])
        # up-switch after the window filled (4 images), down-switch after 4
        # post-switch observations (one mb4 chunk)
        assert st["mb_switches"] == [(4, AUTO_MB_SIZE), (8, 1)], st
        assert st["micro_batch"] == 0, st   # ended on the per-image program
        assert len(auto) == 12
        assert [r["pan_seg_file_name"] for r in auto] == [
            f"{i}.png" for i in range(12)
        ]
        # equivalence with the pinned per-image path across all 12 images
        monkeypatch.setattr(infer_tool.AutoMBController, "observe", orig)
        plain, st2 = self._run(
            tmp_path, monkeypatch, ann, str(root), "both_pi",
            ["--no-auto-micro-batch"],
        )
        assert st2["micro_batch"] == 0
        for a, p in zip(auto, plain):
            assert a["relations"] == p["relations"]
