"""tools/bench_family.py: one JSON line per closed-set generation.

Mirrors bench.py's slope methodology for v1/v2/v3 (the non-LLM-decode
family); the tiny CPU path (BENCH_TINY=1) drives the same code the real
TPU run takes — config load → build_detector_from_config → chained-scan
timing — at test scale."""

import json

import pytest


class TestBenchFamily:
    def test_tiny_smoke_all_families(self, monkeypatch, capsys):
        monkeypatch.setenv("BENCH_TINY", "1")
        monkeypatch.setenv("BENCH_ITERS", "2")
        monkeypatch.setenv("BENCH_FAMILY", "v1,v2,v3")
        import tools.bench_family as bf

        bf.main()
        out = [
            json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()
            if ln.startswith("{")
        ]
        assert [o["metric"] for o in out] == [
            "psg_v1_e2e_infer_img_per_s@tiny64px",
            "psg_v2_e2e_infer_img_per_s@tiny64px",
            "psg_v3_e2e_infer_img_per_s@tiny64px",
        ]
        for o in out:
            assert o["value"] > 0
            assert o["unit"] == "images/sec/chip"
            assert o["vs_baseline"] == pytest.approx(o["value"] / 2.5, rel=1e-3)
            assert o["detail"]["step_ms"] > 0
