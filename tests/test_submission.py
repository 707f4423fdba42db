"""Submission writer ↔ reader round-trip (the HiLo format contract)."""

import json
import os

import numpy as np
import pytest

from openpsg_tpu.data.vocab import INSTANCE_OFFSET
from openpsg_tpu.utils.panoptic import rgb2id
from openpsg_tpu.utils.submission import SubmissionWriter


@pytest.fixture()
def written(tmp_path):
    w = SubmissionWriter(str(tmp_path), seed=7)
    pan = np.full((32, 32), 133, np.int64)
    pan[:16, :] = 5                      # stuff class 5
    pan[16:, :16] = 2 + INSTANCE_OFFSET  # thing class 2, instance 1
    w.add(pan, [5, 2 + INSTANCE_OFFSET, 133], [[0, 1, 4]], test_idx=0)
    w.add(np.full((8, 8), 133, np.int64), [], [], test_idx=1)  # empty image
    path = w.finalize()
    return tmp_path, path, pan


class TestSubmission:
    def test_json_schema(self, written):
        tmp, path, _ = written
        recs = json.load(open(path))
        assert len(recs) == 2
        r0 = recs[0]
        assert r0["relations"] == [[0, 1, 5]]          # predicate 1-indexed
        assert [s["category_id"] for s in r0["segments_info"]] == [6, 3]
        # oid 133 skipped entirely
        assert r0["pan_seg_file_name"] == "0.png"

    def test_dummy_fill(self, written):
        tmp, path, _ = written
        r1 = json.load(open(path))[1]
        assert r1["relations"] == [[0, 0, 1]]          # [[0,0,0]] + 1-index
        assert len(r1["segments_info"]) == 1           # dummy segment

    def test_png_roundtrip(self, written):
        import cv2

        tmp, path, pan = written
        png = cv2.imread(os.path.join(str(tmp), "submission", "panseg", "0.png"))
        ids = rgb2id(png[..., ::-1])
        recs = json.load(open(path))
        seg_ids = [s["id"] for s in recs[0]["segments_info"]]
        # segment ids present in the PNG exactly where the pan map had them
        np.testing.assert_array_equal(ids[:16, :] == seg_ids[0], True)
        np.testing.assert_array_equal(ids[16:, :16] == seg_ids[1], True)
        assert (ids[16:, 16:] == 0).all()              # void stays black

    def test_out_of_order_add_is_reordered(self, tmp_path):
        """tools/infer.py groups images by resolution bucket, so add()
        arrives out of dataset order; relation.json is positional and must
        come back sorted by test_idx."""
        w = SubmissionWriter(str(tmp_path), seed=1)
        pan = np.full((8, 8), 7, np.int64)
        w.add(pan, [7], [[0, 0, 3]], test_idx=2)
        w.add(pan, [7], [[0, 0, 1]], test_idx=0)
        w.add(pan, [7], [[0, 0, 2]], test_idx=1)
        recs = json.load(open(w.finalize()))
        assert [r["relations"][0][2] for r in recs] == [2, 3, 4]  # +1-indexed
        assert [r["pan_seg_file_name"] for r in recs] == [
            "0.png", "1.png", "2.png"
        ]

    def test_seeded_reproducible(self, tmp_path):
        pan = np.full((8, 8), 7, np.int64)
        w1 = SubmissionWriter(str(tmp_path / "a"), seed=3)
        w1.add(pan, [7], [])
        w2 = SubmissionWriter(str(tmp_path / "b"), seed=3)
        w2.add(pan, [7], [])
        assert (
            json.loads(json.dumps(w1.results)) == json.loads(json.dumps(w2.results))
        )
