import numpy as np

from openpsg_tpu.data.vocab import INSTANCE_OFFSET
from openpsg_tpu.eval.pq import VOID, panoptic_quality
from openpsg_tpu.eval.sgg_metrics import sgg_recall


def _map(h, w, segs):
    """segs: [(oid, y0, y1, x0, x1)]"""
    m = np.full((h, w), VOID, np.int64)
    for oid, y0, y1, x0, x1 in segs:
        m[y0:y1, x0:x1] = oid
    return m


class TestPQ:
    def test_perfect_prediction(self):
        gt = _map(16, 16, [(5, 0, 8, 0, 16), (7 + INSTANCE_OFFSET, 8, 16, 0, 16)])
        res = panoptic_quality([(gt.copy(), gt)])
        assert res["PQ"] == 100.0
        assert res["SQ"] == 100.0
        assert res["n_classes_present"] == 2

    def test_miss_and_false_positive(self):
        gt = _map(16, 16, [(5, 0, 8, 0, 16)])
        pred = _map(16, 16, [(9, 8, 16, 0, 16)])  # wrong class & location
        res = panoptic_quality([(pred, gt)])
        assert res["PQ"] == 0.0

    def test_partial_overlap(self):
        gt = _map(16, 16, [(5, 0, 10, 0, 16)])
        pred = _map(16, 16, [(5, 0, 8, 0, 16)])   # IoU = 8/10 = 0.8 > 0.5
        res = panoptic_quality([(pred, gt)])
        assert 0 < res["PQ"] < 100
        np.testing.assert_allclose(res["PQ"], 80.0, atol=0.1)

    def test_class_mismatch_not_matched(self):
        gt = _map(16, 16, [(5, 0, 16, 0, 16)])
        pred = _map(16, 16, [(6, 0, 16, 0, 16)])  # same pixels, wrong class
        res = panoptic_quality([(pred, gt)])
        assert res["PQ"] == 0.0

    def test_void_overlap_excluded_from_union(self):
        # gt: class-5 covers rows 0-8, rest is void; pred class-5 covers all
        # 16 rows.  Raw IoU = 8/16 = 0.5 (no match) but the official metric
        # removes the 8 void rows from the union → IoU = 1.0.
        gt = _map(16, 16, [(5, 0, 8, 0, 16)])
        pred = _map(16, 16, [(5, 0, 16, 0, 16)])
        res = panoptic_quality([(pred, gt)])
        assert res["PQ"] == 100.0

    def test_mostly_void_pred_not_fp(self):
        # unmatched pred segment with >50% void overlap is ignored, not FP
        gt = _map(16, 16, [(5, 0, 8, 0, 16)])          # rows 8-16 void
        pred = _map(16, 16, [(5, 0, 8, 0, 16), (9, 7, 16, 0, 16)])
        # pred seg 9 overwrites row 7: rows 7-16 (9 rows), 8 void → 89% void
        # pred seg 5 keeps rows 0-7: IoU vs gt = 7/8 = 0.875 → matched
        res = panoptic_quality([(pred, gt)])
        np.testing.assert_allclose(res["PQ"], 87.5)  # void FP discarded

    def test_half_void_pred_still_fp(self):
        # unmatched pred seg exactly 50% void-covered: NOT discarded (>0.5
        # is strict), so it counts as a false positive
        gt = _map(16, 16, [(5, 0, 8, 0, 16)])          # rows 8-16 void
        pred = _map(16, 16, [(5, 0, 5, 0, 16), (9, 5, 11, 0, 16)])
        # pred seg 9: rows 5-11 (6 rows), 3 of them void → exactly 0.5
        res = panoptic_quality([(pred, gt)])
        assert 0.0 < res["PQ"] < 100.0


class TestSGGRecall:
    def _image(self):
        H = W = 8
        a = np.zeros((H, W), bool); a[:4] = True
        b = np.zeros((H, W), bool); b[4:] = True
        return {
            "pred_masks": [a, b],
            "gt_masks": [a.copy(), b.copy()],
            "pred_triplets": [[0, 1, 3], [1, 0, 7]],
            "gt_triplets": [[0, 1, 3]],
        }

    def test_perfect_recall(self):
        res = sgg_recall([self._image()], ks=(20,))
        assert res["R@20"] == 100.0
        assert res["mR@20"] == 100.0

    def test_wrong_predicate_no_match(self):
        im = self._image()
        im["pred_triplets"] = [[0, 1, 9]]
        res = sgg_recall([im], ks=(20,))
        assert res["R@20"] == 0.0

    def test_rank_cutoff(self):
        im = self._image()
        im["pred_triplets"] = [[1, 0, 9]] * 20 + [[0, 1, 3]]  # correct at rank 21
        res = sgg_recall([im], ks=(20, 50))
        assert res["R@20"] == 0.0
        assert res["R@50"] == 100.0

    def test_wrong_object_class_no_match(self):
        # same masks, but the predicted subject carries the wrong category:
        # the PSG protocol requires label equality, not just IoU > 0.5
        im = self._image()
        im["pred_labels"] = [11, 22]
        im["gt_labels"] = [10, 22]
        res = sgg_recall([im], ks=(20,))
        assert res["R@20"] == 0.0

    def test_labels_matching_recovers_recall(self):
        im = self._image()
        im["pred_labels"] = [10, 22]
        im["gt_labels"] = [10, 22]
        res = sgg_recall([im], ks=(20,))
        assert res["R@20"] == 100.0

    def test_mean_recall_per_class(self):
        im1 = self._image()                       # predicate 3 matched
        im2 = self._image()
        im2["gt_triplets"] = [[0, 1, 10]]         # predicate 10 NOT matched
        im2["pred_triplets"] = [[0, 1, 3]]
        res = sgg_recall([im1, im2], ks=(20,))
        assert res["R@20"] == 50.0
        assert res["mR@20"] == 50.0               # (100 for cls3 + 0 for cls10)/2
