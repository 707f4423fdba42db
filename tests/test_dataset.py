"""PSG dataset reader + loader on the synthetic fixture."""

import numpy as np
import pytest

from fixtures import make_fixture
from openpsg_tpu.data.preprocess import Preprocessor
from openpsg_tpu.data.psg_dataset import PSGDataset


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("psg")
    make_fixture(str(root), n_images=4, hw=(96, 64))
    return str(root)


class TestDataset:
    def test_split_semantics(self, fixture_root):
        train = PSGDataset(f"{fixture_root}/psg.json", split="train")
        test = PSGDataset(f"{fixture_root}/psg.json", split="test")
        assert len(train) == 2 and len(test) == 2
        train_ids = {r.image_id for r in train.records}
        test_ids = {r.image_id for r in test.records}
        assert not (train_ids & test_ids)

    def test_load_example_shapes_and_masks(self, fixture_root):
        ds = PSGDataset(
            f"{fixture_root}/psg.json", img_prefix=fixture_root,
            seg_prefix=fixture_root, split="train",
        )
        pre = Preprocessor(scale=(64, 64))
        ex = ds.load_example(0, pre, max_objects=8, flip_prob=0.0)
        assert ex["image"].shape == (64, 64, 3)
        assert ex["object_masks"].shape == (8, 16, 16)
        assert ex["object_valid"][:3].all() and not ex["object_valid"][3:].any()
        # three disjoint GT segments cover the valid region
        nh, nw = ex["img_shape"]
        oh, ow = nh // 4, nw // 4
        union = ex["object_masks"][:3].sum(0)
        assert (union[:oh, :ow] == 1).all()      # disjoint and covering
        assert union[oh:, :].sum() == 0          # nothing in padding
        # relation target built from GT triplets
        assert ex["relation_target"][0, 2, 4] == 1
        assert ex["relation_target"][1, 0, 23] == 1
        assert ex["relation_target"].sum() == 2
        # labels in segments_info order
        np.testing.assert_array_equal(ex["object_labels"][:3], [0, 16, 119])

    def test_flip_consistency(self, fixture_root):
        """Flipping must flip image and masks together."""
        ds = PSGDataset(
            f"{fixture_root}/psg.json", img_prefix=fixture_root,
            seg_prefix=fixture_root, split="train",
        )
        pre = Preprocessor(scale=(64, 64))
        rng = np.random.default_rng(0)
        ex_f = ds.load_example(0, pre, max_objects=8, flip_prob=1.0, rng=rng)
        ex_n = ds.load_example(0, pre, max_objects=8, flip_prob=0.0)
        nh, nw = ex_n["img_shape"]
        ow = nw // 4
        m_n = ex_n["object_masks"][0][:, :ow]
        m_f = ex_f["object_masks"][0][:, :ow]
        np.testing.assert_array_equal(m_f, m_n[:, ::-1])

    def test_iter_train_batches(self, fixture_root):
        ds = PSGDataset(
            f"{fixture_root}/psg.json", img_prefix=fixture_root,
            seg_prefix=fixture_root, split="train",
        )
        pre = Preprocessor(scale=(64, 64))
        batches = list(ds.iter_train(pre, max_objects=8, batch_size=2, epochs=2))
        assert len(batches) == 2  # 2 images / bs 2 × 2 epochs
        assert len(batches[0]) == 2

    def test_filter_no_relation(self, fixture_root):
        import json

        with open(f"{fixture_root}/psg.json") as f:
            raw = json.load(f)
        raw["data"][3]["relations"] = []
        import tempfile, os

        p = os.path.join(fixture_root, "norel.json")
        with open(p, "w") as f:
            json.dump(raw, f)
        ds = PSGDataset(p, split="test", filter_no_relation=True)
        assert len(ds) == 1


class TestScaleJitter:
    def test_iter_train_varies_scale(self, fixture_root):
        """Large-scale jitter (reference Resize range, baseline_v4_ov.py:
        86-91): short sides differ across examples, bucket stays static."""
        ds = PSGDataset(
            f"{fixture_root}/psg.json", img_prefix=fixture_root,
            seg_prefix=fixture_root, split="train",
        )
        pre = Preprocessor(scale=(64, 64))
        shapes = set()
        for batch in ds.iter_train(
            pre, 8, 1, seed=0, scale_jitter=(24, 60), epochs=4
        ):
            for e in batch:
                assert e["image"].shape == (64, 64, 3)  # static bucket
                shapes.add(tuple(e["img_shape"]))
        assert len(shapes) > 1, shapes

    def test_small_dataset_still_yields_a_batch(self, fixture_root):
        ds = PSGDataset(
            f"{fixture_root}/psg.json", img_prefix=fixture_root,
            seg_prefix=fixture_root, split="train",
        )
        pre = Preprocessor(scale=(64, 64))
        batches = list(ds.iter_train(pre, 8, batch_size=8, seed=0))
        assert len(batches) == 1 and len(batches[0]) == 8
