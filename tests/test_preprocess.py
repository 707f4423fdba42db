"""Preprocessor: mmdet keep-ratio rescale semantics + static buckets."""

import numpy as np
import pytest

from openpsg_tpu.data.preprocess import Preprocessor


class TestRescale:
    def test_keep_ratio_long_side_cap(self):
        p = Preprocessor(scale=(1333, 800))
        # 640x480: factor = min(1333/640, 800/480) = 5/3
        nh, nw = p.rescale_size(480, 640)
        assert (nh, nw) == (800, 1067)

    def test_square_scale(self):
        p = Preprocessor(scale=(1333, 1333))
        nh, nw = p.rescale_size(480, 640)
        # factor = 1333/640
        assert nw == 1333 and nh == int(480 * 1333 / 640 + 0.5)

    def test_bucket_is_static_and_div32(self):
        p = Preprocessor(scale=(1333, 1333))
        assert p.bucket_hw == (1344, 1344)
        assert p.bucket_hw[0] % 32 == 0

    def test_call_pads_to_bucket(self):
        p = Preprocessor(scale=(64, 64))
        img = np.random.default_rng(0).integers(0, 255, (100, 50, 3)).astype(np.uint8)
        out = p(img)
        assert out["image"].shape == (64, 64, 3)
        nh, nw = out["img_shape"]
        assert nh == 64 and nw == 32
        # padding region is zero
        assert out["image"][:, nw:].sum() == 0
        assert out["ori_shape"] == (100, 50)

    def test_upscale_small_image(self):
        p = Preprocessor(scale=(64, 64))
        img = np.zeros((16, 16, 3), np.uint8)
        out = p(img)
        assert out["img_shape"] == (64, 64)  # keep-ratio upscale to fit
