"""Native pan-codec vs numpy reference + fallback behavior."""

import numpy as np
import pytest

from openpsg_tpu import native
from openpsg_tpu.utils.panoptic import id2rgb as np_id2rgb, rgb2id as np_rgb2id


@pytest.fixture(scope="module")
def idmap():
    rng = np.random.default_rng(0)
    ids = rng.choice([0, 7, 1007, 133, 70000], size=(64, 48)).astype(np.int32)
    return ids


class TestNative:
    def test_builds(self):
        assert native.is_native(), "C++ codec failed to build (g++ present?)"

    def test_rgb2id_matches_numpy(self, idmap):
        rgb = np_id2rgb(idmap)
        np.testing.assert_array_equal(native.rgb2id(rgb), np_rgb2id(rgb))

    def test_id2rgb_roundtrip(self, idmap):
        np.testing.assert_array_equal(
            native.rgb2id(native.id2rgb(idmap)), idmap
        )

    def test_masks_match_numpy_fallback(self, idmap):
        segs = [7, 1007, 70000, 999999]  # incl. a missing id
        got = native.extract_masks_downsampled(idmap, segs, (16, 12))
        want = native._np_masks(idmap, np.asarray(segs, np.int32), (16, 12))
        np.testing.assert_array_equal(got, want)
        assert got[3].sum() == 0  # missing id → empty mask

    def test_fused_rgb_path(self, idmap):
        rgb = np_id2rgb(idmap)
        segs = [7, 70000]
        got = native.rgb_to_masks_downsampled(rgb, segs, (16, 12))
        want = native.extract_masks_downsampled(idmap, segs, (16, 12))
        np.testing.assert_array_equal(got, want)

    def test_matches_jax_nearest(self, idmap):
        """The fused downsample must agree with jax.image.resize nearest
        (the device path in masks_from_idmap + downsample_nearest)."""
        import jax.numpy as jnp

        from openpsg_tpu.ops.mask_ops import downsample_nearest

        small = np.asarray(downsample_nearest(jnp.asarray(idmap), (16, 12)))
        segs = [7, 1007]
        got = native.extract_masks_downsampled(idmap, segs, (16, 12))
        for i, s in enumerate(segs):
            np.testing.assert_array_equal(got[i].astype(bool), small == s)


class TestPaintEncode:
    """paint_index + encode_palette_png — the submission/serve fast path
    (tools/bench_host.py: 3 → 60 img/s host; VERDICT r3 next #8)."""

    def test_paint_index_matches_fallback(self, idmap):
        segs = [1007, 7, 70000, 424242]   # unsorted + a missing id
        got = native.paint_index(idmap, segs)
        # force the numpy fallback (same public contract)
        lib, native._lib = native._lib, None
        try:
            want = native.paint_index(idmap, segs)
        finally:
            native._lib = lib
        np.testing.assert_array_equal(got, want)
        # index semantics: 0 = background, s+1 = position in the seg list
        assert got[idmap == 7].tolist() == [2] * int((idmap == 7).sum())
        assert (got[idmap == 133] == 0).all()

    def test_paint_index_empty_and_many(self, idmap):
        np.testing.assert_array_equal(
            native.paint_index(idmap, []), np.zeros(idmap.shape, np.uint8)
        )
        # >254 segments routes to the fallback and still works
        segs = list(range(300))
        out = native.paint_index(idmap, segs)
        assert (out[idmap == 7] == 8).all()

    def test_palette_png_cv2_roundtrip(self, idmap):
        """cv2 must decode the native palette PNG to EXACTLY the BGR image
        the old cv2.imwrite path produced (the grader reads with
        cv2.imread, tools/grade.py:37)."""
        import cv2

        if not native.is_native():
            pytest.skip("no native codec")
        segs = [7, 1007, 70000]
        idx = native.paint_index(idmap, segs)
        rng = np.random.default_rng(3)
        palette = np.concatenate(
            [np.zeros((1, 3), np.uint8),
             rng.integers(1, 255, (len(segs), 3)).astype(np.uint8)]
        )
        png = native.encode_palette_png(idx, palette)
        dec = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(dec, palette[..., ::-1][idx])

    def test_palette_png_large_random(self):
        """Full-res worst case: random (incompressible) index map still
        encodes + round-trips (buffer sizing, zlib framing)."""
        import cv2

        if not native.is_native():
            pytest.skip("no native codec")
        rng = np.random.default_rng(0)
        idx = rng.integers(0, 255, (1344, 1344)).astype(np.uint8)
        palette = rng.integers(0, 255, (256, 3)).astype(np.uint8)
        png = native.encode_palette_png(idx, palette)
        assert png is not None
        dec = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(dec, palette[..., ::-1][idx])

    def test_writer_grader_semantics(self, tmp_path):
        """SubmissionWriter's palette PNG must give the grader the same
        rgb2id ids as segments_info advertises."""
        import cv2

        from openpsg_tpu.utils.submission import SubmissionWriter

        pan = np.full((40, 30), 133, np.int64)
        pan[:20, :15] = 2
        pan[20:, 15:] = 1007
        w = SubmissionWriter(str(tmp_path), seed=5)
        w.add(pan, [2, 1007], [[0, 1, 3]])
        png = cv2.imread(str(tmp_path / "submission" / "panseg" / "0.png"))
        ids = np_rgb2id(png[..., ::-1])
        import json

        rec = json.load(open(w.finalize()))[0]
        seg_ids = [s["id"] for s in rec["segments_info"]]
        assert set(np.unique(ids)) == {0, *seg_ids}
        np.testing.assert_array_equal(ids[:20, :15] == seg_ids[0],
                                      np.ones((20, 15), bool))
