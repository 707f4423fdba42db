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
