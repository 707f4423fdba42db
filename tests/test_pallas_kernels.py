"""Pallas sparse one-hot gather kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpsg_tpu.ops.pallas.msda_gather import sparse_row_gather


class TestSparseRowGather:
    @pytest.mark.parametrize("seed,S,HW", [(0, 700, 1000), (1, 513, 300)])
    def test_matches_take(self, seed, S, HW):
        rng = np.random.default_rng(seed)
        nH, C = 3, 128
        quad = jnp.asarray(rng.normal(size=(nH, HW, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, HW, (nH, S)), jnp.int32)
        out = sparse_row_gather(quad, idx, tq=128, tv=256, interpret=True)
        want = np.stack([np.asarray(quad)[h][np.asarray(idx)[h]] for h in range(nH)])
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)

    def test_local_indices(self):
        """Raster-local indices (the deformable regime) stay exact."""
        rng = np.random.default_rng(2)
        nH, HW, C, S = 2, 2048, 128, 1024
        quad = jnp.asarray(rng.normal(size=(nH, HW, C)), jnp.float32)
        base = np.arange(S) * 2 % HW
        idx = np.clip(base + rng.integers(-32, 32, S), 0, HW - 1)
        idx = jnp.asarray(np.tile(idx[None], (nH, 1)), jnp.int32)
        out = sparse_row_gather(quad, idx, tq=256, tv=256, interpret=True)
        want = np.stack([np.asarray(quad)[h][np.asarray(idx)[h]] for h in range(nH)])
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
