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


class TestFlashSharedKVCrossAttn:
    """Flash shared-KV masked cross-attention vs the plain XLA reference
    (the Q-Former's pair->patches attention, qformer.py)."""

    def _data(self, seed, NP, H, Lq, hd, P, mask_p=0.5):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(NP, H, Lq, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(H, P, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(H, P, hd)), jnp.float32)
        mask = jnp.asarray(rng.random((NP, P)) < mask_p)
        # guard fully-empty rows like the module does
        mask = jnp.where(jnp.any(mask, -1, keepdims=True), mask, True)
        return q, k, v, mask

    @pytest.mark.parametrize("NP,Lq,P,chunk,tile", [
        (6, 5, 40, 16, 4),      # padding on every axis
        (8, 33, 128, 64, 8),    # multi-chunk, aligned pairs
    ])
    def test_matches_reference(self, NP, Lq, P, chunk, tile):
        from openpsg_tpu.ops.pallas.flash_cross_attn import (
            flash_shared_kv_cross_attn,
            shared_kv_cross_attn_reference,
        )

        q, k, v, mask = self._data(0, NP, 2, Lq, 16, P)
        got = flash_shared_kv_cross_attn(
            q, k, v, mask, chunk=chunk, pair_tile=tile, interpret=True
        )
        want = shared_kv_cross_attn_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

    def test_fully_masked_chunk_contributes_zero(self):
        from openpsg_tpu.ops.pallas.flash_cross_attn import (
            flash_shared_kv_cross_attn,
            shared_kv_cross_attn_reference,
        )

        # first chunk entirely masked for pair 0: the -1e9 fill must not
        # leak through the running max (p is mask-multiplied)
        q, k, v, mask = self._data(1, 4, 2, 8, 16, 64, mask_p=1.0)
        mask = mask.at[0, :32].set(False)
        got = flash_shared_kv_cross_attn(
            q, k, v, mask, chunk=32, pair_tile=2, interpret=True
        )
        want = shared_kv_cross_attn_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )

    def test_vmap_matches_per_image_calls(self):
        """infer_batch vmaps the whole per-image pipeline over images
        (psg_v4.py:infer_batch) — the pallas_call must survive that vmap
        with unchanged semantics (r2 advisor finding)."""
        from openpsg_tpu.ops.pallas.flash_cross_attn import (
            flash_shared_kv_cross_attn,
        )

        B = 3
        per = [self._data(s, 6, 2, 5, 16, 40) for s in range(B)]
        qb, kb, vb, mb = (jnp.stack([d[i] for d in per]) for i in range(4))

        got = jax.vmap(
            lambda q, k, v, m: flash_shared_kv_cross_attn(
                q, k, v, m, chunk=16, pair_tile=4, interpret=True
            )
        )(qb, kb, vb, mb)
        for b in range(B):
            want = flash_shared_kv_cross_attn(
                *per[b], chunk=16, pair_tile=4, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(got[b]), np.asarray(want), atol=2e-5, rtol=2e-5
            )

    def test_empty_mask_guard_inside_wrapper(self):
        """An all-False mask row (padding pair) is guarded INSIDE
        _shared_kv_attention so kernel and XLA reference can never
        diverge, regardless of module-level guards (r2 advisor)."""
        from openpsg_tpu.models.relation.qformer import _shared_kv_attention
        from openpsg_tpu.ops.pallas.flash_cross_attn import (
            shared_kv_cross_attn_reference,
        )

        q, k, v, mask = self._data(3, 4, 2, 5, 8, 24)
        mask = mask.at[1].set(False)                   # empty row
        got = _shared_kv_attention(q, k, v, mask)
        want = shared_kv_cross_attn_reference(
            q, k, v, mask.at[1].set(True)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )
        assert bool(jnp.all(jnp.isfinite(got)))

    def test_qformer_grads_flow_through_plain_path(self):
        """The custom_vjp routes AD through the reference path — training
        the Q-Former (its whole job) must produce finite grads."""
        from openpsg_tpu.models.relation.qformer import _shared_kv_attention

        q, k, v, mask = self._data(2, 3, 2, 4, 8, 24)

        def loss(q, k, v):
            return jnp.sum(_shared_kv_attention(q, k, v, mask) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)
        assert float(jnp.max(jnp.abs(g[0]))) > 0
