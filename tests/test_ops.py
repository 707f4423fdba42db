import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpsg_tpu.ops.deform_attn import ms_deform_attn, ms_deform_attn_reference
from openpsg_tpu.ops.mask_ops import (
    downsample_mask_bilinear,
    mask_pool,
    masks_from_idmap,
    pair_or_masks,
)


class TestMSDeformAttn:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_numpy_golden(self, seed):
        rng = np.random.default_rng(seed)
        B, nH, hd, K = 2, 4, 8, 4
        shapes = [(6, 8), (3, 4), (2, 2)]
        Lv = sum(h * w for h, w in shapes)
        Lq = 5
        value = rng.normal(size=(B, Lv, nH, hd)).astype(np.float32)
        # locations span inside, near-border, and out-of-range
        locs = rng.uniform(-0.1, 1.1, size=(B, Lq, nH, len(shapes), K, 2)).astype(np.float32)
        wts = rng.uniform(size=(B, Lq, nH, len(shapes), K)).astype(np.float32)
        wts /= wts.reshape(B, Lq, nH, -1).sum(-1)[..., None, None]

        got = np.asarray(
            jax.jit(
                lambda v, l, w: ms_deform_attn(v, shapes, l, w)
            )(value, locs, wts)
        )
        want = ms_deform_attn_reference(value, shapes, locs, wts)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_torch_grid_sample(self, seed):
        """Independent semantic contract check: the CUDA MSDA kernel the
        reference depends on (mmcv multi_scale_deform_attn, SURVEY §2.9)
        is defined as per-level bilinear ``grid_sample`` with zero padding
        and ``align_corners=False``, weighted-summed over (level, point).
        Build that directly from torch.nn.functional.grid_sample and
        compare — validating our op (and transitively the numpy golden)
        against PyTorch's sampling semantics rather than our own math."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(seed)
        B, nH, hd, K = 2, 2, 4, 4
        shapes = [(5, 7), (3, 4), (2, 2)]
        L = len(shapes)
        Lv = sum(h * w for h, w in shapes)
        Lq = 6
        value = rng.normal(size=(B, Lv, nH, hd)).astype(np.float32)
        locs = rng.uniform(
            -0.2, 1.2, size=(B, Lq, nH, L, K, 2)
        ).astype(np.float32)
        wts = rng.uniform(size=(B, Lq, nH, L, K)).astype(np.float32)
        wts /= wts.reshape(B, Lq, nH, -1).sum(-1)[..., None, None]

        # torch reference: split levels, grid_sample each, weighted sum
        v_t = torch.tensor(value)
        starts = np.cumsum([0] + [h * w for h, w in shapes])
        out_t = torch.zeros(B, Lq, nH, hd)
        for lvl, (h, w) in enumerate(shapes):
            # [B, Lv_l, nH, hd] -> [B*nH, hd, h, w]
            vl = (
                v_t[:, starts[lvl]:starts[lvl + 1]]
                .permute(0, 2, 3, 1)
                .reshape(B * nH, hd, h, w)
            )
            # normalized [0,1] -> grid_sample's [-1,1] (align_corners=False)
            g = torch.tensor(locs[:, :, :, lvl]) * 2.0 - 1.0  # [B,Lq,nH,K,2]
            g = g.permute(0, 2, 1, 3, 4).reshape(B * nH, Lq, K, 2)
            s = F.grid_sample(
                vl, g, mode="bilinear", padding_mode="zeros",
                align_corners=False,
            )  # [B*nH, hd, Lq, K]
            wl = (
                torch.tensor(wts[:, :, :, lvl])
                .permute(0, 2, 1, 3)
                .reshape(B * nH, 1, Lq, K)
            )
            out_t += (
                (s * wl).sum(-1)
                .reshape(B, nH, hd, Lq)
                .permute(0, 3, 1, 2)
            )
        want = out_t.reshape(B, Lq, nH * hd).numpy()

        got = np.asarray(
            jax.jit(lambda v, l, w: ms_deform_attn(v, shapes, l, w))(
                value, locs, wts
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_center_sample_identity(self):
        """Sampling exactly at a pixel center returns that pixel's value."""
        h, w, hd = 4, 4, 8
        value = np.zeros((1, h * w, 1, hd), np.float32)
        value[0, 2 * w + 1, 0] = 7.0  # pixel (y=2, x=1)
        loc = np.array([(1 + 0.5) / w, (2 + 0.5) / h], np.float32).reshape(1, 1, 1, 1, 1, 2)
        wts = np.ones((1, 1, 1, 1, 1), np.float32)
        out = ms_deform_attn(jnp.asarray(value), [(h, w)], jnp.asarray(loc), jnp.asarray(wts))
        np.testing.assert_allclose(np.asarray(out)[0, 0], value[0, 2 * w + 1, 0], atol=1e-6)

    def test_out_of_range_zero(self):
        value = np.ones((1, 16, 2, 4), np.float32)
        loc = np.full((1, 3, 2, 1, 4, 2), 2.0, np.float32)  # far outside
        wts = np.ones((1, 3, 2, 1, 4), np.float32) / 4
        out = ms_deform_attn(jnp.asarray(value), [(4, 4)], jnp.asarray(loc), jnp.asarray(wts))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)

    def test_grad_flows(self):
        shapes = [(4, 4)]
        value = jnp.ones((1, 16, 2, 4))
        locs = jnp.full((1, 2, 2, 1, 4, 2), 0.5)
        wts = jnp.ones((1, 2, 2, 1, 4)) / 4

        def f(v, l, w):
            return jnp.sum(ms_deform_attn(v, shapes, l, w) ** 2)

        grads = jax.grad(f, argnums=(0, 1, 2))(value, locs, wts)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)
        assert float(jnp.abs(grads[0]).sum()) > 0


class TestMaskOps:
    def test_mask_pool_matches_manual(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(16, 8, 8)).astype(np.float32)
        masks = rng.uniform(size=(5, 8, 8)) > 0.5
        out = np.asarray(mask_pool(jnp.asarray(feats), jnp.asarray(masks)))
        for n in range(5):
            sel = feats[:, masks[n]]
            want = sel.mean(axis=1) if sel.shape[1] else np.zeros(16)
            np.testing.assert_allclose(out[n], want, rtol=1e-5, atol=1e-6)

    def test_mask_pool_empty_mask_zero(self):
        feats = jnp.ones((4, 4, 4))
        masks = jnp.zeros((2, 4, 4), bool)
        out = np.asarray(mask_pool(feats, masks))
        np.testing.assert_allclose(out, 0.0)

    def test_pair_or_masks_ordering(self):
        masks = jnp.asarray(np.eye(3, 5, dtype=bool))  # 3 masks over 5 positions
        pairs = np.asarray(pair_or_masks(masks))
        assert pairs.shape == (3, 3, 5)
        # pair (i, j) = mask_i OR mask_j; flattening i*N+j is pair-major
        for i in range(3):
            for j in range(3):
                np.testing.assert_array_equal(
                    pairs[i, j], np.asarray(masks[i]) | np.asarray(masks[j])
                )

    def test_downsample_bilinear_threshold(self):
        m = np.zeros((1, 8, 8), np.float32)
        m[0, :4, :4] = 1.0
        out = np.asarray(downsample_mask_bilinear(jnp.asarray(m), (4, 4)))
        assert out.dtype == bool
        assert out[0, :2, :2].all() and not out[0, 2:, 2:].any()

    def test_masks_from_idmap(self):
        idmap = jnp.asarray([[1, 1, 2], [3, 2, 2]])
        ids = jnp.asarray([2, 1])
        out = np.asarray(masks_from_idmap(idmap, ids))
        np.testing.assert_array_equal(out[0], np.asarray(idmap) == 2)
        np.testing.assert_array_equal(out[1], np.asarray(idmap) == 1)


class TestSinePosEmbed:
    def test_matches_d2_position_embedding_sine(self):
        """The pixel/query decoders' key position embeddings must match
        d2/mmdet ``PositionEmbeddingSine(normalize=True)`` exactly —
        trained Mask2Former/OpenSeeD checkpoints bake in its cumsum
        coordinate convention ((i+1)/(H+1e-6), NOT pixel centers) and its
        interleaved sin/cos layout.  Torch mirror written independently
        from the published formula (detectron2 position_encoding.py;
        mmdet SinePositionalEncoding offset=0)."""
        import torch

        from openpsg_tpu.models.segmenter.deform_layers import (
            make_cumsum_points,
            sine_pos_embed,
        )

        h, w, dim = 5, 7, 16
        half = dim // 2

        not_mask = torch.ones(1, h, w)
        y_embed = not_mask.cumsum(1, dtype=torch.float32)
        x_embed = not_mask.cumsum(2, dtype=torch.float32)
        eps, scale = 1e-6, 2 * np.pi
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
        dim_t = torch.arange(half, dtype=torch.float32)
        dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / half)
        pos_x = x_embed[:, :, :, None] / dim_t
        pos_y = y_embed[:, :, :, None] / dim_t
        pos_x = torch.stack(
            (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4
        ).flatten(3)
        pos_y = torch.stack(
            (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4
        ).flatten(3)
        want = torch.cat((pos_y, pos_x), dim=3).numpy()[0].reshape(h * w, dim)

        got = np.asarray(
            sine_pos_embed(jnp.asarray(make_cumsum_points([(h, w)])), dim)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestResizeMasksGolden:
    def test_matches_torch_interpolate_downscale(self):
        """downsample_mask_bilinear's docstring claims F.interpolate(bilinear,
        align_corners=False) > 0.5 parity — pin it on a DOWNSCALE, where
        jax.image.resize's default antialiased kernel would diverge
        (antialias=False is load-bearing for the reference's pair-mask
        patch grids, relation_transformer_head_v4.py:401-404)."""
        import torch
        import torch.nn.functional as F


        rng = np.random.default_rng(2)
        masks = rng.uniform(size=(6, 33, 47)) > 0.6
        out_hw = (9, 12)
        want = (
            F.interpolate(
                torch.tensor(masks, dtype=torch.float32)[None],
                size=out_hw, mode="bilinear", align_corners=False,
            )[0].numpy() > 0.5
        )
        got = np.asarray(
            downsample_mask_bilinear(jnp.asarray(masks), out_hw)
        )
        np.testing.assert_array_equal(got, want)


class TestMSDAPointPruning:
    """points_per_level — the deploy-time encoder pruning knob
    (PARITY.md: the pixel decoder is gather-rate bound; dropped points
    are time off the bill).  Semantics: identical to slicing each
    level's points to its first K_l and using the weights as given."""

    def _inputs(self, seed=0):
        rng = np.random.default_rng(seed)
        B, nH, hd, K = 1, 2, 8, 4
        shapes = [(6, 8), (3, 4), (2, 2)]
        Lv = sum(h * w for h, w in shapes)
        Lq = 5
        value = rng.normal(size=(B, Lv, nH, hd)).astype(np.float32)
        locs = rng.uniform(0, 1, (B, Lq, nH, len(shapes), K, 2)).astype(np.float32)
        wts = rng.uniform(size=(B, Lq, nH, len(shapes), K)).astype(np.float32)
        wts /= wts.reshape(B, Lq, nH, -1).sum(-1)[..., None, None]
        return shapes, value, locs, wts

    def test_full_points_is_identity(self):
        shapes, value, locs, wts = self._inputs()
        a = ms_deform_attn(value, shapes, locs, wts)
        b = ms_deform_attn(value, shapes, locs, wts,
                           points_per_level=(4, 4, 4))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_pruned_matches_zeroed_weights(self):
        """Keeping K_l points == zeroing the dropped points' weights in
        the exact op (the gathers just never happen)."""
        shapes, value, locs, wts = self._inputs(1)
        kpl = (2, 4, 1)
        got = np.asarray(
            jax.jit(lambda v, l, w: ms_deform_attn(
                v, shapes, l, w, points_per_level=kpl
            ))(value, locs, wts)
        )
        wz = wts.copy()
        for lvl, kl in enumerate(kpl):
            wz[:, :, :, lvl, kl:] = 0.0
        want = np.asarray(ms_deform_attn(value, shapes, locs, wz))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_layer_knob_renormalizes_and_keeps_params(self):
        """MSDeformAttnLayer with points_per_level: same param tree as
        parity (checkpoints load as-is), output == full layer whose
        softmax is renormalized over the kept subset."""
        from openpsg_tpu.models.segmenter.deform_layers import (
            MSDeformAttnLayer,
        )

        rng = np.random.default_rng(0)
        shapes = ((4, 4), (2, 2))
        Lv = sum(h * w for h, w in shapes)
        q = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(Lv, 16)).astype(np.float32))
        ref = jnp.asarray(rng.uniform(0.2, 0.8, (6, 2)).astype(np.float32))

        full = MSDeformAttnLayer(16, 2, 2, 4)
        pruned = MSDeformAttnLayer(16, 2, 2, 4, points_per_level=(2, 4))
        params = full.init(jax.random.PRNGKey(0), q, v, shapes, ref)
        # identical trees: the pruned module loads parity weights as-is
        chex = jax.tree_util.tree_structure
        p2 = pruned.init(jax.random.PRNGKey(0), q, v, shapes, ref)
        assert chex(params) == chex(p2)

        out_full = np.asarray(full.apply(params, q, v, shapes, ref))
        out_pruned = np.asarray(pruned.apply(params, q, v, shapes, ref))
        # the knob is live (weights at init are zeros -> uniform softmax,
        # so pruning genuinely changes the combination)
        assert not np.allclose(out_full, out_pruned)

        # semantics: == full op on weights renormalized over kept points
        # (reproduce by masking the softmax the same way)
        import flax.linen as fnn

        class Mirror(fnn.Module):
            @fnn.compact
            def __call__(self, q, v, shapes, ref):
                return MSDeformAttnLayer(16, 2, 2, 4, name="m")(
                    q, v, shapes, ref
                )

        # cross-check via ms_deform_attn directly: extract the projections
        sub = params["params"]
        import numpy as _np

        def dense(x, p):
            return x @ _np.asarray(p["kernel"]) + _np.asarray(p["bias"])

        vv = dense(np.asarray(v), sub["value_proj"]).reshape(1, Lv, 2, 8)
        off = dense(np.asarray(q), sub["sampling_offsets"]).reshape(
            1, 6, 2, 2, 4, 2
        )
        aw = dense(np.asarray(q), sub["attention_weights"]).reshape(
            1, 6, 2, 2 * 4
        )
        aw = np.asarray(jax.nn.softmax(aw, -1)).reshape(1, 6, 2, 2, 4)
        keep = np.zeros((2, 4), np.float32)
        keep[0, :2] = 1
        keep[1, :] = 1
        awk = aw * keep
        awk = awk / awk.sum((-2, -1), keepdims=True)
        sizes = np.asarray([(w, h) for h, w in shapes], np.float32)
        loc = (
            np.asarray(ref)[None, :, None, None, None, :]
            + off / sizes[None, None, None, :, None, :]
        )
        core = np.asarray(
            ms_deform_attn(vv, shapes, loc, awk, points_per_level=(2, 4))
        )[0]
        want = dense(core.reshape(6, 16), sub["output_proj"])
        np.testing.assert_allclose(out_pruned, want, rtol=2e-4, atol=2e-4)
