import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpsg_tpu.data.vocab import INSTANCE_OFFSET
from openpsg_tpu.models.segmenter.fusion import (
    VOID_ID,
    extract_object_lists,
    panoptic_fusion,
)
from openpsg_tpu.models.segmenter.language import TextEncoder, encode_names
from openpsg_tpu.models.segmenter.openseed import (
    OpenSeedSegmenter,
    SegmenterConfig,
    normalize_image,
)
from openpsg_tpu.models.segmenter.swin import SwinTransformer


class TestSwin:
    def test_output_shapes_and_strides(self):
        m = SwinTransformer(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2), window=4)
        x = jnp.zeros((64, 64, 3))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = jax.jit(m.apply)(params, x)
        assert [o.shape for o in outs] == [
            (16, 16, 16), (8, 8, 32), (4, 4, 64), (2, 2, 128)
        ]

    def test_non_window_divisible_input(self):
        """Internal padding must handle sizes not divisible by window."""
        m = SwinTransformer(embed_dim=16, depths=(1, 1), num_heads=(1, 2), window=4)
        x = jnp.zeros((40, 24, 3))  # 40/4=10, 24/4=6 — not multiples of 4 after stride 8
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = jax.jit(m.apply)(params, x)
        assert outs[0].shape == (10, 6, 16)
        assert outs[1].shape == (5, 3, 32)

    def test_shift_changes_output(self):
        """Shifted block must differ from unshifted (mask applied)."""
        from openpsg_tpu.models.segmenter.swin import SwinBlock

        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (8, 8, 16))
        b0 = SwinBlock(16, 2, 4, shift=0)
        b1 = SwinBlock(16, 2, 4, shift=2)
        p = jax.jit(b0.init)(rng, x)
        o0 = jax.jit(b0.apply)(p, x)
        o1 = jax.jit(b1.apply)(p, x)  # same params, shifted windows
        assert not np.allclose(np.asarray(o0), np.asarray(o1))


class TestSegmenterForward:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        cfg = SegmenterConfig.tiny_test()
        m = OpenSeedSegmenter(cfg)
        img = jnp.zeros((64, 64, 3))
        ce = jnp.eye(8, cfg.dim, dtype=jnp.float32)  # 8 fake classes
        params = jax.jit(m.init)(jax.random.PRNGKey(0), img, ce)
        return m, params, ce

    def test_shapes(self, model_and_params):
        m, params, ce = model_and_params
        img = normalize_image(jnp.full((64, 64, 3), 128.0))
        out = jax.jit(m.apply)(params, img, ce)
        Q = m.cfg.num_queries
        assert out["cls_logits"].shape == (Q, 8)
        assert out["masks"].shape == (Q, 16, 16)
        assert out["boxes"].shape == (Q, 4)
        assert out["mask_features"].shape == (16, 16, m.cfg.mask_dim)
        assert np.isfinite(np.asarray(out["cls_logits"])).all()
        assert ((np.asarray(out["boxes"]) >= 0) & (np.asarray(out["boxes"]) <= 1)).all()

    def test_jit_stability(self, model_and_params):
        """Same input twice → identical output (deterministic, no RNG leak)."""
        m, params, ce = model_and_params
        img = normalize_image(jnp.full((64, 64, 3), 77.0))
        f = jax.jit(m.apply)
        o1 = f(params, img, ce)
        o2 = f(params, img, ce)
        np.testing.assert_array_equal(np.asarray(o1["masks"]), np.asarray(o2["masks"]))


class TestPanopticFusion:
    def _mk(self, Q=4, K=6, H=8, W=8):
        cls_logits = np.full((Q, K), -10.0, np.float32)
        masks = np.full((Q, H, W), -10.0, np.float32)
        return cls_logits, masks

    def test_simple_two_things_one_stuff(self):
        # classes: 0,1 things; 2+ stuff (num_things=2)
        cls_logits, masks = self._mk()
        cls_logits[0, 0] = 5.0   # thing class 0
        cls_logits[1, 0] = 5.0   # second instance of class 0
        cls_logits[2, 3] = 5.0   # stuff class 3
        masks[0, :4, :4] = 10.0
        masks[1, 4:, :4] = 10.0
        masks[2, :, 4:] = 10.0
        r = panoptic_fusion(
            jnp.asarray(cls_logits), jnp.asarray(masks),
            cls_mode="sigmoid", object_mask_thr=0.25, iou_thr=0.8,
            instance_mode="per_class", num_things=2,
        )
        pan = np.asarray(r.pan_seg)
        assert pan[0, 0] == 0                      # class 0, instance 0
        assert pan[5, 0] == 0 + INSTANCE_OFFSET    # class 0, instance 1
        assert pan[0, 7] == 3                      # stuff class 3
        ids, scores = extract_object_lists(r)
        assert ids == [0, 3, INSTANCE_OFFSET]
        assert all(0 <= s <= 1 for s in scores)

    def test_void_when_nothing_kept(self):
        cls_logits, masks = self._mk()
        r = panoptic_fusion(jnp.asarray(cls_logits), jnp.asarray(masks), num_things=2)
        assert (np.asarray(r.pan_seg) == VOID_ID).all()
        assert not np.asarray(r.survive).any()
        ids, scores = extract_object_lists(r)
        assert ids == []

    def test_occluded_query_dropped_by_iou(self):
        """A query whose pixels are mostly stolen fails the iou_thr check."""
        cls_logits, masks = self._mk(Q=2, K=4)
        cls_logits[0, 0] = 8.0   # strong, covers everything
        cls_logits[1, 1] = 2.0   # weak, fully overlapped
        masks[0] = 10.0
        masks[1, :2, :2] = 10.0
        r = panoptic_fusion(
            jnp.asarray(cls_logits), jnp.asarray(masks),
            cls_mode="sigmoid", iou_thr=0.8, num_things=2,
        )
        surv = np.asarray(r.survive)
        assert surv[0] and not surv[1]

    def test_stuff_merging_same_class(self):
        cls_logits, masks = self._mk(Q=3, K=5)
        cls_logits[0, 3] = 5.0
        cls_logits[1, 3] = 5.0   # same stuff class, disjoint region
        masks[0, :4] = 10.0
        masks[1, 4:] = 10.0
        r = panoptic_fusion(
            jnp.asarray(cls_logits), jnp.asarray(masks),
            cls_mode="sigmoid", num_things=2, instance_mode="per_class",
        )
        ids, _ = extract_object_lists(r)
        assert ids == [3]                          # merged into one segment
        pan = np.asarray(r.pan_seg)
        assert (pan == 3).all()

    def test_softmax_void_mode(self):
        cls_logits, masks = self._mk(Q=2, K=5)     # last column = void
        cls_logits[0, 0] = 9.0
        cls_logits[1, 4] = 9.0                     # void class → dropped
        masks[0, :4] = 10.0
        masks[1, 4:] = 10.0
        r = panoptic_fusion(
            jnp.asarray(cls_logits), jnp.asarray(masks),
            cls_mode="softmax_void", object_mask_thr=0.8,
            instance_mode="global", num_things=2,
        )
        surv = np.asarray(r.survive)
        assert surv[0] and not surv[1]
        # global mode: first thing instance id starts at 1
        assert int(np.asarray(r.object_ids)[0]) == 0 + INSTANCE_OFFSET * 1


class TestLanguage:
    def test_embeddings_unit_norm_distinct(self):
        enc = TextEncoder(dim=32, depth=1, num_heads=2)
        tokens = jnp.asarray(encode_names(["person", "dog", "sky"]))
        params = jax.jit(enc.init)(jax.random.PRNGKey(0), tokens)["params"]
        emb = np.asarray(jax.jit(enc.apply)({"params": params}, tokens))
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)
        assert not np.allclose(emb[0], emb[1], atol=1e-3)

    def test_padding_invariance(self):
        """Same name in different batch positions → same embedding."""
        enc = TextEncoder(dim=32, depth=1, num_heads=2)
        t1 = jnp.asarray(encode_names(["cat", "a very long class name"]))
        t2 = jnp.asarray(encode_names(["cat"]))
        params = jax.jit(enc.init)(jax.random.PRNGKey(0), t1)["params"]
        e1 = np.asarray(jax.jit(enc.apply)({"params": params}, t1))[0]
        e2 = np.asarray(jax.jit(enc.apply)({"params": params}, t2))[0]
        np.testing.assert_allclose(e1, e2, atol=1e-5)


class TestPanopticFusionAreaMode:
    """Golden test of the 'area' fusion vs a direct loop port of the
    reference's mode='area' branch (maskformer_fusion_relation_head.py:37-63):
    sort kept queries by binary area, paint largest first (later/smaller
    overwrite), thing instance ids count from 1 in paint order, object list
    in paint order with own-mask mean scores."""

    def _reference_area(self, cls_logits, mask_logits, thr, num_things):
        K1 = cls_logits.shape[-1]
        probs = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        scores, labels = probs.max(-1), probs.argmax(-1)
        keep = (labels != K1 - 1) & (scores > thr)
        cur_scores, cur_classes = scores[keep], labels[keep]
        cur_masks = 1.0 / (1.0 + np.exp(-mask_logits[keep]))
        cur_prob = cur_scores[:, None, None] * cur_masks
        h, w = cur_masks.shape[-2:]
        pan = np.full((h, w), 133, np.int32)
        oids, oscores = [], []
        areas = (cur_masks >= 0.5).sum((1, 2))
        order = np.argsort(areas, kind="stable")[::-1]  # descending, hi-idx first in ties
        inst = 1
        for i in order:
            if areas[i] <= 0:
                continue
            m = cur_masks[i] >= 0.5
            score = cur_prob[i][m].mean()
            if cur_classes[i] < num_things:
                oid = int(cur_classes[i] + inst * INSTANCE_OFFSET)
                inst += 1
            else:
                oid = int(cur_classes[i])
            pan[m] = oid
            oids.append(oid)
            oscores.append(float(score))
        return pan, oids, oscores

    def test_golden_vs_reference_loop(self):
        from openpsg_tpu.models.segmenter.fusion import (
            extract_object_lists_area,
            panoptic_fusion_area,
        )

        rng = np.random.default_rng(7)
        for trial in range(5):
            Q, K1, H, W = 8, 5, 16, 16
            cls_logits = rng.normal(0, 3, (Q, K1)).astype(np.float32)
            mask_logits = rng.normal(0, 2, (Q, H, W)).astype(np.float32)
            want_pan, want_ids, want_scores = self._reference_area(
                cls_logits, mask_logits, thr=0.3, num_things=2
            )
            r, pos = panoptic_fusion_area(
                jnp.asarray(cls_logits), jnp.asarray(mask_logits),
                object_mask_thr=0.3, num_things=2,
            )
            # the vectorized path works on all Q queries (invalid masked);
            # map reference's kept-index ids to full-index ids is unneeded —
            # ids are (class, instance) pairs, directly comparable
            np.testing.assert_array_equal(np.asarray(r.pan_seg), want_pan)
            got_ids, got_scores = extract_object_lists_area(r, pos)
            assert got_ids == want_ids
            np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)

    def test_overpainted_stays_listed(self):
        from openpsg_tpu.models.segmenter.fusion import (
            extract_object_lists_area,
            panoptic_fusion_area,
        )

        # big mask fully covered by a smaller later-painted one: both listed
        cls_logits = np.full((2, 3), -10.0, np.float32)
        cls_logits[0, 0] = 8.0
        cls_logits[1, 0] = 8.0
        masks = np.full((2, 8, 8), -10.0, np.float32)
        masks[0, :4, :4] = 10.0          # small
        masks[1] = 10.0                  # covers everything
        r, pos = panoptic_fusion_area(
            jnp.asarray(cls_logits), jnp.asarray(masks),
            object_mask_thr=0.3, num_things=2,
        )
        ids, scores = extract_object_lists_area(r, pos)
        assert len(ids) == 2             # big painted first, small overwrites
        pan = np.asarray(r.pan_seg)
        assert pan[0, 0] == ids[1]       # small (second-painted) wins its region
        assert pan[7, 7] == ids[0]


class TestFusionCandidatePreselection:
    def test_topc_fusion_exact_when_keeps_covered(self):
        """Fusing only the (order-preserved) top-C queries by class score
        is EXACT when every threshold-passing query is among them — the
        memory lever that makes the 300-query decoder affordable
        (PSGv4Config.fusion_candidates)."""
        import numpy as np

        from openpsg_tpu.models.segmenter.fusion import panoptic_fusion

        rng = np.random.default_rng(0)
        Q, K, h, w = 12, 7, 24, 24
        # 4 strong queries pass the 0.25 sigmoid threshold; rest far below
        cls = np.full((Q, K), -6.0, np.float32)
        strong = [1, 4, 7, 9]
        for i, q in enumerate(strong):
            cls[q, i % K] = 3.0
        masks = rng.normal(size=(Q, h, w)).astype(np.float32) - 4.0
        for i, q in enumerate(strong):
            masks[q] = -8.0
            masks[q, (i * 6) % h : (i * 6) % h + 6] = 8.0

        full = panoptic_fusion(
            jnp.asarray(cls), jnp.asarray(masks),
            cls_mode="sigmoid", object_mask_thr=0.25, iou_thr=0.8,
            instance_mode="per_class", num_things=5,
        )
        C = 6
        score = np.max(1 / (1 + np.exp(-cls)), -1)
        cand = np.sort(np.argsort(-score)[:C])
        sub = panoptic_fusion(
            jnp.asarray(cls[cand]), jnp.asarray(masks[cand]),
            cls_mode="sigmoid", object_mask_thr=0.25, iou_thr=0.8,
            instance_mode="per_class", num_things=5,
        )
        np.testing.assert_array_equal(
            np.asarray(full.pan_seg), np.asarray(sub.pan_seg)
        )
        full_ids = np.asarray(full.object_ids)[np.asarray(full.survive)]
        sub_ids = np.asarray(sub.object_ids)[np.asarray(sub.survive)]
        np.testing.assert_array_equal(np.sort(full_ids), np.sort(sub_ids))

    def test_runtime_guard_trips_when_pass_count_exceeds_C(self):
        """VERDICT r3 weak #3: an image where more queries pass
        object_mask_thr than fusion_candidates must WARN host-side (the
        exactness condition is violated; silent divergence otherwise)."""
        import dataclasses as dc
        import warnings

        import jax
        import numpy as np
        import pytest

        from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config

        base = PSGv4Config.tiny_test()
        # random-init class logits ≈ 0 → sigmoid ≈ 0.5 > 0.25: every query
        # passes, so C=2 < pass_count trips the guard deterministically
        cfg = dc.replace(base, fusion_candidates=2)
        m = PSGv4(cfg, jax.random.PRNGKey(0))
        img = np.random.default_rng(0).integers(
            0, 255, (64, 64, 3)
        ).astype(np.float32)
        with pytest.warns(RuntimeWarning, match="fusion_candidates"):
            m.infer(img, (64, 64))

        # unrestricted fusion (C=0) must not warn
        m2 = PSGv4(dc.replace(base, fusion_candidates=0), jax.random.PRNGKey(0))
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            m2.infer(img, (64, 64))
