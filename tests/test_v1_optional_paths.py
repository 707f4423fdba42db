"""v1 detector optional embellishments (VERDICT r3 next #6).

Reference surface: mask-pooled sine positional encoding, inverse-mask
background feature, and object_token_size>1 chunked mask pooling
(kings_sgg/models/detectors/mask2former_relation.py:111-199, 289-315).
Every shipping reference config disables them (baseline_r50.py:162-163),
so these tests pin module-surface completeness: semantics goldens for the
new ops, config-driven build, one train step, and inference.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------- goldens
def reference_mask_pooling(feature, mask, output_size):
    """Literal numpy port of the reference `_mask_pooling`
    (mask2former_relation.py:84-109) as a golden fixture."""
    C = feature.shape[0]
    if mask.sum() <= 0:
        return np.zeros((output_size, C), feature.dtype)
    feats = feature[:, (mask >= 0.5)[0]]          # [C, n] scan order
    if feats.shape[1] < output_size:
        reps = int(np.ceil(output_size / feats.shape[1]))
        feats = np.concatenate([feats] * reps, axis=1)[:, :output_size]
    split = [feats.shape[1] // output_size] * output_size
    for idx in range(feats.shape[1] - sum(split)):
        split[idx] += 1
    out, s = [], 0
    for ln in split:
        out.append(feats[:, s : s + ln].mean(axis=1))
        s += ln
    return np.stack(out, axis=0)                  # [S, C]


class TestMaskPoolChunked:
    @pytest.mark.parametrize("size", [1, 2, 3, 5])
    def test_matches_reference_semantics(self, size):
        from openpsg_tpu.ops.mask_ops import mask_pool_chunked

        rng = np.random.default_rng(0)
        C, H, W = 7, 6, 9
        feat = rng.normal(size=(C, H, W)).astype(np.float32)
        masks = []
        # empty, single-pixel, small (n < S), big (n >= S), full
        masks.append(np.zeros((H, W), bool))
        one = np.zeros((H, W), bool); one[3, 4] = True
        masks.append(one)
        two = np.zeros((H, W), bool); two[1, 2] = two[4, 7] = True
        masks.append(two)
        masks.append(rng.uniform(size=(H, W)) > 0.5)
        masks.append(np.ones((H, W), bool))
        masks = np.stack(masks)

        got = np.asarray(mask_pool_chunked(
            jnp.asarray(feat), jnp.asarray(masks), size
        ))
        for i in range(masks.shape[0]):
            want = reference_mask_pooling(feat, masks[i : i + 1], size)
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)

    def test_jit_and_grad(self):
        from openpsg_tpu.ops.mask_ops import mask_pool_chunked

        rng = np.random.default_rng(1)
        feat = jnp.asarray(rng.normal(size=(4, 8, 8)).astype(np.float32))
        masks = jnp.asarray(rng.uniform(size=(3, 8, 8)) > 0.6)

        fn = jax.jit(lambda f: mask_pool_chunked(f, masks, 2).sum())
        g = jax.grad(fn)(feat)
        assert np.isfinite(float(fn(feat)))
        assert np.isfinite(np.asarray(g)).all()


class TestSinePEGolden:
    def test_matches_mmdet_sine_positional_encoding(self):
        """Grid PE used by `use_positional_encoding` == mmdet
        SinePositionalEncoding(num_feats=D/2, normalize=True) on an
        all-valid mask (torch mirror, the convention the reference builds
        via build_positional_encoding at relation_transformer_head.py:70)."""
        torch = pytest.importorskip("torch")

        from openpsg_tpu.models.segmenter.deform_layers import (
            make_cumsum_points,
            sine_pos_embed,
        )

        h, w, D = 5, 7, 16
        ours = np.asarray(
            sine_pos_embed(jnp.asarray(make_cumsum_points([(h, w)])), D)
        )

        nm = torch.ones(1, h, w)
        ye = nm.cumsum(1) / (h + 1e-6) * (2 * np.pi)
        xe = nm.cumsum(2) / (w + 1e-6) * (2 * np.pi)
        half = D // 2
        dim_t = 10000.0 ** (
            2 * torch.div(torch.arange(half), 2, rounding_mode="floor") / half
        )
        px, py = xe[..., None] / dim_t, ye[..., None] / dim_t
        px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), -1).flatten(3)
        py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), -1).flatten(3)
        want = torch.cat((py, px), 3)[0].reshape(h * w, D).numpy()
        np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------ build + run
def _tiny_cfg(**over):
    from openpsg_tpu.models.detectors.mask2former_relation import (
        M2FRelationConfig,
    )

    return dataclasses.replace(M2FRelationConfig.tiny_test("v1"), **over)


def _build(cfg):
    from openpsg_tpu.models.detectors.mask2former_relation import (
        PSGMask2FormerRelation,
    )

    return PSGMask2FormerRelation(cfg, jax.random.PRNGKey(0))


def _train_one_step(p, cfg):
    from openpsg_tpu.train.trainer import (
        M2FTrainBatch,
        M2FTrainer,
        make_lr_schedule,
        make_optimizer,
    )

    M = cfg.max_objects_padded
    B, H = 1, 64
    H4 = H // 4
    rng = np.random.default_rng(0)
    target = np.zeros((B, M, M, 56), np.float32)
    target[:, 0, 1, 4] = 1
    batch = M2FTrainBatch(
        image=jnp.asarray(rng.integers(0, 255, (B, H, H, 3)).astype(np.float32)),
        object_masks=jnp.asarray(rng.uniform(size=(B, M, H4, H4)) > 0.8),
        object_labels=jnp.asarray(rng.integers(0, 133, (B, M)), jnp.int32),
        object_valid=jnp.asarray(np.tile((np.arange(M) < 4)[None], (B, 1))),
        relation_target=jnp.asarray(target),
    )
    trainable = {
        "head": p.params["head"],
        "object_cls_embed": p.params["object_cls_embed"],
    }
    frozen = {"segmenter": p.params["segmenter"]}
    opt = make_optimizer(make_lr_schedule(steps_per_epoch=10))
    step = jax.jit(M2FTrainer(p).make_train_step(opt))
    new_tr, _, metrics = step(trainable, opt.init(trainable), frozen, batch)
    assert np.isfinite(float(metrics["loss_relation"]))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), trainable, new_tr
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


class TestOptionalPathsBuildTrainInfer:
    @pytest.mark.parametrize(
        "knobs",
        [
            dict(use_positional_encoding=True),
            dict(use_background_feature=True),
            dict(object_token_size=3),
            dict(embedding_add_cls=False, use_positional_encoding=True,
                 use_background_feature=True, object_token_size=2),
        ],
        ids=["pos-enc", "background", "chunked", "all-no-cls"],
    )
    def test_builds_trains_infers(self, knobs):
        cfg = _tiny_cfg(**knobs)
        p = _build(cfg)
        _train_one_step(p, cfg)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        res = p.infer(img, (64, 60))
        assert set(res) >= {"pan_results", "rel_results", "rel_scores"}

    def test_embellishments_change_scores(self):
        """The switches must be live THROUGH the inference tail: enabling
        the PE / background paths on the same weights changes the object
        tokens `_relation_tail` assembles, hence the triplet scores.
        (Drive `_relation_tail` directly with forced-valid objects — the
        tiny random segmenter detects nothing on a random image, so
        end-to-end rel_scores would be empty on both sides.)"""
        base = _build(_tiny_cfg())
        c = base.cfg
        M = c.max_objects_padded
        rng = np.random.default_rng(0)
        H4 = 16
        mf = jnp.asarray(rng.normal(size=(H4, H4, 32)).astype(np.float32))
        obj_masks = jnp.asarray(rng.uniform(size=(M, H4, H4)) > 0.6)
        valid = jnp.asarray(np.arange(M) < 4)
        labels = jnp.asarray(rng.integers(0, 133, M), jnp.int32)
        scores = jnp.where(valid, 0.9, 0.0).astype(jnp.float32)
        sel = jnp.arange(M, dtype=jnp.int32)
        pan = jnp.zeros((H4, H4), jnp.int32)

        def tail(p):
            return np.asarray(p._relation_tail(
                p.params, mf, obj_masks, sel, valid, labels, scores, pan
            )["triplet_scores"])

        r0 = tail(base)
        for knob in ("use_positional_encoding", "use_background_feature"):
            alt = _build(_tiny_cfg(**{knob: True}))
            alt.params = base.params   # same weights, different wiring
            r1 = tail(alt)
            assert not np.allclose(r0, r1), knob

    def test_invalid_combos_raise(self):
        with pytest.raises(ValueError, match="merge_cls_type"):
            _build(_tiny_cfg(merge_cls_type="cat",
                             use_positional_encoding=True))
        with pytest.raises(ValueError, match="object_token_size"):
            from openpsg_tpu.models.detectors.mask2former_relation import (
                M2FRelationConfig,
            )

            cfg = dataclasses.replace(
                M2FRelationConfig.tiny_test("v2"), object_token_size=2
            )
            _build(cfg)


class TestConfigMapping:
    def test_builder_maps_reference_fields(self, tmp_path):
        from openpsg_tpu.core.builder import m2f_relation_config
        from openpsg_tpu.core.config import Config

        repo = __file__.rsplit("/tests/", 1)[0]
        cfg_path = tmp_path / "cfg.py"
        cfg_path.write_text(
            f"_base_ = ['{repo}/configs/psg/tiny_r50.py']\n"
            "model = dict(relation_head=dict(\n"
            "    positional_encoding=dict(type='SinePositionalEncoding',\n"
            "                             num_feats=128, normalize=True),\n"
            "    use_background_feature=True,\n"
            "    embedding_add_cls=True,\n"
            "    merge_cls_type='add',\n"
            "    object_token_size=2,\n"
            "))\n"
        )
        mcfg = m2f_relation_config(
            Config.fromfile(str(cfg_path), import_custom_modules=False)
        )
        assert mcfg.use_positional_encoding
        assert mcfg.use_background_feature
        assert mcfg.embedding_add_cls
        assert mcfg.object_token_size == 2

    def test_default_reference_config_disables(self):
        from openpsg_tpu.core.builder import m2f_relation_config
        from openpsg_tpu.core.config import Config

        repo = __file__.rsplit("/tests/", 1)[0]
        mcfg = m2f_relation_config(
            Config.fromfile(f"{repo}/configs/psg/tiny_r50.py",
                            import_custom_modules=False)
        )
        assert not mcfg.use_positional_encoding
        assert not mcfg.use_background_feature
        assert mcfg.object_token_size == 1
