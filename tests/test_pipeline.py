"""End-to-end tests: tiny PSGv4 inference + one training step.

Mirrors the reference's operational verification (SURVEY.md §4): inference
produces the ``simple_test`` result surface; training produces finite
losses and only updates trainable (head) params.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config, select_objects
from openpsg_tpu.train.trainer import (
    TrainBatch,
    V4Trainer,
    build_llm_labels,
    make_lr_schedule,
    make_optimizer,
    sample_training_pairs,
)


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = PSGv4Config.tiny_test()
    return PSGv4(cfg, jax.random.PRNGKey(0))


def _fake_image(H=64, W=64):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (H, W, 3)).astype(np.float32)


class TestSelectObjects:
    def test_duplicate_oids_deduped(self):
        # fusion merges same-class stuff queries: queries 1 and 3 both carry
        # oid 7 — only the first survives selection
        survive = jnp.asarray([True, True, False, True, True])
        oids = jnp.asarray([2005, 7, 7, 7, 1005])
        sel, sel_oid, valid = select_objects(survive, oids, 8, 8)
        got = sorted(np.asarray(sel_oid)[np.asarray(valid)].tolist())
        assert got == [7, 1005, 2005]
        assert int(valid.sum()) == 3

    def test_cap_and_padding(self):
        survive = jnp.ones((6,), bool)
        oids = jnp.arange(6, dtype=jnp.int32) + 10
        sel, sel_oid, valid = select_objects(survive, oids, 8, max_object_num=4)
        assert int(valid.sum()) == 4          # capped at max_object_num
        got = np.asarray(sel_oid)[np.asarray(valid)].tolist()
        assert got == [10, 11, 12, 13]        # ascending oid order


class TestLoadConvertedTrunk:
    def test_msgpack_roundtrip_into_pipeline(self, tiny_pipeline, tmp_path):
        from flax import serialization

        from tests.test_weight_convert import synthetic_openseed_state
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        p = tiny_pipeline
        params, _ = convert_openseed(
            synthetic_openseed_state(p.cfg.segmenter, seed=3), p.cfg.segmenter
        )
        path = str(tmp_path / "segmenter.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes({"params": params}))
        leaf = lambda t: np.asarray(
            t["params"]["backbone"]["patch_embed"]["kernel"]
        )
        before = leaf(p.params["segmenter"]).copy()
        p.load_segmenter_weights(path)
        after = leaf(p.params["segmenter"])
        assert before.shape == after.shape
        assert not np.allclose(before, after)
        np.testing.assert_allclose(
            after,
            params["backbone"]["patch_embed"]["kernel"],
            atol=0,
        )


@pytest.fixture(scope="module")
def hf_pipeline(tmp_path_factory):
    """Tiny PSGv4 with a REAL transformers wordpiece tokenizer in both the
    LLM and Q-Former roles (reference: SentencePiece + BERT wordpiece,
    relation_transformer_head_v4.py:85-86, 99-105)."""
    from transformers import BertTokenizerFast

    from openpsg_tpu.models.relation.hf_tokenizer import HFTokenizer

    classes = ["person", "sky", "dog"]
    relations = ["on", "over", "looking at"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "is", "there", "a",
             "relation", "relations", "between", "and", "what", "are",
             "the", "assistant", ":", "?", "person", "sky", "dog", "on",
             "over", "looking", "at"]
    d = tmp_path_factory.mktemp("hftok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = HFTokenizer(BertTokenizerFast(vocab_file=str(d / "vocab.txt")))

    cfg = PSGv4Config.tiny_test()
    p = PSGv4(
        cfg, jax.random.PRNGKey(0), class_names=classes,
        relation_names=relations, num_things=2,
        tokenizer=tok, qformer_tokenizer=tok,
    )
    return p, tok


class TestHFTokenizerPipeline:
    def test_tables_sized_from_tokenizer(self, hf_pipeline):
        p, tok = hf_pipeline
        # class names here are single wordpieces → table width 1 (sized
        # from the tokenizer, not the NAME_TOKENS constant)
        assert p.llm_parts["names"].shape[1] == 1
        # multi-piece predicate 'looking at' encodes to 2 tokens
        assert max(len(e) for e in p.relation_token_ids) >= 2
        assert p.llm_parts["pad_id"] == tok.pad_id
        assert p.cfg.llm.vocab_size >= tok.vocab_size

    def test_end_to_end_inference_surface(self, hf_pipeline):
        p, _ = hf_pipeline
        res = p.infer(_fake_image(), (60, 64))
        assert set(res) >= {"pan_results", "rel_results", "rel_scores"}
        assert res["pan_results"].shape == (64, 64)
        for s, o, r in res["rel_results"]["relation"]:
            assert 0 <= r < len(p.relation_names)

    def test_decode_matching_keyed_on_eos(self, hf_pipeline):
        """Generated '<rel tokens> EOS pad...' matches the predicate by
        token segments — including the multi-word 'looking at'."""
        p, tok = hf_pipeline
        M = p.cfg.head.max_objects_padded
        gen = np.full((p.cfg.head.top_pairs, 8), tok.pad_id, np.int32)
        row0 = tok.encode("looking at") + [tok.eos_id]
        gen[0, : len(row0)] = row0
        row1 = tok.encode("on") + [tok.eos_id]
        gen[1, : len(row1)] = row1
        dev = {
            "pan_seg": np.zeros((16, 16), np.int64),
            "object_valid": np.array([True, True] + [False] * (M - 2)),
            "object_ids": np.array([5, 1007] + [-1] * (M - 2)),
            "top_pair_idx": np.array([1, M] + [0] * (p.cfg.head.top_pairs - 2)),
            "top_pair_scores": np.array(
                [0.9, 0.8] + [0.0] * (p.cfg.head.top_pairs - 2), np.float32
            ),
            "gen_tokens": gen,
        }
        res = p.postprocess(dev)
        assert [0, 1, p.relation_names.index("looking at")] in res["rel_results"]["relation"]
        assert [1, 0, p.relation_names.index("on")] in res["rel_results"]["relation"]

    def test_train_labels_with_hf_tokenizer(self, hf_pipeline):
        from openpsg_tpu.train.trainer import build_llm_labels

        p, tok = hf_pipeline
        M = p.cfg.head.max_objects_padded
        R = len(p.relation_names)
        target = np.zeros((M, M, R), np.float32)
        target[0, 1, p.relation_names.index("looking at")] = 1
        target[0, 1, p.relation_names.index("on")] = 1
        ids, mask = build_llm_labels(
            tok, p.relation_names, target, np.array([1]), max_len=8
        )
        # ' looking at </s> on </s>' → segments end with EOS
        toks = [int(t) for t in ids[0][mask[0]]]
        assert toks.count(tok.eos_id) == 2
        segs, cur = [], []
        for t in toks:
            if t == tok.eos_id:
                segs.append(tok.decode(cur))
                cur = []
            else:
                cur.append(t)
        assert sorted(segs) == ["looking at", "on"]


class TestInference:
    def test_end_to_end_surface(self, tiny_pipeline):
        p = tiny_pipeline
        res = p.infer(_fake_image(), (60, 64))
        # reference simple_test surface (openseed_relation_v2.py:183-190)
        assert set(res) >= {"pan_results", "rel_results", "rel_scores"}
        assert res["pan_results"].shape == (64, 64)
        assert isinstance(res["rel_results"]["object_id_list"], list)
        rel = res["rel_results"]["relation"]
        assert all(len(t) == 3 for t in rel)
        n_obj = len(res["rel_results"]["object_id_list"])
        M = p.cfg.head.max_objects_padded
        for s, o, r in rel:
            assert 0 <= s < M and 0 <= o < M
            assert 0 <= r < len(p.relation_names)
        assert len(res["rel_scores"]) == len(rel)

    def test_pan_ids_consistent_with_object_list(self, tiny_pipeline):
        p = tiny_pipeline
        res = p.infer(_fake_image(), (64, 64))
        ids_in_map = set(np.unique(res["pan_results"])) - {133}
        listed = set(res["rel_results"]["object_id_list"])
        # every listed object must own pixels; map may contain objects
        # beyond the max_object cap
        assert listed <= ids_in_map or len(listed) == 0

    def test_deterministic(self, tiny_pipeline):
        p = tiny_pipeline
        r1 = p.infer(_fake_image(), (64, 64))
        r2 = p.infer(_fake_image(), (64, 64))
        np.testing.assert_array_equal(r1["pan_results"], r2["pan_results"])
        assert r1["rel_results"]["relation"] == r2["rel_results"]["relation"]

    def test_infer_gt_masks(self, tiny_pipeline):
        """GT-masks ablation: the object list IS the provided GT set and
        the emitted pan map paints exactly those masks."""
        p = tiny_pipeline
        M = p.cfg.head.max_objects_padded
        H = W = 64
        masks = np.zeros((M, H, W), bool)
        masks[0, :32, :] = True
        masks[1, 32:, :32] = True
        masks[2, 32:, 32:] = True
        oids = np.zeros((M,), np.int64)
        oids[:3] = [7, 16 + 1000, 119]
        valid = np.zeros((M,), bool)
        valid[:3] = True
        res = p.infer_gt(_fake_image(), masks, oids, valid)
        assert res["rel_results"]["object_id_list"] == [7, 1016, 119]
        pan = res["pan_results"]
        np.testing.assert_array_equal(pan[:32, :], 7)
        np.testing.assert_array_equal(pan[32:, :32], 1016)
        np.testing.assert_array_equal(pan[32:, 32:], 119)
        for s, o, r in res["rel_results"]["relation"]:
            assert 0 <= s < M and 0 <= o < M


class TestM2FInferGT:
    def test_infer_gt_masks_m2f(self):
        from openpsg_tpu.models.detectors.mask2former_relation import (
            M2FRelationConfig,
            PSGMask2FormerRelation,
        )

        cfg = M2FRelationConfig.tiny_test("v1")
        m = PSGMask2FormerRelation(cfg, jax.random.PRNGKey(0))
        M = cfg.max_objects_padded
        H = W = 64
        masks = np.zeros((M, H, W), bool)
        masks[0, :32] = True
        masks[1, 32:] = True
        oids = np.zeros((M,), np.int64)
        oids[:2] = [5, 119]
        valid = np.zeros((M,), bool)
        valid[:2] = True
        res = m.infer_gt(_fake_image(), masks, oids, valid)
        assert res["rel_results"]["object_id_list"] == [5, 119]
        pan = res["pan_results"]
        np.testing.assert_array_equal(pan[:32], 5)
        np.testing.assert_array_equal(pan[32:], 119)
        # triplets only among the two GT objects
        for s, o, r in res["rel_results"]["relation"]:
            assert s in (0, 1) and o in (0, 1) and s != o


class TestSamplers:
    def test_qformer_sampler_ratios(self):
        rng = np.random.default_rng(0)
        M, R = 8, 5
        target = np.zeros((M, M, R))
        target[0, 1, 2] = 1
        target[2, 3, 0] = 1
        valid = np.ones(M * M, bool)
        qf_idx, qf_w, llm_idx, llm_valid = sample_training_pairs(
            rng, target, valid, sample_size=16, neg_over_pos=3, llm_pairs=4
        )
        n_active = int(qf_w.sum())
        # 2 positives → 2 pos + min(14, 6)=6 neg = 8 active slots
        assert n_active == 8
        flat = target.sum(-1).reshape(-1)
        active = qf_idx[qf_w > 0]
        assert flat[active[:2]].all()          # positives first
        assert llm_valid[:2].all() and not llm_valid[2:].any()
        assert set(llm_idx[llm_valid]) == {0 * M + 1, 2 * M + 3}

    def test_llm_labels(self):
        from openpsg_tpu.models.relation.tokenizer import build_prompt_tokenizer
        from openpsg_tpu.data.vocab import RELATION_CLASSES

        tok = build_prompt_tokenizer()
        M, R = 4, 56
        target = np.zeros((M, M, R))
        target[1, 2, RELATION_CLASSES.index("on")] = 1
        target[1, 2, RELATION_CLASSES.index("beside")] = 1
        ids, mask = build_llm_labels(
            tok, RELATION_CLASSES, target, np.asarray([1 * M + 2]), 12
        )
        text = tok.decode(ids[0][mask[0]], stop_at_eos=False)
        assert "on" in text and "beside" in text
        assert (ids[0] == tok.eos_id).sum() == 2   # one </s> per relation


class TestTrainStep:
    def test_loss_finite_and_params_update(self, tiny_pipeline):
        p = tiny_pipeline
        M = p.cfg.head.max_objects_padded
        R = p.cfg.head.num_relation_classes
        H = W = 64
        H4 = H // 4
        B = 2
        rng = np.random.default_rng(0)

        images, masks, labels, valids, targets = [], [], [], [], []
        qf_i, qf_w, llm_i, llm_v, lab_ids, lab_mask = [], [], [], [], [], []
        for b in range(B):
            images.append(_fake_image(H, W))
            m = rng.uniform(size=(M, H4, H4)) > 0.8
            masks.append(m)
            labels.append(rng.integers(0, 133, M))
            valid = np.zeros(M, bool)
            valid[:4] = True
            valids.append(valid)
            t = np.zeros((M, M, R), np.float32)
            t[0, 1, 3] = 1
            t[2, 0, 10] = 1
            targets.append(t)
            qi, qw, li, lv = sample_training_pairs(
                rng, t, np.repeat(valid, M) & np.tile(valid, M),
                sample_size=p.cfg.head.sampled_qformer_batch_size,
            )
            qf_i.append(qi)
            qf_w.append(qw)
            llm_i.append(li)
            llm_v.append(lv)
            ids, msk = build_llm_labels(
                p.tokenizer, p.relation_names, t, li, 12
            )
            lab_ids.append(ids)
            lab_mask.append(msk)

        batch = TrainBatch(
            image=jnp.asarray(np.stack(images)),
            object_masks=jnp.asarray(np.stack(masks)),
            object_labels=jnp.asarray(np.stack(labels), jnp.int32),
            object_valid=jnp.asarray(np.stack(valids)),
            relation_target=jnp.asarray(np.stack(targets)),
            qf_sel_idx=jnp.asarray(np.stack(qf_i)),
            qf_sel_weight=jnp.asarray(np.stack(qf_w)),
            llm_sel_idx=jnp.asarray(np.stack(llm_i)),
            llm_valid=jnp.asarray(np.stack(llm_v)),
            llm_label_ids=jnp.asarray(np.stack(lab_ids)),
            llm_label_mask=jnp.asarray(np.stack(lab_mask)),
        )

        trainer = V4Trainer(p)
        sched = make_lr_schedule(steps_per_epoch=10)
        opt = make_optimizer(sched)
        trainable = {"head": p.params["head"]}
        frozen = {k: v for k, v in p.params.items() if k != "head"}
        opt_state = opt.init(trainable)
        step = jax.jit(trainer.make_train_step(opt))
        new_params, new_opt, metrics = step(trainable, opt_state, frozen, batch)

        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert float(metrics["rel_llm_loss"]) > 0
        assert float(metrics["binary_rel_cls_loss"]) >= 0
        # params actually changed
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), trainable, new_params
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_lr_schedule(self):
        s = make_lr_schedule(
            base_lr=1e-4, warmup_iters=500, warmup_ratio=1e-3,
            step_epochs=(6, 10), steps_per_epoch=100,
        )
        assert float(s(0)) == pytest.approx(1e-7, rel=1e-3)
        assert float(s(500)) == pytest.approx(1e-4, rel=1e-4)
        assert float(s(650)) == pytest.approx(1e-5, rel=1e-4)   # epoch 6 → ×0.1
        assert float(s(1050)) == pytest.approx(1e-6, rel=1e-4)  # epoch 10 → ×0.01

    def test_paramwise_cfg_semantics(self):
        """mmcv paramwise_cfg (reference baseline_r50.py:277-291):
        backbone lr ×0.1, embeds decay_mult=0, norms no-decay; longest
        custom key wins."""
        from openpsg_tpu.train.trainer import paramwise_multipliers

        params = {
            "backbone": {"stage0_block0": {"attn": {"qkv": {
                "kernel": jnp.ones((4, 4))}}}},
            "decoder": {
                "query_embed": {"embedding": jnp.ones((4, 4))},
                "norm1": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
                "proj": {"kernel": jnp.ones((4, 4))},
            },
        }
        lr, dec = paramwise_multipliers(
            params,
            custom_keys={
                "backbone": dict(lr_mult=0.1, decay_mult=1.0),
                "query_embed": dict(lr_mult=1.0, decay_mult=0.0),
            },
            norm_decay_mult=0.0,
        )
        assert lr["backbone"]["stage0_block0"]["attn"]["qkv"]["kernel"] == 0.1
        assert dec["backbone"]["stage0_block0"]["attn"]["qkv"]["kernel"] == 1.0
        assert dec["decoder"]["query_embed"]["embedding"] == 0.0
        assert dec["decoder"]["norm1"]["scale"] == 0.0      # norm_decay_mult
        assert dec["decoder"]["proj"]["kernel"] == 1.0
        assert lr["decoder"]["proj"]["kernel"] == 1.0

        # end-to-end through the optimizer: lr_mult scales the update,
        # decay_mult=0 disables weight decay for that leaf
        opt = make_optimizer(
            lambda c: 1e-2, max_norm=1e9, weight_decay=0.5,
            lr_mult_tree=lr, decay_mult_tree=dec,
        )
        st = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        upd, _ = opt.update(grads, st, params)
        u_bb = float(upd["backbone"]["stage0_block0"]["attn"]["qkv"]["kernel"][0, 0])
        u_proj = float(upd["decoder"]["proj"]["kernel"][0, 0])
        assert u_bb == pytest.approx(0.1 * u_proj, rel=1e-3)
        # no-decay leaf: update has NO -lr*wd*param term
        u_embed = float(upd["decoder"]["query_embed"]["embedding"][0, 0])
        # proj decays (param=1, wd=0.5, lr=1e-2): differs from embed by lr*wd
        assert u_proj == pytest.approx(u_embed - 1e-2 * 0.5 * 1.0, rel=1e-3)

    def test_fractional_decay_mult_scales_decay(self):
        """mmcv allows decay_mult between 0 and 1 (e.g. backbone 0.1 →
        wd 0.005, not 0.05): the decay term must SCALE, not coerce to a
        boolean mask (r3 review finding)."""
        from openpsg_tpu.train.trainer import make_optimizer

        params = {
            "a": {"kernel": jnp.ones((4, 4))},
            "b": {"kernel": jnp.ones((4, 4))},
        }
        dec = {"a": {"kernel": 0.1}, "b": {"kernel": 1.0}}
        opt = make_optimizer(
            lambda c: 1e-2, max_norm=1e9, weight_decay=0.5,
            decay_mult_tree=dec,
        )
        st = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        upd, _ = opt.update(grads, st, params)
        u_a = float(upd["a"]["kernel"][0, 0])
        u_b = float(upd["b"]["kernel"][0, 0])
        # identical grads → the adam part cancels; the decay difference is
        # lr * wd * (1.0 - 0.1) * param
        assert u_a - u_b == pytest.approx(1e-2 * 0.5 * 0.9, rel=1e-3)


class TestBatchedInference:
    def test_batch_matches_single(self, tiny_pipeline):
        """vmapped batch inference must equal per-image inference."""
        p = tiny_pipeline
        rng = np.random.default_rng(5)
        imgs = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
        hws = np.asarray([[64, 64], [60, 62]], np.int32)
        batched = p.infer_batch(imgs, hws)
        singles = [p.infer(imgs[i], tuple(hws[i])) for i in range(2)]
        for b, s in zip(batched, singles):
            np.testing.assert_array_equal(b["pan_results"], s["pan_results"])
            assert b["rel_results"]["relation"] == s["rel_results"]["relation"]

    def test_pipelined_matches_single(self, tiny_pipeline):
        """Micro-batched (lax.map segmenter + vmapped relation tail)
        inference must equal per-image inference — the restructuring is a
        pure scheduling change (peak memory / decode amortization)."""
        import jax

        p = tiny_pipeline
        rng = np.random.default_rng(11)
        imgs = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
        hws = np.asarray([[64, 64], [58, 61]], np.int32)
        fn = p.make_pipelined_infer()
        dev = jax.device_get(
            fn(p.params, jnp.asarray(imgs), jnp.asarray(hws, jnp.int32))
        )
        for i in range(2):
            got = p.postprocess(
                jax.tree_util.tree_map(lambda x: x[i], dev)
            )
            ref = p.infer(imgs[i], tuple(hws[i]))
            np.testing.assert_array_equal(
                got["pan_results"], ref["pan_results"]
            )
            assert (
                got["rel_results"]["relation"] == ref["rel_results"]["relation"]
            )

    def test_batch_sharded_over_mesh(self, tiny_pipeline):
        """dp-sharded batch executes on an 8-device mesh."""
        import jax
        from openpsg_tpu.parallel.mesh import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 devices")
        p = tiny_pipeline
        mesh = make_mesh(dp=8, tp=1)
        rng = np.random.default_rng(6)
        imgs = rng.integers(0, 255, (8, 64, 64, 3)).astype(np.float32)
        hws = np.tile(np.asarray([[64, 64]], np.int32), (8, 1))
        with mesh:
            out = p.infer_batch(imgs, hws, mesh=mesh)
        assert len(out) == 8
        for r in out:
            assert "pan_results" in r

    def test_pair_sharded_matches_single(self, tiny_pipeline):
        """Pair-axis (sequence-parallel analogue) sharded inference must be
        a pure layout directive: identical results to plain single-chip
        inference, and the shared _infer_jit cache must stay clean."""
        import jax
        from openpsg_tpu.parallel.mesh import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 devices")
        p = tiny_pipeline
        mesh = make_mesh(dp=8, tp=1)
        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        hw = np.asarray([64, 64], np.int32)

        fn = p.make_pair_sharded_infer(mesh)
        with mesh:
            dev = jax.device_get(fn(p.params, jnp.asarray(img), jnp.asarray(hw)))
        sharded = p.postprocess(dev)
        assert p._pair_constraint is None  # trace-scoped, not sticky
        plain = p.infer(img, (64, 64))
        np.testing.assert_array_equal(
            sharded["pan_results"], plain["pan_results"]
        )
        assert (
            sharded["rel_results"]["relation"]
            == plain["rel_results"]["relation"]
        )


class TestRelClsVariants:
    @pytest.mark.parametrize("mode", ["binary", "multiclass"])
    def test_single_branch_configs_run(self, mode):
        """binary-only and multiclass-only rel_cls_type must both work
        (the reference NameErrors on binary-only at inference — SURVEY
        §7.3 quirk #1; we implement intended semantics)."""
        import dataclasses as dc

        base = PSGv4Config.tiny_test()
        cfg = dc.replace(base, head=dc.replace(base.head, rel_cls_type=mode))
        p = PSGv4(cfg, jax.random.PRNGKey(0))
        res = p.infer(_fake_image(), (64, 64))
        assert set(res) >= {"pan_results", "rel_results", "rel_scores"}


class TestFusionStride:
    def test_stride4_surface_and_rough_agreement(self):
        """fusion_stride=4 keeps the output surface; segments roughly
        agree with the stride-1 parity path."""
        import dataclasses as dc

        cfg1 = PSGv4Config.tiny_test()
        cfg4 = dc.replace(cfg1, fusion_stride=4)
        p1 = PSGv4(cfg1, jax.random.PRNGKey(0))
        p4 = PSGv4(cfg4, jax.random.PRNGKey(0))
        img = _fake_image()
        r1 = p1.infer(img, (64, 64))
        r4 = p4.infer(img, (64, 64))
        assert r4["pan_results"].shape == r1["pan_results"].shape
        # same surviving object set (coarse fusion changes borderline
        # pixels, not which segments exist, on well-separated masks)
        assert set(r4["rel_results"]["object_id_list"]) == set(
            r1["rel_results"]["object_id_list"]
        )
