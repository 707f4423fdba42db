import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpsg_tpu.models.llm.decode import greedy_decode
from openpsg_tpu.models.llm.llama import Llama, LlamaConfig, LlamaWithEmbeddings


@pytest.fixture(scope="module")
def tiny_llm():
    cfg = LlamaConfig.tiny_test(vocab_size=97)
    model = LlamaWithEmbeddings(cfg)
    B, L = 2, 10
    ids = jnp.zeros((B, L), jnp.int32)
    mask = jnp.ones((B, L), bool)
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
    params = jax.jit(
        lambda k: model.init(
            k, token_ids=ids, attention_mask=mask, positions=pos
        )
    )(jax.random.PRNGKey(0))
    return cfg, model, params


def _naive_greedy(model, params, prefix_embeds, prefix_mask, steps, eos_id):
    """Reference decode: re-run the full (growing) sequence each step."""
    B, Lp, D = prefix_embeds.shape
    emb = prefix_embeds
    mask = prefix_mask
    out = []
    done = np.zeros(B, bool)
    for _ in range(steps):
        pos = jnp.maximum(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0)
        logits, _ = model.apply(
            params, input_embeds=emb, attention_mask=mask, positions=pos
        )
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1)).astype(np.int32)
        emit = np.where(done, 0, nxt)
        done = done | (nxt == eos_id)
        out.append(np.where(done & (nxt == eos_id), 0, emit))
        tok_emb = model.apply(params, jnp.asarray(nxt)[:, None], method=lambda m, i: m.embed(i))
        emb = jnp.concatenate([emb, tok_emb], axis=1)
        mask = jnp.concatenate([mask, jnp.ones((B, 1), bool)], axis=1)
    return np.stack(out, axis=1)


class TestLlama:
    def test_forward_shapes(self, tiny_llm):
        cfg, model, params = tiny_llm
        B, L = 2, 10
        ids = jnp.arange(B * L, dtype=jnp.int32).reshape(B, L) % cfg.vocab_size
        mask = jnp.ones((B, L), bool)
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        logits, _ = jax.jit(
            lambda p, i: model.apply(p, token_ids=i, attention_mask=mask, positions=pos)
        )(params, ids)
        assert logits.shape == (B, L, cfg.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()

    def test_causality(self, tiny_llm):
        """Changing a later token must not affect earlier logits."""
        cfg, model, params = tiny_llm
        L = 8
        ids1 = jnp.arange(L, dtype=jnp.int32)[None] % cfg.vocab_size
        ids2 = ids1.at[0, -1].set((ids1[0, -1] + 1) % cfg.vocab_size)
        mask = jnp.ones((1, L), bool)
        pos = jnp.arange(L, dtype=jnp.int32)[None]
        f = jax.jit(lambda p, i: model.apply(p, token_ids=i, attention_mask=mask, positions=pos)[0])
        l1, l2 = f(params, ids1), f(params, ids2)
        np.testing.assert_allclose(
            np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]), atol=1e-5
        )
        assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]))

    def test_left_pad_equals_no_pad(self, tiny_llm):
        """Left padding with cumsum positions must not change real logits."""
        cfg, model, params = tiny_llm
        L = 6
        ids = (jnp.arange(L, dtype=jnp.int32)[None] * 3 + 1) % cfg.vocab_size
        mask = jnp.ones((1, L), bool)
        pos = jnp.arange(L, dtype=jnp.int32)[None]
        logits_plain, _ = model.apply(
            params, token_ids=ids, attention_mask=mask, positions=pos
        )
        P = 3
        ids_pad = jnp.concatenate([jnp.zeros((1, P), jnp.int32), ids], axis=1)
        mask_pad = jnp.concatenate([jnp.zeros((1, P), bool), mask], axis=1)
        pos_pad = jnp.maximum(jnp.cumsum(mask_pad.astype(jnp.int32), axis=1) - 1, 0)
        logits_pad, _ = model.apply(
            params, token_ids=ids_pad, attention_mask=mask_pad, positions=pos_pad
        )
        np.testing.assert_allclose(
            np.asarray(logits_plain[0]), np.asarray(logits_pad[0, P:]), atol=2e-4
        )


class TestGreedyDecode:
    @pytest.mark.parametrize("pad_layout", ["left", "middle"])
    def test_matches_naive_decode(self, tiny_llm, pad_layout):
        """Batched KV-cache decode == naive full-forward decode, for left
        padding and for the reference's [visual ; left-padded text] middle
        padding (relation_transformer_head_v4.py:296-299)."""
        cfg, model, params = tiny_llm
        B, Lp = 3, 9
        rng = jax.random.PRNGKey(7)
        emb = jax.random.normal(rng, (B, Lp, cfg.dim)) * 0.5
        if pad_layout == "left":
            mask = np.ones((B, Lp), bool)
            mask[0, :3] = False
            mask[1, :1] = False
        else:  # visual prefix (2 slots) real, pads in the middle, text real
            mask = np.ones((B, Lp), bool)
            mask[0, 2:5] = False
            mask[1, 2:3] = False
        mask = jnp.asarray(mask)
        emb = jnp.where(mask[..., None], emb, 0.0)

        steps = 5
        toks, scores = jax.jit(
            lambda p, e, m: greedy_decode(model, p, e, m, steps, eos_id=3)
        )(params, emb, mask)
        want = _naive_greedy(model, params, emb, mask, steps, eos_id=3)
        np.testing.assert_array_equal(np.asarray(toks), want)
        assert scores.shape == (B, steps)

    def test_vmap_matches_per_image_decode(self, tiny_llm):
        """infer_batch vmaps greedy_decode (with its data-dependent
        early-exit while_loop) over images (psg_v4.py:infer_batch); the
        vmapped result must match per-image calls bit-for-bit, for both
        early-exit settings (r2 advisor finding)."""
        cfg, model, params = tiny_llm
        NI, B, Lp, steps = 2, 3, 6, 6
        emb = jax.random.normal(
            jax.random.PRNGKey(11), (NI, B, Lp, cfg.dim)
        ) * 0.5
        mask = np.ones((NI, B, Lp), bool)
        mask[0, 0, :2] = False
        mask[1, 2, :1] = False
        mask = jnp.asarray(mask)

        for flag in (True, False):
            fn = lambda e, m, f=flag: greedy_decode(
                model, params, e, m, steps, eos_id=3, early_exit=f
            )
            tb, sb = jax.jit(jax.vmap(fn))(emb, mask)
            for i in range(NI):
                ti, si = jax.jit(fn)(emb[i], mask[i])
                np.testing.assert_array_equal(np.asarray(tb[i]), np.asarray(ti))
                np.testing.assert_allclose(
                    np.asarray(sb[i]), np.asarray(si), atol=1e-5
                )

    def test_eos_stops_sequence(self, tiny_llm):
        """After EOS the emitted tokens are pad (0) and scores 0."""
        cfg, model, params = tiny_llm
        B, Lp = 4, 4
        emb = jax.random.normal(jax.random.PRNGKey(1), (B, Lp, cfg.dim))
        mask = jnp.ones((B, Lp), bool)
        toks, scores = greedy_decode(model, params, emb, mask, 8, eos_id=3)
        toks, scores = np.asarray(toks), np.asarray(scores)
        for b in range(B):
            eos_pos = np.nonzero(toks[b] == 0)[0]
            # wherever a 0 appears after decode start, scores must be 0 too
            for p in eos_pos:
                assert scores[b, p] == 0.0

    def test_return_trips_counts_pad_emitting_steps(self, tiny_llm):
        """``return_trips`` reports the ACTUAL while_loop trip count.

        A not-yet-done sequence whose argmax is ``pad_id`` emits pads
        while the loop keeps running, so counting non-pad output tokens
        undercounts the realized cost (r4 knob-matrix artifact: a
        12-trip decode read as 4 "realized steps" and mis-attributed
        ~80 ms to a phantom act_int8×pruning interaction).  Force that
        regime by boosting the lm_head's pad column: argmax is always
        pad(0), EOS never fires, the loop must run all ``steps`` trips
        while token counting sees zero."""
        import copy

        cfg, model, params = tiny_llm
        B, Lp, steps = 3, 5, 7
        emb = jax.random.normal(jax.random.PRNGKey(5), (B, Lp, cfg.dim))
        mask = jnp.ones((B, Lp), bool)

        # zero lm_head → all logits tie → argmax is token 0 == pad, at
        # EVERY step, for every input (sign-independent, deterministic)
        zeroed = copy.deepcopy(jax.device_get(params))
        head = zeroed["params"]["core"]["lm_head"]
        kname = "kernel" if "kernel" in head else "kernel_q"
        head[kname] = np.zeros_like(np.asarray(head[kname]))

        toks, scores, trips = greedy_decode(
            model, zeroed, emb, mask, steps, eos_id=3,
            return_trips=True,
        )
        toks = np.asarray(toks)
        assert int(trips) == steps            # loop really ran every step
        assert (toks != 0).sum() == 0         # ...yet every output is pad
        # token counting would report max(n)+1 == 1 here — the undercount

        # same program, eos_id=0: every pair's PREFILL token is already
        # EOS, so the while_loop body never runs — zero trips; and the
        # default 2-tuple API matches the triple's outputs bit-for-bit
        t2, s2, trips_eos = greedy_decode(
            model, zeroed, emb, mask, steps, eos_id=0, return_trips=True,
        )
        t3, s3 = greedy_decode(model, zeroed, emb, mask, steps, eos_id=0)
        np.testing.assert_array_equal(np.asarray(t2), np.asarray(t3))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(s3))
        assert int(trips_eos) == 0


class TestInt8Quant:
    def test_quantized_forward_close_and_decodes(self):
        """Weight-only int8 (LlamaConfig.quant): params quantize from the
        f32 tree, logits stay close, greedy decode runs."""
        import dataclasses as dc

        import numpy as np

        from openpsg_tpu.models.llm.llama import (
            LlamaConfig,
            LlamaWithEmbeddings,
            quantize_llama,
        )

        cfg = LlamaConfig.tiny_test(vocab_size=64)
        model = LlamaWithEmbeddings(cfg)
        ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
        mask = jnp.ones((1, 4), bool)
        pos = jnp.arange(4)[None]
        params = model.init(
            jax.random.PRNGKey(0), token_ids=ids, attention_mask=mask,
            positions=pos,
        )
        ref, _ = model.apply(
            params, token_ids=ids, attention_mask=mask, positions=pos
        )

        qcfg = dc.replace(cfg, quant=True)
        qmodel = LlamaWithEmbeddings(qcfg)
        qparams = quantize_llama(params)
        # structure: matches a fresh quant init
        init_q = qmodel.init(
            jax.random.PRNGKey(0), token_ids=ids, attention_mask=mask,
            positions=pos,
        )
        from openpsg_tpu.models.llm.weight_convert import verify_structure
        verify_structure(qparams, init_q)
        assert (
            qparams["params"]["core"]["layers"]["wq"]["kernel_q"].dtype
            == np.int8
        )
        got, _ = qmodel.apply(
            qparams, token_ids=ids, attention_mask=mask, positions=pos
        )
        # int8 per-channel quantization keeps the argmax token stable on a
        # tiny model and logits within a loose tolerance
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=0.55, rtol=0.3
        )
        assert (
            np.argmax(np.asarray(got)[0, -1]) == np.argmax(np.asarray(ref)[0, -1])
        )

    def test_act_int8_prefill_path(self):
        """Dynamic int8-activation QDense (prefill MXU lever): ≥256 input
        rows take the int8×int8 path and must match the bf16 path within
        per-token quantization error; fewer rows (decode) must be
        BIT-IDENTICAL to act_int8=False."""
        from openpsg_tpu.models.llm.llama import QDense

        rng = np.random.default_rng(0)
        D, F = 64, 96
        x_big = jnp.asarray(rng.normal(size=(300, D)), jnp.float32)
        x_small = jnp.asarray(rng.normal(size=(4, D)), jnp.float32)

        ref = QDense(F, dtype=jnp.float32, act_int8=False)
        act = QDense(F, dtype=jnp.float32, act_int8=True)
        params = ref.init(jax.random.PRNGKey(0), x_big)
        # give the int8 kernel real values
        params = jax.tree_util.tree_map(lambda p: p, params)
        params["params"]["kernel_q"] = jnp.asarray(
            rng.integers(-127, 128, (D, F)), jnp.int8
        )
        params["params"]["scale"] = jnp.asarray(
            rng.uniform(0.005, 0.02, (F,)), jnp.float32
        )

        y_ref = ref.apply(params, x_big)
        y_act = act.apply(params, x_big)
        # per-token symmetric int8: relative error bounded by ~1/127 of
        # the token's max-abs amplification through the kernel
        denom = np.maximum(np.abs(np.asarray(y_ref)), 1e-3)
        rel = np.abs(np.asarray(y_act) - np.asarray(y_ref)) / denom
        assert np.median(rel) < 0.02 and np.mean(rel) < 0.2

        # decode-shaped inputs: act_int8 must be a no-op
        np.testing.assert_array_equal(
            np.asarray(ref.apply(params, x_small)),
            np.asarray(act.apply(params, x_small)),
        )

    def test_quant_greedy_decode(self):
        import dataclasses as dc

        import numpy as np

        from openpsg_tpu.models.llm.decode import greedy_decode
        from openpsg_tpu.models.llm.llama import LlamaConfig, LlamaWithEmbeddings

        cfg = dc.replace(LlamaConfig.tiny_test(vocab_size=64), quant=True)
        model = LlamaWithEmbeddings(cfg)
        prefix = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 5, cfg.dim)), jnp.float32
        )
        pmask = jnp.ones((2, 5), bool)
        params = model.init(
            jax.random.PRNGKey(1), token_ids=jnp.zeros((2, 5), jnp.int32),
            attention_mask=pmask, positions=jnp.tile(jnp.arange(5)[None], (2, 1)),
        )
        toks, scores = greedy_decode(model, params, prefix, pmask, 4, eos_id=3)
        assert toks.shape == (2, 4)
        assert np.isfinite(np.asarray(scores)).all()


class TestDecoupledLabelMasks:
    def test_segments_isolated(self):
        """Port of the reference's decouple_label_tok_embeds surgery
        (commons/llama.py:226-288): label segments after the answer token
        attend to the prompt and themselves, never to earlier segments."""
        import numpy as np

        from openpsg_tpu.models.llm.llama import decouple_label_masks

        ARE, COMMA = 50, 51
        #       0   1   2    3(a) 4   5   6(,) 7   8(,)
        ids = np.array([[7, 8, 9, ARE, 20, 21, COMMA, 22, COMMA]])
        mask, pos = decouple_label_masks(ids, ARE, COMMA,
                                         decouple_positions=True)
        m = mask[0]
        # prompt region: plain causal
        assert m[3, :4].all() and not m[3, 4]
        # segment 1 (tokens 4-6) sees prompt + itself
        assert m[6, :4].all() and m[6, 4:7].all()
        # segment 2 (tokens 7-8) sees prompt + itself but NOT segment 1
        assert m[8, :4].all()
        assert not m[8, 4] and not m[8, 5] and not m[8, 6]
        assert m[8, 7] and m[8, 8]
        # positions restart at the answer index per segment (the first
        # segment starts AT the answer token, reference :246-266)
        np.testing.assert_array_equal(pos[0, :7], [0, 1, 2, 3, 4, 5, 6])
        np.testing.assert_array_equal(pos[0, 7:9], [3, 4])

    def test_full_mask_feeds_llama(self):
        import numpy as np

        from openpsg_tpu.models.llm.llama import (
            LlamaConfig,
            LlamaWithEmbeddings,
            decouple_label_masks,
        )

        cfg = LlamaConfig.tiny_test(vocab_size=64)
        model = LlamaWithEmbeddings(cfg)
        ids = np.array([[7, 8, 50, 20, 51, 22, 51, 0]])
        mask, pos = decouple_label_masks(ids, 50, 51)
        params = model.init(
            jax.random.PRNGKey(0), token_ids=jnp.asarray(ids, jnp.int32),
            attention_mask=jnp.asarray(ids != 0),
            positions=jnp.asarray(pos),
        )
        logits, _ = model.apply(
            params, token_ids=jnp.asarray(ids, jnp.int32),
            attention_mask=jnp.asarray(ids != 0),
            positions=jnp.asarray(pos), full_mask=jnp.asarray(mask),
        )
        assert np.isfinite(np.asarray(logits)).all()
        # changing an EARLIER segment token must not change a later
        # segment's logits (conditional independence given the prompt)
        ids2 = ids.copy(); ids2[0, 3] = 21
        mask2, pos2 = decouple_label_masks(ids2, 50, 51)
        logits2, _ = model.apply(
            params, token_ids=jnp.asarray(ids2, jnp.int32),
            attention_mask=jnp.asarray(ids2 != 0),
            positions=jnp.asarray(pos2), full_mask=jnp.asarray(mask2),
        )
        np.testing.assert_allclose(
            np.asarray(logits)[0, 5:7], np.asarray(logits2)[0, 5:7], atol=1e-5
        )


class TestEarlyExitDecode:
    """lax.while_loop early exit must be bit-identical to the fixed-step
    decode — only the step count is data-dependent."""

    def _model(self, seed=0):
        from openpsg_tpu.models.llm.llama import LlamaConfig, LlamaWithEmbeddings

        cfg = LlamaConfig.tiny_test(vocab_size=32)
        m = LlamaWithEmbeddings(cfg)
        p = m.init(
            jax.random.PRNGKey(seed),
            token_ids=jnp.zeros((1, 4), jnp.int32),
            attention_mask=jnp.ones((1, 4), bool),
            positions=jnp.zeros((1, 4), jnp.int32),
        )
        return m, p

    def _decode_both(self, m, p, eos_id):
        from openpsg_tpu.models.llm.decode import greedy_decode

        rng = np.random.default_rng(0)
        prefix = jnp.asarray(rng.normal(size=(3, 5, m.cfg.dim)), jnp.float32)
        mask = jnp.ones((3, 5), bool).at[0, 0].set(False)
        outs = []
        for flag in (True, False):
            toks, scores = jax.jit(
                lambda pr, mk, f=flag: greedy_decode(
                    m, p, pr, mk, 8, eos_id=eos_id, pad_id=0, early_exit=f
                )
            )(prefix, mask)
            outs.append((np.asarray(toks), np.asarray(scores)))
        return outs

    def test_immediate_eos(self):
        m, p = self._model()
        # zero lm_head -> all logits equal -> argmax 0; eos_id=0 means
        # every sequence ends at once and the loop exits on step 1
        p = jax.tree_util.tree_map(lambda x: x, p)
        p["params"]["core"]["lm_head"]["kernel"] = jnp.zeros_like(
            p["params"]["core"]["lm_head"]["kernel"]
        )
        (t1, s1), (t2, s2) = self._decode_both(m, p, eos_id=0)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        assert (t1 == 0).all()  # all pads after immediate EOS

    def test_random_model_equivalence(self):
        m, p = self._model(3)
        for eos in (5, 31):
            (t1, s1), (t2, s2) = self._decode_both(m, p, eos_id=eos)
            np.testing.assert_array_equal(t1, t2)
            np.testing.assert_allclose(s1, s2, atol=1e-6)


class TestTripBudget:
    """Runtime decode-trip budget (tail-latency SLO knob; also bench.py's
    instrument for timing the realistic decode regime on the shipped
    executable).  A traced scalar: one compiled program serves every
    budget value, and budget >= max_new_tokens is bit-identical to the
    uncapped decode."""

    def _setup(self, steps=8):
        cfg = LlamaConfig.tiny_test(vocab_size=32)
        m = LlamaWithEmbeddings(cfg)
        p = m.init(
            jax.random.PRNGKey(7),
            token_ids=jnp.zeros((1, 4), jnp.int32),
            attention_mask=jnp.ones((1, 4), bool),
            positions=jnp.zeros((1, 4), jnp.int32),
        )
        rng = np.random.default_rng(1)
        prefix = jnp.asarray(rng.normal(size=(3, 5, cfg.dim)), jnp.float32)
        mask = jnp.ones((3, 5), bool).at[1, 0].set(False)
        fn = jax.jit(
            lambda pr, mk, b: greedy_decode(
                m, p, pr, mk, steps, eos_id=31, pad_id=0,
                return_trips=True, trip_budget=b,
            )
        )
        return fn, prefix, mask, steps

    def test_budget_caps_trips_and_prefix_tokens_agree(self):
        fn, prefix, mask, steps = self._setup()
        t_full, s_full, trips_full = fn(prefix, mask, jnp.int32(steps))
        for b in (1, 3, steps, steps + 5):
            t, s, trips = fn(prefix, mask, jnp.int32(b))
            assert int(trips) == min(b, int(trips_full))
            k = min(b, steps)
            # tokens emitted within the budget match the uncapped decode;
            # slots past the budget stay pad
            np.testing.assert_array_equal(
                np.asarray(t)[:, :k], np.asarray(t_full)[:, :k]
            )
            assert (np.asarray(t)[:, k:] == 0).all()
            np.testing.assert_allclose(
                np.asarray(s)[:, :k], np.asarray(s_full)[:, :k], atol=1e-6
            )

    def test_budget_caps_without_early_exit(self):
        """trip_budget composes with early_exit=False (the pinned-decode
        config): the loop runs exactly min(budget, max_new_tokens) trips."""
        cfg = LlamaConfig.tiny_test(vocab_size=32)
        m = LlamaWithEmbeddings(cfg)
        p = m.init(
            jax.random.PRNGKey(2),
            token_ids=jnp.zeros((1, 4), jnp.int32),
            attention_mask=jnp.ones((1, 4), bool),
            positions=jnp.zeros((1, 4), jnp.int32),
        )
        rng = np.random.default_rng(5)
        prefix = jnp.asarray(rng.normal(size=(2, 5, cfg.dim)), jnp.float32)
        mask = jnp.ones((2, 5), bool)
        fn = jax.jit(
            lambda b: greedy_decode(
                m, p, prefix, mask, 8, eos_id=31, pad_id=0,
                early_exit=False, return_trips=True, trip_budget=b,
            )
        )
        for b, want in ((3, 3), (8, 8), (12, 8)):
            _, _, trips = fn(jnp.int32(b))
            assert int(trips) == want, (b, int(trips))

    def test_one_program_many_budgets(self):
        """Changing the budget must NOT recompile (it is a traced scalar,
        not a static constant)."""
        fn, prefix, mask, steps = self._setup()
        fn(prefix, mask, jnp.int32(2))
        n0 = fn._cache_size()
        fn(prefix, mask, jnp.int32(5))
        fn(prefix, mask, jnp.int32(steps))
        assert fn._cache_size() == n0

    def test_pipeline_budget_plumbs_to_decode(self):
        """PSGv4._infer_jit's trip_budget reaches the while_loop: the
        decode_trips output equals the runtime cap, params/program
        unchanged."""
        from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config

        p = PSGv4(PSGv4Config.tiny_test(), jax.random.PRNGKey(0))
        H, W = p._model_hw()
        img = jnp.zeros((H, W, 3), jnp.float32)
        hw = jnp.asarray([H, W], jnp.int32)
        full = p.cfg.max_new_tokens
        dev_full = p._infer_jit(p.params, img, hw, jnp.int32(full))
        dev_cap = p._infer_jit(p.params, img, hw, jnp.int32(2))
        assert int(jnp.max(dev_cap["decode_trips"])) == 2
        assert int(jnp.max(dev_full["decode_trips"])) <= full
        # non-decode outputs identical (the cap only bounds generation)
        np.testing.assert_allclose(
            np.asarray(dev_full["top_pair_scores"]),
            np.asarray(dev_cap["top_pair_scores"]),
        )


class TestRemat:
    def test_remat_matches_plain_forward_and_grad(self, tiny_llm):
        """cfg.remat must be a pure memory knob: identical params tree,
        identical logits, identical input-gradients (the path the trainer
        uses — grads flow THROUGH the frozen LLM to the Q-Former)."""
        cfg, model, params = tiny_llm
        import dataclasses

        rmodel = LlamaWithEmbeddings(dataclasses.replace(cfg, remat=True))
        B, L, D = 2, 9, cfg.dim
        emb = jax.random.normal(jax.random.PRNGKey(3), (B, L, D), jnp.float32)
        mask = jnp.ones((B, L), bool)
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))

        def loss(m, e):
            logits, _ = m.apply(
                params, input_embeds=e, attention_mask=mask, positions=pos
            )
            return jnp.sum(logits.astype(jnp.float32) ** 2), logits

        (l0, g0), (l1, g1) = (
            jax.value_and_grad(lambda e: loss(m, e)[0])(emb) for m in (model, rmodel)
        )
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
        # recompute reorders float ops — compare by relative L2 error
        g0, g1 = np.asarray(g0), np.asarray(g1)
        rel = np.linalg.norm(g0 - g1) / max(np.linalg.norm(g0), 1e-9)
        assert rel < 1e-5, rel
        # param structure unchanged: rmodel consumes the plain params as-is
        jax.eval_shape(
            lambda p: rmodel.apply(
                p, input_embeds=emb, attention_mask=mask, positions=pos
            ),
            params,
        )
