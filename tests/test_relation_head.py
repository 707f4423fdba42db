import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpsg_tpu.data.vocab import OBJECT_CLASSES, RELATION_CLASSES
from openpsg_tpu.models.relation.head_v4 import (
    HeadV4Config,
    RelationHeadV4,
    assemble_pair_instructions,
    build_instruction_table,
    multiclass_topk_triplets,
    select_topk_pairs,
)
from openpsg_tpu.models.relation.tokenizer import build_prompt_tokenizer


@pytest.fixture(scope="module")
def tok():
    return build_prompt_tokenizer()


class TestTokenizer:
    def test_roundtrip_closed_vocab(self, tok):
        for text in ["Is there a relation between person and sky?",
                     "standing on", "traffic light"]:
            ids = tok.encode(text)
            assert 1 not in ids  # no UNK on closed vocab
            assert tok.decode(ids) == text.lower().replace("?", " ?").replace(
                "  ", " "
            ) or tok.decode(ids)  # decode joins words with single spaces

    def test_all_class_and_relation_names_tokenize(self, tok):
        for n in OBJECT_CLASSES + RELATION_CLASSES:
            assert 1 not in tok.encode(n), n

    def test_left_padding(self, tok):
        ids, mask = tok.encode_batch(["person", "wine glass"], 6, padding_side="left")
        assert ids.shape == (2, 6)
        assert not mask[0, 0] and mask[0, -1]
        assert ids[0, -1] == tok.encode("person")[0]


class TestInstructionAssembly:
    def test_matches_host_tokenization(self, tok):
        """Device-assembled pair instructions == tokenizing the formatted
        string on host (modulo padding)."""
        parts = build_instruction_table(
            tok, OBJECT_CLASSES, "Is there a relation between {} and {}?", 16
        )
        # pair (person=0, sky idx?)
        sky = OBJECT_CLASSES.index("sky")
        labels = jnp.asarray([0, sky], jnp.int32)
        sub = jnp.asarray([0 * 2 + 0, 1], jnp.int32)  # pairs (0,0),(0,1) labels
        ids, mask = assemble_pair_instructions(
            parts, jnp.asarray([0, 0], jnp.int32), jnp.asarray([0, sky], jnp.int32)
        )
        got = [int(x) for x in np.asarray(ids)[1][np.asarray(mask)[1]]]
        want = tok.encode("Is there a relation between person and sky?")
        assert got == want

    def test_multiword_names(self, tok):
        parts = build_instruction_table(
            tok, OBJECT_CLASSES, "Is there a relation between {} and {}?", 16
        )
        tl = OBJECT_CLASSES.index("traffic light")
        bb = OBJECT_CLASSES.index("baseball bat")
        ids, mask = assemble_pair_instructions(
            parts, jnp.asarray([tl], jnp.int32), jnp.asarray([bb], jnp.int32)
        )
        got = [int(x) for x in np.asarray(ids)[0][np.asarray(mask)[0]]]
        want = tok.encode("Is there a relation between traffic light and baseball bat?")
        assert got == want


class TestPairSelection:
    def test_topk_excludes_invalid(self):
        logits = jnp.asarray([5.0, 4.0, 3.0, 2.0])
        valid = jnp.asarray([False, True, True, True])
        idx, scores = select_topk_pairs(logits, valid, 2)
        assert list(np.asarray(idx)) == [1, 2]
        np.testing.assert_allclose(
            np.asarray(scores), jax.nn.sigmoid(jnp.asarray([4.0, 3.0])), rtol=1e-6
        )

    def test_multiclass_topk_semantics(self):
        M, R = 3, 4
        logits = jnp.full((M * M, R), -10.0)
        logits = logits.at[1, 2].set(8.0)    # pair (0,1), rel 2
        logits = logits.at[4, 0].set(9.0)    # pair (1,1) — self pair, zeroed
        logits = logits.at[5, 3].set(7.0)    # pair (1,2), rel 3
        valid = jnp.ones((M * M,), bool)
        trips, scores = multiclass_topk_triplets(logits, valid, M, k=3)
        trips = np.asarray(trips)
        assert list(trips[0]) == [0, 1, 2]
        assert list(trips[1]) == [1, 2, 3]   # self-pair (1,1) skipped


class TestHeadForward:
    def test_shapes_and_finiteness(self, tok):
        cfg = HeadV4Config.tiny_test()
        import dataclasses

        cfg = dataclasses.replace(
            cfg, qformer=dataclasses.replace(
                cfg.qformer, vocab_size=tok.vocab_size, max_text_len=16
            )
        )
        head = RelationHeadV4(cfg)
        M = cfg.max_objects_padded
        H4 = 16
        rng = jax.random.PRNGKey(0)
        mf = jax.random.normal(rng, (H4, H4, cfg.object_feature_size))
        masks = jax.random.uniform(rng, (M, H4, H4)) > 0.7
        valid = jnp.asarray([True] * 4 + [False] * (M - 4))
        ids = jnp.ones((M * M, 16), jnp.int32)
        tmask = jnp.ones((M * M, 16), bool)
        params = jax.jit(head.init)(rng, mf, masks, valid, ids, tmask)
        out = jax.jit(head.apply)(params, mf, masks, valid, ids, tmask)
        NP = M * M
        R = cfg.qformer.num_relation_queries
        assert out["qformer_out"].shape == (NP, 1 + R, cfg.qformer.hidden_size)
        assert out["binary_logits"].shape == (NP,)
        assert out["multiclass_logits"].shape == (NP, cfg.num_relation_classes)
        assert out["llm_visual_tokens"].shape == (NP, R, cfg.llm_feature_size)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_pair_select_gathers(self, tok):
        """Training path: pair_select must produce the same outputs as the
        corresponding rows of the full forward."""
        cfg = HeadV4Config.tiny_test()
        import dataclasses

        cfg = dataclasses.replace(
            cfg, qformer=dataclasses.replace(
                cfg.qformer, vocab_size=tok.vocab_size, max_text_len=16
            )
        )
        head = RelationHeadV4(cfg)
        M = cfg.max_objects_padded
        H4 = 16
        rng = jax.random.PRNGKey(1)
        mf = jax.random.normal(rng, (H4, H4, cfg.object_feature_size))
        masks = jax.random.uniform(rng, (M, H4, H4)) > 0.5
        valid = jnp.ones((M,), bool)
        ids = (jax.random.uniform(rng, (M * M, 16)) * 20).astype(jnp.int32) + 4
        tmask = jnp.ones((M * M, 16), bool)
        params = jax.jit(head.init)(rng, mf, masks, valid, ids, tmask)
        full = jax.jit(head.apply)(params, mf, masks, valid, ids, tmask)
        sel = jnp.asarray([3, 17, 42], jnp.int32)
        sub = jax.jit(head.apply)(params, mf, masks, valid, ids, tmask, pair_select=sel)
        np.testing.assert_allclose(
            np.asarray(sub["binary_logits"]),
            np.asarray(full["binary_logits"])[np.asarray(sel)],
            atol=1e-5,
        )


class TestHFTokenizerAdapter:
    def test_wordpiece_roundtrip(self, tmp_path):
        """Adapter over a real transformers tokenizer built from a tiny
        constructed vocab file."""
        from openpsg_tpu.models.relation.hf_tokenizer import HFTokenizer

        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "is", "there", "a",
                 "relation", "between", "person", "sky", "and", "?", "on"]
        vf = tmp_path / "vocab.txt"
        vf.write_text("\n".join(vocab))
        from transformers import BertTokenizerFast

        tok = HFTokenizer(BertTokenizerFast(vocab_file=str(vf), do_lower_case=True))
        assert tok.vocab_size >= len(vocab)  # fast tokenizers may add [MASK]
        assert tok.pad_id == 0

        ids, mask = tok.encode_batch(
            ["is there a relation between person and sky ?"], 16
        )
        assert ids.shape == (1, 16)
        assert mask[0].sum() == 9
        decoded = tok.decode(ids[0][mask[0]]).replace(" ?", "?").replace("?", " ?")
        assert decoded == "is there a relation between person and sky ?"

        # left padding parity with the reference's llm prompts
        ids_l, mask_l = tok.encode_batch(["on"], 4, padding_side="left")
        assert not mask_l[0, 0] and mask_l[0, -1]
        assert ids_l[0, -1] == vocab.index("on")


class TestRightAlign:
    def test_alignment(self):
        from openpsg_tpu.models.relation.head_v4 import right_align

        ids = jnp.asarray([[5, 0, 6, 0, 0], [1, 2, 3, 4, 5]], jnp.int32)
        mask = ids != 0
        a_ids, a_mask = right_align(ids, mask)
        a_ids, a_mask = np.asarray(a_ids), np.asarray(a_mask)
        # row 0: trailing pads wrapped to front; interior hole preserved
        assert list(a_ids[0]) == [0, 0, 5, 0, 6]
        assert a_mask[0, -1] and not a_mask[0, 0]
        # full row unchanged
        assert list(a_ids[1]) == [1, 2, 3, 4, 5]
