"""Pure-Python SentencePiece tokenizer (sp_tokenizer.py) — the loader the
reference's llama_tokenizer.py gets via the sentencepiece wheel
(kings_sgg/models/commons/llama_tokenizer.py), rebuilt dependency-free."""

import jax
import numpy as np
import pytest

from openpsg_tpu.models.relation.sp_tokenizer import (
    BPE,
    BYTE,
    CONTROL,
    NORMAL,
    UNIGRAM,
    UNKNOWN,
    SPACE,
    SentencePieceTokenizer,
    build_sp_model_bytes,
    build_toy_llama_tokenizer,
    parse_model_proto,
)


class TestModelProtoWire:
    def test_round_trip(self):
        pieces = [
            ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
            ("</s>", 0.0, CONTROL), ("<0x41>", 0.0, BYTE),
            (SPACE + "hi", -1.5, NORMAL),
        ]
        data = build_sp_model_bytes(
            pieces, model_type=BPE, unk_id=0, bos_id=1, eos_id=2, pad_id=-1,
            add_dummy_prefix=True,
        )
        m = parse_model_proto(data)
        assert m["pieces"] == [(p, pytest.approx(s), t) for p, s, t in pieces]
        assert m["model_type"] == BPE
        assert (m["unk_id"], m["bos_id"], m["eos_id"]) == (0, 1, 2)
        assert m["pad_id"] == -1  # negative varint survives the wire
        assert m["add_dummy_prefix"] is True

    def test_pad_falls_back_to_unk(self):
        tok = build_toy_llama_tokenizer(["hi"])
        assert tok.pad_id == 0 and tok.bos_id == 1 and tok.eos_id == 2


class TestBPEEncode:
    def test_round_trip_with_dummy_prefix(self):
        tok = build_toy_llama_tokenizer(["hello", "world"])
        ids = tok.encode("hello world")
        assert tok.decode(ids) == "hello world"
        # whole words merged to single pieces via the greedy BPE loop
        assert len(ids) == 2
        assert tok.pieces[ids[0]][0] == SPACE + "hello"

    def test_bos_eos(self):
        tok = build_toy_llama_tokenizer(["hi"])
        ids = tok.encode("hi", add_bos=True, add_eos=True)
        assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id
        assert tok.decode(ids) == "hi"  # stops at eos, skips bos

    def test_byte_fallback_unknown_chars(self):
        tok = build_toy_llama_tokenizer(["hi"])
        ids = tok.encode("héllo")  # é and unseen merges → byte pieces
        assert all(0 <= i < len(tok.pieces) for i in ids)
        assert any(tok.pieces[i][2] == BYTE for i in ids)
        assert tok.decode(ids) == "héllo"

    def test_merge_order_prefers_higher_score(self):
        # pieces: "ab" scores better than "bc"; encoding "abc" must merge
        # "ab" first, leaving "c" (bpe_model.cc best-score-first agenda)
        pieces = [
            ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
            ("</s>", 0.0, CONTROL),
            ("a", -10.0, NORMAL), ("b", -10.0, NORMAL), ("c", -10.0, NORMAL),
            ("ab", -1.0, NORMAL), ("bc", -2.0, NORMAL),
        ]
        tok = SentencePieceTokenizer(build_sp_model_bytes(
            pieces, add_dummy_prefix=False))
        ids = tok.encode("abc")
        assert [tok.pieces[i][0] for i in ids] == ["ab", "c"]

    def test_remove_extra_whitespaces(self):
        tok = build_toy_llama_tokenizer(["hi", "there"])
        assert tok.decode(tok.encode("hi   there ")) == "hi there"


class TestUnigramEncode:
    def test_viterbi_prefers_total_score(self):
        # "abc" as one piece (-1) beats "ab"+"c" (-0.4 + -0.9 = -1.3)
        pieces = [
            ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
            ("</s>", 0.0, CONTROL),
            ("a", -2.0, NORMAL), ("b", -2.0, NORMAL), ("c", -0.9, NORMAL),
            ("ab", -0.4, NORMAL), ("abc", -1.0, NORMAL),
        ]
        tok = SentencePieceTokenizer(build_sp_model_bytes(
            pieces, model_type=UNIGRAM, add_dummy_prefix=False))
        ids = tok.encode("abc")
        assert [tok.pieces[i][0] for i in ids] == ["abc"]

    def test_split_when_cheaper(self):
        pieces = [
            ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
            ("</s>", 0.0, CONTROL),
            ("ab", -0.1, NORMAL), ("c", -0.1, NORMAL), ("abc", -5.0, NORMAL),
        ]
        tok = SentencePieceTokenizer(build_sp_model_bytes(
            pieces, model_type=UNIGRAM, add_dummy_prefix=False))
        ids = tok.encode("abc")
        assert [tok.pieces[i][0] for i in ids] == ["ab", "c"]


class TestSpecialTokens:
    """The reference wrapper's extension: special tokens get ids past vocab
    end and text is split around their substrings (llama_tokenizer.py:38-122)."""

    def test_encode_decode_with_specials(self):
        tok = build_toy_llama_tokenizer(["over", "in", "front", "of"])
        base = tok.vocab_size
        tok.add_special_tokens(["<|relation|>", "<|object|>"])
        assert tok.vocab_size == base + 2
        s = "<|relation|> over <|relation|> in front of"
        ids = tok.encode(s)
        assert ids.count(base) == 2  # two <|relation|> hits
        out = tok.decode(ids)
        assert out.startswith("<|relation|>")
        assert "over" in out and "front of" in out

    def test_specials_never_merge_with_text(self):
        tok = build_toy_llama_tokenizer(["x"])
        tok.add_special_tokens(["<|empty|>"])
        ids = tok.encode("x<|empty|>x")
        sid = tok.special_ttoi["<|empty|>"]
        assert sid in ids
        left = ids[: ids.index(sid)]
        assert all(i < len(tok.pieces) for i in left)


class TestBatchInterface:
    def test_encode_batch_left_padding(self):
        tok = build_toy_llama_tokenizer(["hello", "hi"])
        ids, mask = tok.encode_batch(["hello", "hi hello"], max_len=6,
                                     padding_side="left")
        assert ids.shape == (2, 6) and mask.dtype == bool
        assert not mask[0, 0] and mask[0, -1]
        assert ids[0, 0] == tok.pad_id
        np.testing.assert_array_equal(mask.sum(1) > 0, [True, True])


class TestPipelineIntegration:
    def test_psgv4_accepts_sp_tokenizer(self):
        """The flagship pipeline runs end-to-end with the SP tokenizer in
        the LLM role (reference pairing: SP for Llama, wordpiece for the
        Q-Former — relation_transformer_head_v4.py:85-86, 99-105)."""
        from openpsg_tpu.models.detectors.psg_v4 import PSGv4, PSGv4Config

        classes = ["person", "sky", "dog"]
        relations = ["on", "over", "looking at"]
        words = ("what are the relations between and assistant "
                 "is there a relation " + " ".join(classes + relations)).split()
        tok = build_toy_llama_tokenizer(sorted(set(words)) + ["?", ":"])

        cfg = PSGv4Config.tiny_test()
        p = PSGv4(
            cfg, jax.random.PRNGKey(0), class_names=classes,
            relation_names=relations, num_things=2, tokenizer=tok,
        )
        assert p.llm_parts["pad_id"] == tok.pad_id
        res = p.infer(
            np.zeros((64, 64, 3), np.float32), (60, 64)
        )
        assert set(res) >= {"pan_results", "rel_results", "rel_scores"}
        for s, o, r in res["rel_results"]["relation"]:
            assert 0 <= r < len(relations)


class TestControlPieceInjection:
    def test_literal_eos_text_is_not_control(self):
        """Text containing '</s>' literally must byte-encode, not emit the
        real EOS id (reference wrapper only maps REGISTERED specials)."""
        pieces = [
            ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
            ("</s>", 0.0, CONTROL),
        ] + [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)] + [
            ("</s", -1.0, NORMAL),  # adversarial near-miss NORMAL piece
            ("hello", -1.0, NORMAL),
        ]
        for mtype in (BPE, UNIGRAM):
            tok = SentencePieceTokenizer(build_sp_model_bytes(
                pieces, model_type=mtype, add_dummy_prefix=False))
            ids = tok.encode("</s>hello")
            assert tok.eos_id not in ids and tok.bos_id not in ids
            assert tok.decode(ids, stop_at_eos=True) == "</s>hello"

    def test_model_type_default_is_unigram(self):
        # a proto omitting TrainerSpec.model_type means UNIGRAM (proto2
        # default), not BPE
        from openpsg_tpu.models.relation.sp_tokenizer import (
            UNIGRAM as U, parse_model_proto, _write_field,
        )
        body = b""  # empty TrainerSpec: every field at proto default
        data = _write_field(2, 2, body)
        assert parse_model_proto(data)["model_type"] == U
