"""CLIP BPE tokenizer + language-tower golden parity.

The class-embedding path (clip_bpe tokenize → converted CLIP text tower →
lang_proj → unit-norm) replaces OpenSeeD's
``lang_encoder.get_text_embeddings`` (openseed_relation_v2.py:59-60).
Golden references are built offline from transformers (no downloads):
``CLIPTokenizer`` loaded from our own emitted vocab/merges assets, and a
randomly-initialized ``CLIPTextModel`` whose state dict feeds
``convert_clip_text``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openpsg_tpu.models.commons.clip_bpe import (
    CLIPBPETokenizer,
    bytes_to_unicode,
    write_hf_assets,
)

# a tiny merge list over ASCII letters: enough to exercise multi-step
# rank-greedy merging on real words
# note: the word-end marker is always ATTACHED to a character ("e</w>"),
# never a standalone merge element — the OpenAI format invariant
MERGES = [
    ("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
    ("i", "n"), ("e", "r"),
    ("p", "er"), ("s", "o"), ("so", "n</w>"), ("per", "son</w>"),
    ("o", "n"), ("r", "i"), ("ri", "d"), ("rid", "in"),
    ("ridin", "g</w>"), ("o", "n</w>"),
]


@pytest.fixture(scope="module")
def tok():
    return CLIPBPETokenizer(MERGES)


class TestBPEMechanics:
    def test_bytes_to_unicode_reversible(self):
        m = bytes_to_unicode()
        assert len(m) == 256 and len(set(m.values())) == 256

    def test_merges_apply_in_rank_order(self, tok):
        # 'the' → th + e</w> → the? no: ('th','e</w>') is a merge → 'the</w>'
        ids = tok.encode("the")
        assert [tok.decoder[i] for i in ids] == ["the</w>"]

    def test_unmerged_falls_back_to_chars(self, tok):
        ids = tok.encode("xyz")
        toks = [tok.decoder[i] for i in ids]
        assert toks == ["x", "y", "z</w>"]

    def test_multiword_and_case(self, tok):
        a = tok.encode("The Person")
        b = tok.encode("the person")
        assert a == b
        assert [tok.decoder[i] for i in a] == ["the</w>", "person</w>"]

    def test_roundtrip_decode(self, tok):
        assert tok.decode(tok.encode("riding on the person")) == (
            "riding on the person"
        )

    def test_call_pads_and_wraps(self, tok):
        out = tok(["the"])
        assert out.shape == (1, 77)
        assert out[0, 0] == tok.encoder[tok.SOT]
        assert out[0, 2] == tok.eot_id
        assert out[0, 3:].sum() == 0


class TestHFGoldenParity:
    def test_ids_match_transformers_cliptokenizer(self, tok, tmp_path):
        from transformers import CLIPTokenizer

        write_hf_assets(tok, str(tmp_path))
        hf = CLIPTokenizer(
            vocab_file=str(tmp_path / "vocab.json"),
            merges_file=str(tmp_path / "merges.txt"),
        )
        for text in (
            "the person", "riding", "a dog-stuff and tree",
            "person riding the thing", "banana", "wall-brick",
        ):
            ours = [tok.encoder[tok.SOT]] + tok.encode(text) + [tok.eot_id]
            theirs = hf(text)["input_ids"]
            assert ours == theirs, (text, ours, theirs)


class TestClipTowerGolden:
    def _hf_model_and_cfg(self):
        import torch
        from transformers import CLIPTextConfig, CLIPTextModel

        from openpsg_tpu.models.commons.text_encoder import BertStyleConfig

        torch.manual_seed(0)
        hf_cfg = CLIPTextConfig(
            vocab_size=64, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=8,
            max_position_embeddings=77, hidden_act="quick_gelu",
        )
        model = CLIPTextModel(hf_cfg).eval()
        cfg = BertStyleConfig(
            hidden_size=32, num_layers=2, num_heads=8, intermediate=128,
            vocab_size=64, max_len=77, pre_ln=True, quick_gelu=True,
            causal=True, ln_eps=1e-5,
        )
        return model, cfg

    def test_hidden_states_match_hf(self):
        import torch

        from openpsg_tpu.models.commons.text_encoder import BertStyleEncoder
        from openpsg_tpu.models.commons.weight_convert import convert_clip_text

        model, cfg = self._hf_model_and_cfg()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_clip_text(state, cfg)

        ids = np.array([[5, 9, 13, 63, 0, 0], [7, 63, 0, 0, 0, 0]], np.int64)
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()

        enc = BertStyleEncoder(cfg)
        # CLIP attends causally with NO padding mask (pads sit after EOT
        # and are causally invisible from it)
        params = dict(params)
        init = enc.init(jax.random.PRNGKey(0), token_ids=jnp.asarray(ids, jnp.int32))
        params["pooler"] = init["params"]["pooler"]
        got = enc.apply(
            {"params": params}, token_ids=jnp.asarray(ids, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_class_embeddings_pipeline(self, tok):
        """names → BPE → converted tower → EOT pool → lang_proj → unit-norm
        matches the same composition done with torch/HF ops."""
        import torch

        from openpsg_tpu.models.commons.weight_convert import convert_clip_text
        from openpsg_tpu.models.segmenter.language import clip_class_embeddings

        model, cfg = self._hf_model_and_cfg()
        # re-size the tiny HF model's vocab to the tokenizer's
        V = tok.vocab_size
        import dataclasses as dc

        from transformers import CLIPTextConfig, CLIPTextModel

        torch.manual_seed(1)
        hf = CLIPTextModel(CLIPTextConfig(
            vocab_size=V, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=8,
            max_position_embeddings=77, hidden_act="quick_gelu",
        )).eval()
        cfg = dc.replace(cfg, vocab_size=V)
        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = convert_clip_text(state, cfg)
        rng = np.random.default_rng(0)
        lang_proj = rng.normal(size=(32, 16)).astype(np.float32)

        names = ["person", "the thing", "riding"]
        got = clip_class_embeddings(cfg, params, lang_proj, tok, names)

        ids = tok(names)
        with torch.no_grad():
            x = hf(input_ids=torch.tensor(ids.astype(np.int64))).last_hidden_state
        eot = ids.argmax(-1)
        pooled = x[np.arange(len(names)), eot].numpy()
        ref = pooled @ lang_proj
        ref = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(got, ref, atol=2e-5)
        np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-4)
