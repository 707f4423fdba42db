"""Weight conversion: HF Llama layout → scanned flax tree.

No real checkpoints exist in this environment, so we build a synthetic HF
state dict with the canonical tensor names/shapes, convert, check the tree
matches a fresh init exactly, and check logits change when weights load
(i.e. the converted values actually land)."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openpsg_tpu.models.llm.llama import LlamaConfig, LlamaWithEmbeddings
from openpsg_tpu.models.llm.weight_convert import convert_llama, verify_structure


def synthetic_hf_state(cfg: LlamaConfig, seed=0):
    rng = np.random.default_rng(seed)
    hd = cfg.dim // cfg.n_heads
    kv = cfg.n_kv_heads * hd
    s = {}
    s["model.embed_tokens.weight"] = rng.normal(size=(cfg.vocab_size, cfg.dim)).astype(np.float32)
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        s[p + "self_attn.q_proj.weight"] = rng.normal(size=(cfg.dim, cfg.dim)).astype(np.float32)
        s[p + "self_attn.k_proj.weight"] = rng.normal(size=(kv, cfg.dim)).astype(np.float32)
        s[p + "self_attn.v_proj.weight"] = rng.normal(size=(kv, cfg.dim)).astype(np.float32)
        s[p + "self_attn.o_proj.weight"] = rng.normal(size=(cfg.dim, cfg.dim)).astype(np.float32)
        s[p + "mlp.gate_proj.weight"] = rng.normal(size=(cfg.ffn_hidden, cfg.dim)).astype(np.float32)
        s[p + "mlp.up_proj.weight"] = rng.normal(size=(cfg.ffn_hidden, cfg.dim)).astype(np.float32)
        s[p + "mlp.down_proj.weight"] = rng.normal(size=(cfg.dim, cfg.ffn_hidden)).astype(np.float32)
        s[p + "input_layernorm.weight"] = np.ones(cfg.dim, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(cfg.dim, np.float32)
    s["model.norm.weight"] = np.ones(cfg.dim, np.float32)
    s["lm_head.weight"] = rng.normal(size=(cfg.vocab_size, cfg.dim)).astype(np.float32)
    return s


class TestLlamaConvert:
    def test_structure_matches_init(self):
        cfg = LlamaConfig.tiny_test(vocab_size=64)
        model = LlamaWithEmbeddings(cfg)
        ids = jnp.zeros((1, 4), jnp.int32)
        init = jax.jit(
            lambda k: model.init(
                k, token_ids=ids,
                attention_mask=jnp.ones((1, 4), bool),
                positions=jnp.arange(4)[None],
            )
        )(jax.random.PRNGKey(0))
        conv = convert_llama(synthetic_hf_state(cfg), cfg, dtype=jnp.float32)
        verify_structure(conv, init)  # must not raise

    def test_converted_weights_are_used(self):
        cfg = LlamaConfig.tiny_test(vocab_size=64)
        model = LlamaWithEmbeddings(cfg)
        ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        mask = jnp.ones((1, 4), bool)
        pos = jnp.arange(4)[None]
        conv1 = convert_llama(synthetic_hf_state(cfg, seed=0), cfg, dtype=jnp.float32)
        conv2 = convert_llama(synthetic_hf_state(cfg, seed=1), cfg, dtype=jnp.float32)
        f = jax.jit(lambda p: model.apply(p, token_ids=ids, attention_mask=mask, positions=pos)[0])
        l1, l2 = f(conv1), f(conv2)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))
        assert np.isfinite(np.asarray(l1)).all()

    def test_truncation(self):
        cfg = LlamaConfig.tiny_test(vocab_size=64)
        full = synthetic_hf_state(cfg)
        tcfg = cfg.truncate(1)
        conv = convert_llama(full, tcfg, dtype=jnp.float32)
        stacked = conv["params"]["core"]["layers"]["wq"]["kernel"]
        assert stacked.shape[0] == 1

    def test_drift_detection(self):
        cfg = LlamaConfig.tiny_test(vocab_size=64)
        model = LlamaWithEmbeddings(cfg)
        ids = jnp.zeros((1, 4), jnp.int32)
        init = model.init(
            jax.random.PRNGKey(0), token_ids=ids,
            attention_mask=jnp.ones((1, 4), bool), positions=jnp.arange(4)[None],
        )
        conv = convert_llama(synthetic_hf_state(cfg), cfg, dtype=jnp.float32)
        del conv["params"]["core"]["final_norm"]
        with pytest.raises(ValueError, match="drift"):
            verify_structure(conv, init)


def synthetic_swin_state(embed_dim=16, depths=(1, 1), num_heads=(1, 2), window=4, seed=0):
    rng = np.random.default_rng(seed)
    s = {}
    s["patch_embed.proj.weight"] = rng.normal(size=(embed_dim, 3, 4, 4)).astype(np.float32)
    s["patch_embed.proj.bias"] = rng.normal(size=(embed_dim,)).astype(np.float32)
    s["patch_embed.norm.weight"] = np.ones(embed_dim, np.float32)
    s["patch_embed.norm.bias"] = np.zeros(embed_dim, np.float32)
    dim = embed_dim
    for st, depth in enumerate(depths):
        for b in range(depth):
            p = f"layers.{st}.blocks.{b}."
            s[p + "norm1.weight"] = np.ones(dim, np.float32)
            s[p + "norm1.bias"] = np.zeros(dim, np.float32)
            s[p + "norm2.weight"] = np.ones(dim, np.float32)
            s[p + "norm2.bias"] = np.zeros(dim, np.float32)
            s[p + "attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
            s[p + "attn.qkv.bias"] = rng.normal(size=(3 * dim,)).astype(np.float32)
            s[p + "attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
            s[p + "attn.proj.bias"] = rng.normal(size=(dim,)).astype(np.float32)
            s[p + "attn.relative_position_bias_table"] = rng.normal(
                size=((2 * window - 1) ** 2, num_heads[st])
            ).astype(np.float32)
            s[p + "mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
            s[p + "mlp.fc1.bias"] = rng.normal(size=(4 * dim,)).astype(np.float32)
            s[p + "mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
            s[p + "mlp.fc2.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        if st < len(depths) - 1:
            s[f"layers.{st}.downsample.reduction.weight"] = rng.normal(
                size=(2 * dim, 4 * dim)
            ).astype(np.float32)
            s[f"layers.{st}.downsample.norm.weight"] = np.ones(4 * dim, np.float32)
            s[f"layers.{st}.downsample.norm.bias"] = np.zeros(4 * dim, np.float32)
            dim *= 2
        s[f"norm{st}.weight"] = np.ones(dim if st == len(depths) - 1 else dim, np.float32)
        s[f"norm{st}.bias"] = np.zeros_like(s[f"norm{st}.weight"])
    return s


class TestSwinConvert:
    def test_structure_and_values_land(self):
        from openpsg_tpu.models.segmenter.swin import SwinTransformer
        from openpsg_tpu.models.segmenter.weight_convert import convert_swin

        depths, heads, window, ed = (1, 1), (1, 2), 4, 16
        m = SwinTransformer(embed_dim=ed, depths=depths, num_heads=heads, window=window)
        x = jnp.ones((16, 16, 3))
        init = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]

        # out_norm dims: stage0 norm has dim=16 (before merge doubling)
        state = synthetic_swin_state(ed, depths, heads, window)
        state["norm0.weight"] = np.ones(16, np.float32)
        state["norm0.bias"] = np.zeros(16, np.float32)
        conv = convert_swin(state, depths=depths)
        from openpsg_tpu.models.llm.weight_convert import verify_structure

        verify_structure({"params": conv}, {"params": init})
        o1 = m.apply({"params": conv}, x)
        conv2 = convert_swin(synthetic_swin_state(ed, depths, heads, window, seed=1) |
                             {"norm0.weight": np.ones(16, np.float32),
                              "norm0.bias": np.zeros(16, np.float32)},
                             depths=depths)
        o2 = m.apply({"params": conv2}, x)
        assert not np.allclose(np.asarray(o1[0]), np.asarray(o2[0]))


def synthetic_bert_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    D, I, V, L = cfg.hidden_size, cfg.intermediate, cfg.vocab_size, cfg.max_len
    s = {
        "embeddings.word_embeddings.weight": rng.normal(size=(V, D)).astype(np.float32),
        "embeddings.position_embeddings.weight": rng.normal(size=(512, D)).astype(np.float32),
        "embeddings.LayerNorm.weight": np.ones(D, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(D, np.float32),
        "pooler.dense.weight": rng.normal(size=(D, D)).astype(np.float32),
        "pooler.dense.bias": np.zeros(D, np.float32),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        for n in ("query", "key", "value"):
            s[p + f"attention.self.{n}.weight"] = rng.normal(size=(D, D)).astype(np.float32)
            s[p + f"attention.self.{n}.bias"] = np.zeros(D, np.float32)
        s[p + "attention.output.dense.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        s[p + "attention.output.dense.bias"] = np.zeros(D, np.float32)
        s[p + "attention.output.LayerNorm.weight"] = np.ones(D, np.float32)
        s[p + "attention.output.LayerNorm.bias"] = np.zeros(D, np.float32)
        s[p + "intermediate.dense.weight"] = rng.normal(size=(I, D)).astype(np.float32)
        s[p + "intermediate.dense.bias"] = np.zeros(I, np.float32)
        s[p + "output.dense.weight"] = rng.normal(size=(D, I)).astype(np.float32)
        s[p + "output.dense.bias"] = np.zeros(D, np.float32)
        s[p + "output.LayerNorm.weight"] = np.ones(D, np.float32)
        s[p + "output.LayerNorm.bias"] = np.zeros(D, np.float32)
    return s


class TestBertConvert:
    def test_structure_and_truncation(self):
        from openpsg_tpu.models.commons.text_encoder import (
            BertStyleConfig,
            BertStyleEncoder,
        )
        from openpsg_tpu.models.commons.weight_convert import convert_bert
        from openpsg_tpu.models.llm.weight_convert import verify_structure

        cfg = BertStyleConfig.tiny_test()
        enc = BertStyleEncoder(cfg)
        ids = jnp.zeros((1, 5), jnp.int32)
        init = jax.jit(lambda k: enc.init(k, token_ids=ids))(jax.random.PRNGKey(0))
        conv = {"params": convert_bert(synthetic_bert_state(cfg), cfg)}
        verify_structure(conv, init)
        o1 = enc.apply(conv, token_ids=ids)
        o2 = enc.apply(
            {"params": convert_bert(synthetic_bert_state(cfg, seed=1), cfg)},
            token_ids=ids,
        )
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        assert np.isfinite(np.asarray(o1)).all()


def synthetic_clip_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    D, I, V = cfg.hidden_size, cfg.intermediate, cfg.vocab_size
    s = {
        "text_model.embeddings.token_embedding.weight": rng.normal(size=(V, D)).astype(np.float32),
        "text_model.embeddings.position_embedding.weight": rng.normal(size=(77, D)).astype(np.float32),
        "text_model.final_layer_norm.weight": np.ones(D, np.float32),
        "text_model.final_layer_norm.bias": np.zeros(D, np.float32),
    }
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}."
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s[p + f"self_attn.{n}.weight"] = rng.normal(size=(D, D)).astype(np.float32)
            s[p + f"self_attn.{n}.bias"] = np.zeros(D, np.float32)
        for n in ("layer_norm1", "layer_norm2"):
            s[p + f"{n}.weight"] = np.ones(D, np.float32)
            s[p + f"{n}.bias"] = np.zeros(D, np.float32)
        s[p + "mlp.fc1.weight"] = rng.normal(size=(I, D)).astype(np.float32)
        s[p + "mlp.fc1.bias"] = np.zeros(I, np.float32)
        s[p + "mlp.fc2.weight"] = rng.normal(size=(D, I)).astype(np.float32)
        s[p + "mlp.fc2.bias"] = np.zeros(D, np.float32)
    return s


def _lin(rng, o, i):
    return rng.normal(size=(o, i)).astype(np.float32)


def synthetic_openseed_state(cfg, num_lang_layers=2, lang_dim=32, vocab=64, seed=0):
    """Synthetic checkpoint with the canonical OpenSeeD key schema (the
    layout convert_openseed documents; see weight_convert.py docstring)."""
    rng = np.random.default_rng(seed)
    C, K, L = cfg.dim, cfg.num_points, cfg.total_levels
    nH = 8
    s = {}

    # ---- backbone (standard Swin names under 'backbone.') ----
    dims = [cfg.embed_dim * (2 ** i) for i in range(len(cfg.depths))]
    s["backbone.patch_embed.proj.weight"] = rng.normal(
        size=(cfg.embed_dim, 3, 4, 4)).astype(np.float32)
    s["backbone.patch_embed.proj.bias"] = np.zeros(cfg.embed_dim, np.float32)
    s["backbone.patch_embed.norm.weight"] = np.ones(cfg.embed_dim, np.float32)
    s["backbone.patch_embed.norm.bias"] = np.zeros(cfg.embed_dim, np.float32)
    for st, depth in enumerate(cfg.depths):
        d = dims[st]
        for b in range(depth):
            p = f"backbone.layers.{st}.blocks.{b}."
            s[p + "norm1.weight"] = np.ones(d, np.float32)
            s[p + "norm1.bias"] = np.zeros(d, np.float32)
            s[p + "norm2.weight"] = np.ones(d, np.float32)
            s[p + "norm2.bias"] = np.zeros(d, np.float32)
            s[p + "attn.qkv.weight"] = _lin(rng, 3 * d, d)
            s[p + "attn.qkv.bias"] = np.zeros(3 * d, np.float32)
            s[p + "attn.proj.weight"] = _lin(rng, d, d)
            s[p + "attn.proj.bias"] = np.zeros(d, np.float32)
            s[p + "attn.relative_position_bias_table"] = rng.normal(
                size=((2 * cfg.window - 1) ** 2, cfg.num_heads[st])
            ).astype(np.float32)
            s[p + "mlp.fc1.weight"] = _lin(rng, 4 * d, d)
            s[p + "mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
            s[p + "mlp.fc2.weight"] = _lin(rng, d, 4 * d)
            s[p + "mlp.fc2.bias"] = np.zeros(d, np.float32)
        if st < len(cfg.depths) - 1:
            s[f"backbone.layers.{st}.downsample.reduction.weight"] = _lin(
                rng, 2 * d, 4 * d)
            s[f"backbone.layers.{st}.downsample.norm.weight"] = np.ones(4 * d, np.float32)
            s[f"backbone.layers.{st}.downsample.norm.bias"] = np.zeros(4 * d, np.float32)
        s[f"backbone.norm{st}.weight"] = np.ones(d, np.float32)
        s[f"backbone.norm{st}.bias"] = np.zeros(d, np.float32)

    # ---- pixel decoder ----
    pd = "sem_seg_head.pixel_decoder."
    # input_proj order (32, 16, 8, 64): reversed backbone levels + extras
    in_ch = {32: dims[3], 16: dims[2], 8: dims[1], 64: dims[3]}
    for j, stride in enumerate((32, 16, 8, 64)[:L]):
        k = 1 if stride <= 32 else 3
        s[pd + f"input_proj.{j}.0.weight"] = rng.normal(
            size=(C, in_ch[stride], k, k)).astype(np.float32)
        s[pd + f"input_proj.{j}.0.bias"] = np.zeros(C, np.float32)
        s[pd + f"input_proj.{j}.1.weight"] = np.ones(C, np.float32)
        s[pd + f"input_proj.{j}.1.bias"] = np.zeros(C, np.float32)
    s[pd + "transformer.level_embed"] = rng.normal(size=(L, C)).astype(np.float32)

    def msda(base):
        s[base + ".sampling_offsets.weight"] = _lin(rng, nH * L * K * 2, C)
        s[base + ".sampling_offsets.bias"] = np.zeros(nH * L * K * 2, np.float32)
        s[base + ".attention_weights.weight"] = _lin(rng, nH * L * K, C)
        s[base + ".attention_weights.bias"] = np.zeros(nH * L * K, np.float32)
        s[base + ".value_proj.weight"] = _lin(rng, C, C)
        s[base + ".value_proj.bias"] = np.zeros(C, np.float32)
        s[base + ".output_proj.weight"] = _lin(rng, C, C)
        s[base + ".output_proj.bias"] = np.zeros(C, np.float32)

    def norm(base, d=None):
        s[base + ".weight"] = np.ones(d or C, np.float32)
        s[base + ".bias"] = np.zeros(d or C, np.float32)

    for l in range(cfg.enc_layers):
        base = pd + f"transformer.encoder.layers.{l}"
        msda(base + ".self_attn")
        norm(base + ".norm1")
        s[base + ".linear1.weight"] = _lin(rng, cfg.ffn_hidden, C)
        s[base + ".linear1.bias"] = np.zeros(cfg.ffn_hidden, np.float32)
        s[base + ".linear2.weight"] = _lin(rng, C, cfg.ffn_hidden)
        s[base + ".linear2.bias"] = np.zeros(C, np.float32)
        norm(base + ".norm2")

    s[pd + "adapter_1.weight"] = rng.normal(size=(C, dims[0], 1, 1)).astype(np.float32)
    norm(pd + "adapter_1.norm")
    s[pd + "layer_1.weight"] = rng.normal(size=(C, C, 3, 3)).astype(np.float32)
    norm(pd + "layer_1.norm")
    s[pd + "mask_features.weight"] = rng.normal(
        size=(cfg.mask_dim, C, 1, 1)).astype(np.float32)
    s[pd + "mask_features.bias"] = np.zeros(cfg.mask_dim, np.float32)

    # ---- predictor (query decoder) ----
    pr = "sem_seg_head.predictor."
    s[pr + "class_embed"] = rng.normal(size=(C, cfg.proj_dim)).astype(np.float32)
    s[pr + "enc_output.weight"] = _lin(rng, C, C)
    s[pr + "enc_output.bias"] = np.zeros(C, np.float32)
    norm(pr + "enc_output_norm")
    norm(pr + "decoder_norm")
    s[pr + "label_enc.weight"] = _lin(rng, 134, C)  # denoise-only → dropped

    def mlp(base, widths):
        for j, (o, i) in enumerate(widths):
            s[base + f".layers.{j}.weight"] = _lin(rng, o, i)
            s[base + f".layers.{j}.bias"] = np.zeros(o, np.float32)

    mlp(pr + "mask_embed", [(C, C), (C, C), (cfg.mask_dim, C)])
    mlp(pr + "decoder.ref_point_head", [(C, 2 * C), (C, C)])
    for l in range(cfg.dec_layers + 1):  # +1: two-stage proposal head
        mlp(pr + f"bbox_embed.{l}", [(C, C), (C, C), (4, C)])
    for l in range(cfg.dec_layers):
        base = pr + f"decoder.layers.{l}"
        msda(base + ".cross_attn")
        norm(base + ".norm1")
        s[base + ".self_attn.in_proj_weight"] = _lin(rng, 3 * C, C)
        s[base + ".self_attn.in_proj_bias"] = np.zeros(3 * C, np.float32)
        s[base + ".self_attn.out_proj.weight"] = _lin(rng, C, C)
        s[base + ".self_attn.out_proj.bias"] = np.zeros(C, np.float32)
        norm(base + ".norm2")
        s[base + ".linear1.weight"] = _lin(rng, cfg.ffn_hidden, C)
        s[base + ".linear1.bias"] = np.zeros(cfg.ffn_hidden, np.float32)
        s[base + ".linear2.weight"] = _lin(rng, C, cfg.ffn_hidden)
        s[base + ".linear2.bias"] = np.zeros(C, np.float32)
        norm(base + ".norm3")

    # ---- language encoder (X-Decoder CLIP tower) ----
    le = pr + "lang_encoder."
    s[le + "logit_scale"] = np.asarray(2.659, np.float32)
    s[le + "lang_proj"] = rng.normal(size=(lang_dim, cfg.proj_dim)).astype(np.float32)
    s[le + "lang_encoder.token_embedding.weight"] = _lin(rng, vocab, lang_dim)
    s[le + "lang_encoder.positional_embedding"] = rng.normal(
        size=(77, lang_dim)).astype(np.float32)
    for i in range(num_lang_layers):
        base = le + f"lang_encoder.transformer.resblocks.{i}"
        s[base + ".attn.in_proj_weight"] = _lin(rng, 3 * lang_dim, lang_dim)
        s[base + ".attn.in_proj_bias"] = np.zeros(3 * lang_dim, np.float32)
        s[base + ".attn.out_proj.weight"] = _lin(rng, lang_dim, lang_dim)
        s[base + ".attn.out_proj.bias"] = np.zeros(lang_dim, np.float32)
        norm(base + ".ln_1", lang_dim)
        norm(base + ".ln_2", lang_dim)
        s[base + ".mlp.c_fc.weight"] = _lin(rng, 4 * lang_dim, lang_dim)
        s[base + ".mlp.c_fc.bias"] = np.zeros(4 * lang_dim, np.float32)
        s[base + ".mlp.c_proj.weight"] = _lin(rng, lang_dim, 4 * lang_dim)
        s[base + ".mlp.c_proj.bias"] = np.zeros(lang_dim, np.float32)
    norm(le + "lang_encoder.ln_final", lang_dim)
    return s


class TestOpenSeedConvert:
    def _cfg(self):
        import dataclasses as dc

        from openpsg_tpu.models.segmenter.openseed import SegmenterConfig

        return dc.replace(SegmenterConfig.tiny_test(), total_levels=4, proj_dim=32)

    def test_full_trunk_structure_matches_init(self):
        from openpsg_tpu.models.llm.weight_convert import verify_structure
        from openpsg_tpu.models.segmenter.openseed import OpenSeedSegmenter
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = self._cfg()
        state = synthetic_openseed_state(cfg)
        params, lang = convert_openseed(state, cfg)  # strict: no leftovers

        model = OpenSeedSegmenter(cfg)
        img = jnp.zeros((64, 64, 3), jnp.float32)
        ce = jnp.zeros((7, cfg.proj_dim), jnp.float32)
        init = jax.eval_shape(
            lambda k: model.init(k, img, ce), jax.random.PRNGKey(0)
        )
        verify_structure({"params": params}, init)
        assert lang["lang_proj"].shape == (32, 32)

    def test_converted_trunk_runs(self):
        from openpsg_tpu.models.segmenter.openseed import OpenSeedSegmenter
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = self._cfg()
        params, _ = convert_openseed(synthetic_openseed_state(cfg), cfg)
        model = OpenSeedSegmenter(cfg)
        img = jnp.ones((64, 64, 3), jnp.float32) * 0.1
        ce = jnp.asarray(
            np.random.default_rng(0).normal(size=(7, cfg.proj_dim)), jnp.float32
        )
        out = jax.jit(model.apply)({"params": params}, img, ce)
        assert out["cls_logits"].shape == (cfg.num_queries, 7)
        assert out["mask_features"].shape == (16, 16, cfg.mask_dim)
        assert np.isfinite(np.asarray(out["cls_logits"])).all()

    def test_strict_unmapped_key_raises(self):
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = self._cfg()
        state = synthetic_openseed_state(cfg)
        state["sem_seg_head.predictor.some_new_tensor"] = np.zeros(3, np.float32)
        with pytest.raises(ValueError, match="unmapped"):
            convert_openseed(state, cfg)

    def test_level_permutation_applied(self):
        # level_embed row for internal level 0 (stride 8) must come from
        # checkpoint index 2 under the default (32, 16, 8, 64) order
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = self._cfg()
        state = synthetic_openseed_state(cfg)
        le = state["sem_seg_head.pixel_decoder.transformer.level_embed"]
        params, _ = convert_openseed(state, cfg)
        got = params["pixel_decoder"]["level_embed"]
        np.testing.assert_allclose(got[0], le[2])   # s8
        np.testing.assert_allclose(got[1], le[1])   # s16
        np.testing.assert_allclose(got[2], le[0])   # s32
        np.testing.assert_allclose(got[3], le[3])   # s64

    def test_level_order_knob_equivalence(self):
        """VERDICT r2 next #6a: the converter's documented escape hatch
        for its one unverifiable layout assumption.  A checkpoint whose
        level-indexed tensors are stored in a DIFFERENT order must convert
        to the IDENTICAL param tree once the knobs declare that order —
        flipping ``ckpt_level_strides`` / ``ckpt_input_proj_strides`` is
        the complete fix, no code changes."""
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = self._cfg()
        state_a = synthetic_openseed_state(cfg)
        order_a = (32, 16, 8, 64)
        order_b = (8, 16, 32, 64)   # deliberately permuted storage order

        nH, K, L = 8, cfg.num_points, cfg.total_levels
        # old level index (in state_a) for each new level index (state_b)
        lvl_perm = [order_a.index(s) for s in order_b]

        def permute_levels_rows(a, tail):
            # torch [out, ...]: out = nH*L*K*tail; reorder the L axis
            rest = a.shape[1:]
            x = a.reshape(nH, L, K, tail, *rest)
            return np.take(x, lvl_perm, axis=1).reshape(a.shape)

        state_b = {}
        for k, v in state_a.items():
            m = re.match(
                r"(sem_seg_head\.pixel_decoder\.input_proj\.)(\d)(\..*)", k
            )
            if m:
                stride = order_a[int(m.group(2))]
                state_b[m.group(1) + str(order_b.index(stride)) + m.group(3)] = v
                continue
            if k.endswith("transformer.level_embed"):
                state_b[k] = v[np.asarray(lvl_perm)]
                continue
            if ".sampling_offsets." in k:
                state_b[k] = permute_levels_rows(v, 2)
                continue
            if ".attention_weights." in k:
                state_b[k] = permute_levels_rows(v, 1)
                continue
            state_b[k] = v

        params_a, _ = convert_openseed(state_a, cfg)
        params_b, _ = convert_openseed(
            state_b, cfg,
            ckpt_level_strides=order_b, ckpt_input_proj_strides=order_b,
        )
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)
            ),
            params_a, params_b,
        )
        # and WITHOUT declaring the order the result must differ (the knob
        # is load-bearing, not a no-op): level_embed rows come out permuted
        params_wrong, _ = convert_openseed(
            state_b, cfg,
            # keep input_proj declared correctly so shapes still line up;
            # only the level_embed/msda order knob is "forgotten"
            ckpt_input_proj_strides=order_b,
        )
        assert np.abs(
            np.asarray(params_a["pixel_decoder"]["level_embed"])
            - np.asarray(params_wrong["pixel_decoder"]["level_embed"])
        ).max() > 0

    def test_conversion_report(self):
        """Load-time sanity report (VERDICT r2 next #6b): one line per
        level with embed norms / input_proj shapes, key coverage, and the
        knob pointer."""
        from openpsg_tpu.models.segmenter.weight_convert import (
            conversion_report,
            convert_openseed,
        )

        cfg = self._cfg()
        state = synthetic_openseed_state(cfg)
        params, _ = convert_openseed(state, cfg)
        rep = conversion_report(params, cfg, state)
        for s in (8, 16, 32, 64):
            assert f"stride {s:>3}" in rep
        assert "checkpoint keys:" in rep and "backbone=" in rep
        assert "param counts:" in rep
        assert "ckpt_level_strides" in rep

    def test_encoder_layer_matches_torch_golden(self):
        """VALUE-level converter parity for the riskiest piece: one
        deformable encoder layer.  An independent torch mirror of the
        canonical Deformable-DETR encoder layer (grid_sample-based MSDA,
        post-norm residuals — the semantics of the CUDA module the
        reference depends on, SURVEY §2.9) consumes the synthetic
        checkpoint tensors directly in CHECKPOINT level order
        (32, 16, 8, 64); our flax layer consumes them through
        ``convert_openseed`` in internal order (8, 16, 32, 64).  Outputs
        must agree token-for-token after level-block reordering — this
        exercises `_msda`'s level permutation, every weight transpose,
        bias mapping, softmax-over-(L·K), offset normalization, and the
        LayerNorm placements, none of which the structural tests see."""
        import torch
        import torch.nn.functional as F

        from openpsg_tpu.models.segmenter.deform_layers import (
            DeformableEncoderLayer,
            make_reference_points,
        )
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = self._cfg()
        nH, K, C = 8, cfg.num_points, cfg.dim
        state = synthetic_openseed_state(cfg)

        # randomize the encoder-layer tensors the synthetic state zeros/ones
        # out (biases, norm scales): zeros can't catch a dropped or
        # transposed bias/scale mapping
        rng = np.random.default_rng(7)
        base = "sem_seg_head.pixel_decoder.transformer.encoder.layers.0"
        for k in list(state):
            if k.startswith(base) and (
                k.endswith(".bias")
                or ".norm" in k and k.endswith(".weight")
            ):
                state[k] = rng.normal(
                    scale=0.5, size=state[k].shape
                ).astype(np.float32)
        # keep sampling offsets small so samples stay mostly in-bounds
        state[base + ".self_attn.sampling_offsets.weight"] *= 0.05
        state[base + ".self_attn.sampling_offsets.bias"] *= 0.2

        params, _ = convert_openseed(state, cfg)
        layer0 = jax.tree_util.tree_map(
            lambda a: a[0], params["pixel_decoder"]["layers"]["layer"]
        )

        # geometry: image 96x128 -> internal strides (8, 16, 32, 64)
        shapes_int = [(12, 16), (6, 8), (3, 4), (2, 2)]
        stride_of = {(12, 16): 8, (6, 8): 16, (3, 4): 32, (2, 2): 64}
        ckpt_strides = (32, 16, 8, 64)
        shapes_ckpt = [
            next(s for s in shapes_int if stride_of[s] == st)
            for st in ckpt_strides
        ]
        L = len(shapes_int)

        # per-level src/pos token blocks, shared between both orders
        blocks = {
            stride_of[s]: (
                rng.normal(size=(s[0] * s[1], C)).astype(np.float32),
                rng.normal(size=(s[0] * s[1], C)).astype(np.float32),
                np.asarray(make_reference_points([s])),
            )
            for s in shapes_int
        }
        cat = lambda shapes, i: np.concatenate(
            [blocks[stride_of[s]][i] for s in shapes], 0
        )
        src_int, pos_int, ref_int = (cat(shapes_int, i) for i in range(3))
        src_ck, pos_ck, ref_ck = (cat(shapes_ckpt, i) for i in range(3))

        # ---- torch mirror (checkpoint level order) ----
        tt = lambda k: torch.tensor(state[base + k])
        lin = lambda x, k: x @ tt(k + ".weight").T + tt(k + ".bias")
        ln = lambda x, k: F.layer_norm(
            x, (C,), tt(k + ".weight"), tt(k + ".bias"), eps=1e-5
        )
        src_t = torch.tensor(src_ck)
        q = src_t + torch.tensor(pos_ck)
        Lq = src_t.shape[0]
        hd = C // nH
        v = lin(src_t, ".self_attn.value_proj")
        off = lin(q, ".self_attn.sampling_offsets").reshape(Lq, nH, L, K, 2)
        att = lin(q, ".self_attn.attention_weights").reshape(Lq, nH, L * K)
        att = torch.softmax(att, -1).reshape(Lq, nH, L, K)
        normalizer = torch.tensor(
            [(w, h) for (h, w) in shapes_ckpt], dtype=torch.float32
        )
        ref_t = torch.tensor(ref_ck)
        loc = (
            ref_t[:, None, None, None, :]
            + off / normalizer[None, None, :, None, :]
        )
        starts = np.cumsum([0] + [h * w for h, w in shapes_ckpt])
        attn_out = torch.zeros(Lq, nH, hd)
        for lvl, (h, w) in enumerate(shapes_ckpt):
            vl = (
                v[starts[lvl]:starts[lvl + 1]]
                .reshape(h, w, nH, hd)
                .permute(2, 3, 0, 1)
            )                                             # [nH, hd, h, w]
            g = (loc[:, :, lvl] * 2.0 - 1.0).permute(1, 0, 2, 3)  # [nH,Lq,K,2]
            sm = F.grid_sample(
                vl, g, mode="bilinear", padding_mode="zeros",
                align_corners=False,
            )                                             # [nH, hd, Lq, K]
            wl = att[:, :, lvl].permute(1, 0, 2)[:, None]  # [nH, 1, Lq, K]
            attn_out += (sm * wl).sum(-1).permute(2, 0, 1)
        h1 = ln(src_t + lin(attn_out.reshape(Lq, C), ".self_attn.output_proj"),
                ".norm1")
        h2 = ln(h1 + lin(torch.relu(lin(h1, ".linear1")), ".linear2"), ".norm2")
        want_ck = h2.numpy()

        # ---- our layer (internal order, converted weights) ----
        layer = DeformableEncoderLayer(C, nH, L, K, cfg.ffn_hidden)
        got_int = np.asarray(
            jax.jit(
                lambda p, s, r, pe: layer.apply(
                    {"params": p}, s, tuple(shapes_int), r, pe
                )
            )(layer0, src_int, ref_int, pos_int)
        )

        # reorder our internal-order output into checkpoint level order
        starts_int = np.cumsum([0] + [h * w for h, w in shapes_int])
        idx_of = {stride_of[s]: i for i, s in enumerate(shapes_int)}
        got_ck = np.concatenate(
            [
                got_int[starts_int[idx_of[st]]:starts_int[idx_of[st] + 1]]
                for st in ckpt_strides
            ],
            0,
        )
        np.testing.assert_allclose(got_ck, want_ck, rtol=2e-4, atol=2e-4)

    def test_decoder_layer_matches_torch_golden(self):
        """Same VALUE-level torch-mirror treatment for one query-decoder
        refinement round (deformable-DETR/MaskDINO DecoderLayer order:
        self-attn→norm2, box-scaled deformable cross-attn→norm1,
        FFN→norm3, bbox delta on inverse-sigmoid boxes).  Exercises
        `_mha_from_inproj` (in_proj q/k/v split + head reshapes), the
        off/K*wh*0.5 box-reference scaling, gen_sineembed([y,x,w,h]) +
        shared ref_point_head tiling, and the per-layer bbox MLP map."""
        import torch
        import torch.nn.functional as F

        from openpsg_tpu.models.segmenter.decoder import DecoderLayer
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = self._cfg()
        nH, K, C = 8, cfg.num_points, cfg.dim
        state = synthetic_openseed_state(cfg)

        rng = np.random.default_rng(11)
        pr = "sem_seg_head.predictor."
        base = pr + "decoder.layers.0"
        for k in list(state):
            if (
                k.startswith(base)
                or k.startswith(pr + "decoder.ref_point_head")
                or k.startswith(pr + "bbox_embed.0")
            ) and (
                k.endswith(".bias") or k.endswith("_bias")
                or ".norm" in k and k.endswith(".weight")
            ):
                state[k] = rng.normal(
                    scale=0.5, size=state[k].shape
                ).astype(np.float32)
        state[base + ".cross_attn.sampling_offsets.weight"] *= 0.05
        state[base + ".cross_attn.sampling_offsets.bias"] *= 0.2
        # keep the box delta small so refined boxes stay interior (the
        # inverse-sigmoid clip at 1e-5 never engages on either side)
        state[pr + "bbox_embed.0.layers.2.weight"] *= 0.1

        params, _ = convert_openseed(state, cfg)
        layer0 = jax.tree_util.tree_map(
            lambda a: a[0], params["decoder"]["layers"]
        )

        shapes_int = [(12, 16), (6, 8), (3, 4), (2, 2)]
        stride_of = {(12, 16): 8, (6, 8): 16, (3, 4): 32, (2, 2): 64}
        ckpt_strides = (32, 16, 8, 64)
        shapes_ckpt = [
            next(s for s in shapes_int if stride_of[s] == st)
            for st in ckpt_strides
        ]
        L = len(shapes_int)
        mem_blocks = {
            stride_of[s]: rng.normal(size=(s[0] * s[1], C)).astype(np.float32)
            for s in shapes_int
        }
        mem_int = np.concatenate([mem_blocks[stride_of[s]] for s in shapes_int], 0)
        mem_ck = np.concatenate([mem_blocks[stride_of[s]] for s in shapes_ckpt], 0)

        Q = 10
        queries = rng.normal(size=(Q, C)).astype(np.float32)
        boxes = np.concatenate(
            [
                rng.uniform(0.3, 0.7, size=(Q, 2)),
                rng.uniform(0.1, 0.3, size=(Q, 2)),
            ],
            -1,
        ).astype(np.float32)

        # ---- torch mirror ----
        tq = torch.tensor(queries)
        tb = torch.tensor(boxes)
        tt = lambda k: torch.tensor(state[pr + k])
        lin = lambda x, k: x @ tt(k + ".weight").T + tt(k + ".bias")
        ln = lambda x, k: F.layer_norm(
            x, (C,), tt(k + ".weight"), tt(k + ".bias"), eps=1e-5
        )

        def sine1d(v, half):  # DAB gen_sineembed: interleaved sin/cos
            dim_t = 10000.0 ** (
                2.0 * (torch.arange(half, dtype=torch.float64) // 2) / half
            )
            ang = (v.double() * 2.0 * np.pi) / dim_t
            out = torch.empty(v.shape[0], half, dtype=torch.float64)
            out[:, 0::2] = torch.sin(ang[:, 0::2])
            out[:, 1::2] = torch.cos(ang[:, 1::2])
            return out

        half = C // 2
        sine = torch.cat(
            [sine1d(tb[:, i:i + 1], half) for i in (1, 0, 2, 3)], -1
        ).float()                                          # [Q, 2C] (y,x,w,h)
        qpos = lin(
            torch.relu(lin(sine, "decoder.ref_point_head.layers.0")),
            "decoder.ref_point_head.layers.1",
        )

        # self-attention (torch nn.MultiheadAttention semantics)
        inw, inb = tt("decoder.layers.0.self_attn.in_proj_weight"), tt(
            "decoder.layers.0.self_attn.in_proj_bias"
        )
        qk = tq + qpos
        qh = (qk @ inw[:C].T + inb[:C]).reshape(Q, nH, C // nH)
        kh = (qk @ inw[C:2 * C].T + inb[C:2 * C]).reshape(Q, nH, C // nH)
        vh = (tq @ inw[2 * C:].T + inb[2 * C:]).reshape(Q, nH, C // nH)
        att = torch.softmax(
            torch.einsum("qhd,khd->hqk", qh, kh) / np.sqrt(C // nH), -1
        )
        sa = torch.einsum("hqk,khd->qhd", att, vh).reshape(Q, C)
        sa = lin(sa, "decoder.layers.0.self_attn.out_proj")
        tq1 = ln(tq + sa, "decoder.layers.0.norm2")

        # deformable cross-attention with box references
        q2 = tq1 + qpos
        v = lin(torch.tensor(mem_ck), "decoder.layers.0.cross_attn.value_proj")
        off = lin(q2, "decoder.layers.0.cross_attn.sampling_offsets").reshape(
            Q, nH, L, K, 2
        )
        aw = lin(q2, "decoder.layers.0.cross_attn.attention_weights").reshape(
            Q, nH, L * K
        )
        aw = torch.softmax(aw, -1).reshape(Q, nH, L, K)
        loc = (
            tb[:, None, None, None, :2]
            + off / K * tb[:, None, None, None, 2:] * 0.5
        )
        starts = np.cumsum([0] + [h * w for h, w in shapes_ckpt])
        hd = C // nH
        ca = torch.zeros(Q, nH, hd)
        for lvl, (h, w) in enumerate(shapes_ckpt):
            vl = (
                v[starts[lvl]:starts[lvl + 1]]
                .reshape(h, w, nH, hd)
                .permute(2, 3, 0, 1)
            )
            g = (loc[:, :, lvl] * 2.0 - 1.0).permute(1, 0, 2, 3)
            sm = F.grid_sample(
                vl, g, mode="bilinear", padding_mode="zeros",
                align_corners=False,
            )
            wl = aw[:, :, lvl].permute(1, 0, 2)[:, None]
            ca += (sm * wl).sum(-1).permute(2, 0, 1)
        ca = lin(ca.reshape(Q, C), "decoder.layers.0.cross_attn.output_proj")
        tq2 = ln(tq1 + ca, "decoder.layers.0.norm1")

        ff = lin(torch.relu(lin(tq2, "decoder.layers.0.linear1")),
                 "decoder.layers.0.linear2")
        tq3 = ln(tq2 + ff, "decoder.layers.0.norm3")

        delta = lin(
            torch.relu(
                lin(torch.relu(lin(tq3, "bbox_embed.0.layers.0")),
                    "bbox_embed.0.layers.1")
            ),
            "bbox_embed.0.layers.2",
        )
        want_boxes = torch.sigmoid(
            torch.log(tb / (1.0 - tb)) + delta
        ).numpy()
        want_q = tq3.numpy()

        # ---- ours ----
        layer = DecoderLayer(
            C, nH, L, K, cfg.ffn_hidden, spatial_shapes=tuple(shapes_int)
        )
        (got_q, got_boxes, _), _ = jax.jit(
            lambda p, q, b, m: layer.apply({"params": p}, (q, b, m), None)
        )(layer0, queries, boxes, mem_int)

        np.testing.assert_allclose(np.asarray(got_q), want_q, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(got_boxes), want_boxes, rtol=3e-4, atol=3e-4
        )

    def test_lang_tower_structure(self):
        from openpsg_tpu.models.commons.text_encoder import (
            BertStyleConfig,
            BertStyleEncoder,
        )
        from openpsg_tpu.models.llm.weight_convert import verify_structure
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed_lang

        cfg = self._cfg()
        state = synthetic_openseed_state(cfg)
        lang = convert_openseed_lang(state)
        tcfg = BertStyleConfig(
            hidden_size=32, num_layers=2, num_heads=8, intermediate=128,
            vocab_size=64, max_len=77, pre_ln=True, quick_gelu=True,
        )
        enc = BertStyleEncoder(tcfg)
        ids = jnp.zeros((1, 5), jnp.int32)
        init = jax.eval_shape(
            lambda k: enc.init(k, token_ids=ids), jax.random.PRNGKey(0)
        )
        tower = dict(lang["tower"])
        tower["pooler"] = jax.tree_util.tree_map(
            np.asarray, jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, np.float32), init["params"]["pooler"]
            )
        )
        verify_structure({"params": tower}, init)
        out = enc.apply({"params": tower}, token_ids=ids)
        assert np.isfinite(np.asarray(out)).all()


class TestClipConvert:
    def test_pre_ln_structure(self):
        from openpsg_tpu.models.commons.text_encoder import (
            BertStyleConfig,
            BertStyleEncoder,
        )
        from openpsg_tpu.models.commons.weight_convert import convert_clip_text
        from openpsg_tpu.models.llm.weight_convert import verify_structure

        cfg = BertStyleConfig.tiny_test(pre_ln=True, quick_gelu=True)
        enc = BertStyleEncoder(cfg)
        ids = jnp.zeros((1, 5), jnp.int32)
        init = jax.jit(lambda k: enc.init(k, token_ids=ids))(jax.random.PRNGKey(0))
        conv = {"params": convert_clip_text(synthetic_clip_state(cfg), cfg)}
        # CLIP has no pooler; drop ours from the comparison target
        init_wo = {"params": {k: v for k, v in init["params"].items() if k != "pooler"}}
        conv["params"]["pooler"] = init["params"]["pooler"]  # keep random pooler
        verify_structure(conv, init)
        out = enc.apply(conv, token_ids=ids)
        assert np.isfinite(np.asarray(out)).all()


class TestQFormerConvert:
    def test_golden_outputs_match_hf(self):
        """Converted HF InstructBlipQFormerModel weights reproduce HF's
        query outputs through our batched RelationQFormer (validates the
        'weights can slot in' claim in qformer.py:8-13)."""
        import torch
        from transformers import InstructBlipQFormerConfig
        from transformers.models.instructblip.modeling_instructblip import (
            InstructBlipQFormerModel,
        )

        from openpsg_tpu.models.relation.qformer import (
            QFormerConfig,
            RelationQFormer,
        )
        from openpsg_tpu.models.relation.weight_convert import convert_qformer

        torch.manual_seed(0)
        hf = InstructBlipQFormerModel(InstructBlipQFormerConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            encoder_hidden_size=16, cross_attention_frequency=1,
            max_position_embeddings=32,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        )).eval()
        cfg = QFormerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate=64,
            encoder_hidden_size=16, num_relation_queries=3, vocab_size=64,
            max_text_len=8,
        )
        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = convert_qformer(state, cfg)

        rng = np.random.default_rng(0)
        B, Qn, T, P = 3, 4, 6, 5
        q = rng.normal(size=(B, Qn, 32)).astype(np.float32)
        ids = rng.integers(1, 64, (B, T)).astype(np.int64)
        tmask = np.ones((B, T), bool)
        tmask[:, 4:] = False
        enc = rng.normal(size=(P, 16)).astype(np.float32)
        emask = np.ones((B, P), bool)
        emask[0, 2:] = False   # per-pair OR-mask restriction

        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.cat(
                    [torch.ones(B, Qn), torch.tensor(tmask, dtype=torch.float32)],
                    dim=1,
                ),
                query_embeds=torch.tensor(q),
                encoder_hidden_states=torch.tensor(
                    np.tile(enc[None], (B, 1, 1))
                ),
                encoder_attention_mask=torch.tensor(emask, dtype=torch.float32),
            ).last_hidden_state[:, :Qn].numpy()

        mod = RelationQFormer(cfg)
        got = mod.apply(
            {"params": params},
            jnp.asarray(q), jnp.asarray(ids, jnp.int32), jnp.asarray(tmask),
            jnp.asarray(enc), jnp.asarray(emask),
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5)


class TestSwinHFGolden:
    def test_outputs_match_hf_swinmodel(self):
        """Value-level backbone parity: a randomly-initialized HF SwinModel's
        final hidden states match our SwinTransformer through
        hf_swin_state_to_ms + convert_swin (upgrades the backbone story
        from structural to numerical)."""
        import torch
        from transformers import SwinConfig, SwinModel

        from openpsg_tpu.models.llm.weight_convert import verify_structure
        from openpsg_tpu.models.segmenter.swin import SwinTransformer
        from openpsg_tpu.models.segmenter.weight_convert import (
            convert_swin,
            hf_swin_state_to_ms,
        )

        torch.manual_seed(0)
        # geometry chosen so every stage resolution is >= window and
        # window-divisible: there HF's shrink-window-at-small-inputs
        # behavior coincides with the detection-Swin fixed-window semantics
        # our implementation (and OpenSeeD) uses
        hf = SwinModel(SwinConfig(
            image_size=64, patch_size=4, embed_dim=16, depths=[2, 2],
            num_heads=[2, 4], window_size=4, num_channels=3,
            drop_path_rate=0.0, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, mlp_ratio=4.0,
        )).eval()

        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        ms = hf_swin_state_to_ms(state)
        params = convert_swin(ms, depths=(2, 2))

        ours = SwinTransformer(
            embed_dim=16, depths=(2, 2), num_heads=(2, 4), window=4,
            out_indices=(1,),   # HF exposes only the final (normed) stage
        )
        img = np.random.default_rng(0).normal(size=(64, 64, 3)).astype(np.float32)
        init = jax.eval_shape(lambda k: ours.init(k, jnp.asarray(img)),
                              jax.random.PRNGKey(0))
        verify_structure({"params": params}, init)

        with torch.no_grad():
            ref = hf(
                pixel_values=torch.tensor(img.transpose(2, 0, 1)[None])
            ).last_hidden_state.numpy()[0]          # [16, 32] (4x4 tokens)

        (out,) = ours.apply({"params": params}, jnp.asarray(img))
        got = np.asarray(out).reshape(-1, out.shape[-1])
        np.testing.assert_allclose(got, ref, atol=3e-5)


class TestLlamaHFGolden:
    def test_logits_match_hf_llama(self):
        """Value-level LLM parity: a randomly-initialized HF
        LlamaForCausalLM's full logits match our scanned Llama through
        convert_llama.  This is the test that pins the RoPE convention
        (HF rotate-half vs interleaved — a silent-quality killer with
        real Llama-2 weights, reference head_v4 loads meta-llama via HF,
        relation_transformer_head_v4.py:99-105), the GQA head mapping
        (num_key_value_heads < num_heads), RMSNorm eps placement, and
        every projection transpose."""
        import torch
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        torch.manual_seed(0)
        hf = LlamaForCausalLM(HFLlamaConfig(
            vocab_size=97, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0,
            attention_bias=False, attention_dropout=0.0,
            tie_word_embeddings=False,
        )).eval()
        state = {k: v.numpy() for k, v in hf.state_dict().items()}

        cfg = LlamaConfig(
            vocab_size=97, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_hidden=64, max_seq_len=64, dtype=jnp.float32,
        )
        params = convert_llama(state, cfg, dtype=jnp.float32)
        model = LlamaWithEmbeddings(cfg)

        B, L = 2, 11
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 97, size=(B, L)).astype(np.int32)
        with torch.no_grad():
            want = hf(input_ids=torch.tensor(ids, dtype=torch.long)).logits.numpy()

        got, _ = jax.jit(
            lambda p, i: model.apply(
                p, token_ids=i,
                attention_mask=jnp.ones((B, L), bool),
                positions=jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L)),
            )
        )(params, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestBertHFGolden:
    def test_outputs_match_hf_bertmodel(self):
        """Value-level text-tower parity vs HF BertModel (the v1/v2 heads
        wrap bert-base-uncased, bert_wrapper.py).  Covers the token-type
        segment-0 fold (HF adds token_type_embeddings[0] to every
        single-segment position — dropped would be silently wrong with
        trained weights), post-LN placement, exact-erf GELU, LN eps 1e-12,
        and the pooler.  HF computes outputs for padded QUERY positions
        (its mask only hides keys) while ours masks both — compare valid
        positions only."""
        import torch
        from transformers import BertConfig as HFBertConfig
        from transformers import BertModel

        from openpsg_tpu.models.commons.text_encoder import (
            BertStyleConfig,
            BertStyleEncoder,
        )
        from openpsg_tpu.models.commons.weight_convert import convert_bert

        torch.manual_seed(0)
        hf = BertModel(HFBertConfig(
            vocab_size=97, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=48, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            hidden_act="gelu", layer_norm_eps=1e-12,
        )).eval()
        state = {k: v.numpy() for k, v in hf.state_dict().items()}

        cfg = BertStyleConfig(
            hidden_size=32, num_layers=2, num_heads=4, intermediate=64,
            vocab_size=97, max_len=48,
        )
        params = convert_bert(state, cfg)
        enc = BertStyleEncoder(cfg)

        B, L, valid = 2, 9, 6
        rng = np.random.default_rng(5)
        ids = rng.integers(0, 97, size=(B, L)).astype(np.int32)
        mask = np.zeros((B, L), bool)
        mask[:, :valid] = True
        with torch.no_grad():
            out = hf(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            )
        want_h = out.last_hidden_state.numpy()
        want_pool = out.pooler_output.numpy()

        got_h = np.asarray(enc.apply(
            {"params": params}, token_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
        ))
        got_pool = np.asarray(enc.apply(
            {"params": params}, token_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask), pool=True,
        ))
        np.testing.assert_allclose(
            got_h[:, :valid], want_h[:, :valid], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(got_pool, want_pool, rtol=1e-4, atol=1e-5)


def synthetic_mmdet_m2f_state(dim=32, enc=2, dec=3, Q=10, ffn=64,
                              num_classes=8, base_ch=8, seed=0,
                              backbone="r50"):
    """Synthetic checkpoint with the canonical mmdet Mask2Former key schema
    (tiny_r50 or tiny mmdet-Swin backbone geometry; see the
    convert_mask2former docstring)."""
    rng = np.random.default_rng(seed)
    nH, L, K = 8, 3, 4
    lin = lambda o, i: rng.normal(scale=0.1, size=(o, i)).astype(np.float32)
    vec = lambda n: rng.normal(scale=0.5, size=(n,)).astype(np.float32)
    s = {}

    def bn(base, c):
        s[base + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        s[base + ".bias"] = vec(c)
        s[base + ".running_mean"] = vec(c)
        s[base + ".running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)
        s[base + ".num_batches_tracked"] = np.asarray(100, np.int64)

    if backbone == "r50":
        # tiny r50, depths (1,1,1,1)
        s["backbone.conv1.weight"] = rng.normal(
            scale=0.1, size=(base_ch, 3, 7, 7)).astype(np.float32)
        bn("backbone.bn1", base_ch)
        ch, inp = base_ch, base_ch
        for st in range(4):
            p = f"backbone.layer{st + 1}.0."
            s[p + "conv1.weight"] = rng.normal(scale=0.1, size=(ch, inp, 1, 1)).astype(np.float32)
            bn(p + "bn1", ch)
            s[p + "conv2.weight"] = rng.normal(scale=0.1, size=(ch, ch, 3, 3)).astype(np.float32)
            bn(p + "bn2", ch)
            s[p + "conv3.weight"] = rng.normal(scale=0.1, size=(4 * ch, ch, 1, 1)).astype(np.float32)
            bn(p + "bn3", 4 * ch)
            s[p + "downsample.0.weight"] = rng.normal(scale=0.1, size=(4 * ch, inp, 1, 1)).astype(np.float32)
            bn(p + "downsample.1", 4 * ch)
            inp = 4 * ch
            ch *= 2
        in_chs = {32: base_ch * 32, 16: base_ch * 16, 8: base_ch * 8}
        c2_ch = base_ch * 4
    else:
        # tiny mmdet SwinTransformer: embed 16, depths (1,1,1,1),
        # heads (1,2,2,2), window 4 (the "tiny" preset geometry)
        E, heads, w = 16, (1, 2, 2, 2), 4
        s["backbone.patch_embed.projection.weight"] = rng.normal(
            scale=0.1, size=(E, 3, 4, 4)).astype(np.float32)
        s["backbone.patch_embed.projection.bias"] = vec(E)
        s["backbone.patch_embed.norm.weight"] = rng.uniform(0.5, 1.5, E).astype(np.float32)
        s["backbone.patch_embed.norm.bias"] = vec(E)
        C = E
        for st in range(4):
            p = f"backbone.stages.{st}.blocks.0."
            for n in ("norm1", "norm2"):
                s[p + n + ".weight"] = rng.uniform(0.5, 1.5, C).astype(np.float32)
                s[p + n + ".bias"] = vec(C)
            s[p + "attn.w_msa.relative_position_bias_table"] = rng.normal(
                size=((2 * w - 1) ** 2, heads[st])).astype(np.float32)
            s[p + "attn.w_msa.relative_position_index"] = np.zeros(
                (w * w, w * w), np.int64)
            s[p + "attn.w_msa.qkv.weight"] = lin(3 * C, C)
            s[p + "attn.w_msa.qkv.bias"] = vec(3 * C)
            s[p + "attn.w_msa.proj.weight"] = lin(C, C)
            s[p + "attn.w_msa.proj.bias"] = vec(C)
            s[p + "ffn.layers.0.0.weight"] = lin(4 * C, C)
            s[p + "ffn.layers.0.0.bias"] = vec(4 * C)
            s[p + "ffn.layers.1.weight"] = lin(C, 4 * C)
            s[p + "ffn.layers.1.bias"] = vec(C)
            s[f"backbone.norm{st}.weight"] = rng.uniform(0.5, 1.5, C).astype(np.float32)
            s[f"backbone.norm{st}.bias"] = vec(C)
            if st < 3:
                d = f"backbone.stages.{st}.downsample."
                s[d + "norm.weight"] = rng.uniform(0.5, 1.5, 4 * C).astype(np.float32)
                s[d + "norm.bias"] = vec(4 * C)
                s[d + "reduction.weight"] = lin(2 * C, 4 * C)
            C *= 2
        in_chs = {32: E * 8, 16: E * 4, 8: E * 2}
        c2_ch = E

    # pixel decoder: input convs coarse-first (strides 32, 16, 8)
    pd = "panoptic_head.pixel_decoder."
    for j, stride in enumerate((32, 16, 8)):
        s[pd + f"input_convs.{j}.conv.weight"] = rng.normal(
            scale=0.1, size=(dim, in_chs[stride], 1, 1)).astype(np.float32)
        s[pd + f"input_convs.{j}.conv.bias"] = vec(dim)
        s[pd + f"input_convs.{j}.gn.weight"] = rng.uniform(0.5, 1.5, dim).astype(np.float32)
        s[pd + f"input_convs.{j}.gn.bias"] = vec(dim)
    for l in range(enc):
        b = pd + f"encoder.layers.{l}."
        s[b + "attentions.0.sampling_offsets.weight"] = lin(nH * L * K * 2, dim) * 0.5
        s[b + "attentions.0.sampling_offsets.bias"] = vec(nH * L * K * 2) * 0.2
        s[b + "attentions.0.attention_weights.weight"] = lin(nH * L * K, dim)
        s[b + "attentions.0.attention_weights.bias"] = vec(nH * L * K)
        s[b + "attentions.0.value_proj.weight"] = lin(dim, dim)
        s[b + "attentions.0.value_proj.bias"] = vec(dim)
        s[b + "attentions.0.output_proj.weight"] = lin(dim, dim)
        s[b + "attentions.0.output_proj.bias"] = vec(dim)
        s[b + "ffns.0.layers.0.0.weight"] = lin(ffn, dim)
        s[b + "ffns.0.layers.0.0.bias"] = vec(ffn)
        s[b + "ffns.0.layers.1.weight"] = lin(dim, ffn)
        s[b + "ffns.0.layers.1.bias"] = vec(dim)
        for n in (0, 1):
            s[b + f"norms.{n}.weight"] = rng.uniform(0.5, 1.5, dim).astype(np.float32)
            s[b + f"norms.{n}.bias"] = vec(dim)
    s[pd + "level_encoding.weight"] = rng.normal(size=(3, dim)).astype(np.float32)
    c2 = c2_ch
    s[pd + "lateral_convs.0.conv.weight"] = rng.normal(
        scale=0.1, size=(dim, c2, 1, 1)).astype(np.float32)
    s[pd + "lateral_convs.0.gn.weight"] = rng.uniform(0.5, 1.5, dim).astype(np.float32)
    s[pd + "lateral_convs.0.gn.bias"] = vec(dim)
    s[pd + "output_convs.0.conv.weight"] = rng.normal(
        scale=0.1, size=(dim, dim, 3, 3)).astype(np.float32)
    s[pd + "output_convs.0.gn.weight"] = rng.uniform(0.5, 1.5, dim).astype(np.float32)
    s[pd + "output_convs.0.gn.bias"] = vec(dim)
    s[pd + "mask_feature.weight"] = rng.normal(
        scale=0.1, size=(dim, dim, 1, 1)).astype(np.float32)
    s[pd + "mask_feature.bias"] = vec(dim)

    # query decoder
    ph = "panoptic_head."
    for l in range(dec):
        b = ph + f"transformer_decoder.layers.{l}."
        for a in (0, 1):
            s[b + f"attentions.{a}.attn.in_proj_weight"] = lin(3 * dim, dim)
            s[b + f"attentions.{a}.attn.in_proj_bias"] = vec(3 * dim)
            s[b + f"attentions.{a}.attn.out_proj.weight"] = lin(dim, dim)
            s[b + f"attentions.{a}.attn.out_proj.bias"] = vec(dim)
        s[b + "ffns.0.layers.0.0.weight"] = lin(ffn, dim)
        s[b + "ffns.0.layers.0.0.bias"] = vec(ffn)
        s[b + "ffns.0.layers.1.weight"] = lin(dim, ffn)
        s[b + "ffns.0.layers.1.bias"] = vec(dim)
        for n in (0, 1, 2):
            s[b + f"norms.{n}.weight"] = rng.uniform(0.5, 1.5, dim).astype(np.float32)
            s[b + f"norms.{n}.bias"] = vec(dim)
    s[ph + "transformer_decoder.post_norm.weight"] = rng.uniform(0.5, 1.5, dim).astype(np.float32)
    s[ph + "transformer_decoder.post_norm.bias"] = vec(dim)
    s[ph + "query_embed.weight"] = rng.normal(size=(Q, dim)).astype(np.float32)
    s[ph + "query_feat.weight"] = rng.normal(size=(Q, dim)).astype(np.float32)
    s[ph + "level_embed.weight"] = rng.normal(size=(3, dim)).astype(np.float32)
    s[ph + "cls_embed.weight"] = lin(num_classes + 1, dim)
    s[ph + "cls_embed.bias"] = vec(num_classes + 1)
    for i in (0, 2, 4):
        s[ph + f"mask_embed.{i}.weight"] = lin(dim, dim)
        s[ph + f"mask_embed.{i}.bias"] = vec(dim)
    return s


class TestMask2FormerConvert:
    def _cfg(self):
        from openpsg_tpu.models.segmenter.mask2former import Mask2FormerConfig

        return Mask2FormerConfig(
            backbone="tiny_r50", dim=32, mask_dim=32, num_queries=10,
            enc_layers=2, dec_layers=3, ffn_hidden=64, num_classes=8,
        )

    def test_structure_matches_init(self):
        from openpsg_tpu.models.segmenter.mask2former import Mask2FormerSegmenter
        from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former
        from openpsg_tpu.models.llm.weight_convert import verify_structure

        cfg = self._cfg()
        params = convert_mask2former(synthetic_mmdet_m2f_state(), cfg)
        model = Mask2FormerSegmenter(cfg)
        img = jnp.zeros((64, 64, 3), jnp.float32)
        init = jax.eval_shape(lambda k: model.init(k, img), jax.random.PRNGKey(0))
        verify_structure({"params": params}, init)

    def test_converted_trunk_runs(self):
        from openpsg_tpu.models.segmenter.mask2former import Mask2FormerSegmenter
        from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former

        cfg = self._cfg()
        params = convert_mask2former(synthetic_mmdet_m2f_state(), cfg)
        model = Mask2FormerSegmenter(cfg)
        img = jnp.asarray(
            np.random.default_rng(0).normal(size=(64, 64, 3)), jnp.float32
        )
        out = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, img)
        assert out["cls_logits"].shape == (10, 9)
        assert out["masks"].shape == (10, 16, 16)
        for v in jax.tree_util.tree_leaves(out):
            assert np.isfinite(np.asarray(v)).all()

    def test_swin_backbone_structure_matches_init(self):
        """The mmdet-Swin branch end to end: rename map + patch-merge
        permutation + out-norm mapping through mmdet_swin_state_to_ms →
        convert_swin, landing on the exact param tree of the tiny Swin
        preset (only the merge permutation itself has a value golden;
        this pins the full key surface)."""
        import dataclasses as dc

        from openpsg_tpu.models.segmenter.mask2former import (
            Mask2FormerConfig,
            Mask2FormerSegmenter,
        )
        from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former
        from openpsg_tpu.models.llm.weight_convert import verify_structure

        cfg = dc.replace(self._cfg(), backbone="tiny")
        params = convert_mask2former(
            synthetic_mmdet_m2f_state(backbone="swin"), cfg
        )
        model = Mask2FormerSegmenter(cfg)
        img = jnp.zeros((64, 64, 3), jnp.float32)
        init = jax.eval_shape(lambda k: model.init(k, img), jax.random.PRNGKey(0))
        verify_structure({"params": params}, init)

    def test_swin_backbone_structure_matches_init(self):
        """The mmdet-Swin branch end to end: rename map + patch-merge
        permutation + out-norm mapping through mmdet_swin_state_to_ms →
        convert_swin, landing on the exact param tree of the tiny Swin
        preset (only the merge permutation itself has a value golden;
        this pins the full key surface)."""
        import dataclasses as dc

        from openpsg_tpu.models.segmenter.mask2former import (
            Mask2FormerConfig,
            Mask2FormerSegmenter,
        )
        from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former
        from openpsg_tpu.models.llm.weight_convert import verify_structure

        cfg = dc.replace(self._cfg(), backbone="tiny")
        params = convert_mask2former(
            synthetic_mmdet_m2f_state(backbone="swin"), cfg
        )
        model = Mask2FormerSegmenter(cfg)
        img = jnp.zeros((64, 64, 3), jnp.float32)
        init = jax.eval_shape(lambda k: model.init(k, img), jax.random.PRNGKey(0))
        verify_structure({"params": params}, init)

    def test_strict_unmapped_key_raises(self):
        from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former

        state = synthetic_mmdet_m2f_state()
        state["panoptic_head.mystery.weight"] = np.zeros(3, np.float32)
        with pytest.raises(ValueError, match="unmapped"):
            convert_mask2former(state, self._cfg())

    def test_masked_decoder_layer_matches_torch_golden(self):
        """The converted masked-attention decoder layer must match an
        independent torch mirror of mmdet's DetrTransformerDecoderLayer
        semantics token-for-token: gate = post_norm -> mask_embed MLP ->
        logit>0 (sigmoid>=0.5) with all-empty fallback, cross-attn
        q=query+query_pos / k=key+key_pos / v=key, self-attn
        q=k=x+query_pos / v=x, post-norm residuals ('cross_attn','norm',
        'self_attn','norm','ffn','norm')."""
        import torch
        import torch.nn.functional as F

        from openpsg_tpu.models.segmenter.mask2former_decoder import (
            _MaskedDecoderLayer,
        )
        from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former

        state = synthetic_mmdet_m2f_state()
        params = convert_mask2former(state, self._cfg())
        layer0 = jax.tree_util.tree_map(
            lambda a: a[0], params["decoder"]["layers"]
        )

        C, nH, Q, P = 32, 8, 10, 24
        rng = np.random.default_rng(11)
        queries = rng.normal(size=(Q, C)).astype(np.float32)
        keys = rng.normal(size=(P, C)).astype(np.float32)
        key_pos = rng.normal(size=(P, C)).astype(np.float32)
        mf_lvl = rng.normal(size=(P, C)).astype(np.float32)
        key_valid = np.ones(P, bool)

        # ---- torch mirror ----
        b = "panoptic_head.transformer_decoder.layers.0."
        t = lambda k: torch.tensor(state[k])
        ln = lambda x, k: F.layer_norm(x, (C,), t(k + ".weight"), t(k + ".bias"))
        tq = torch.tensor(queries)
        qpos = torch.tensor(state["panoptic_head.query_embed.weight"])
        tk, tkp, tmf = map(torch.tensor, (keys, key_pos, mf_lvl))

        # gate from post_norm -> shared mask_embed MLP
        gz = ln(tq, "panoptic_head.transformer_decoder.post_norm")
        for i in (0, 2, 4):
            gz = gz @ t(f"panoptic_head.mask_embed.{i}.weight").T + t(
                f"panoptic_head.mask_embed.{i}.bias"
            )
            if i != 4:
                gz = torch.relu(gz)
        allowed = (gz @ tmf.T) > 0.0
        empty = ~allowed.any(dim=1)
        allowed[empty] = True

        def mha(idx, q, k, v, mask=None):
            iw, ib = t(b + f"attentions.{idx}.attn.in_proj_weight"), t(
                b + f"attentions.{idx}.attn.in_proj_bias"
            )
            ow, ob = t(b + f"attentions.{idx}.attn.out_proj.weight"), t(
                b + f"attentions.{idx}.attn.out_proj.bias"
            )
            out, _ = F.multi_head_attention_forward(
                q[:, None, :],                     # [L, B=1, C]
                k[:, None, :], v[:, None, :],
                C, nH, iw, ib, None, None, False, 0.0, ow, ob,
                training=False, need_weights=False,
                attn_mask=(~mask if mask is not None else None),
            )
            return out[:, 0]

        ca = mha(0, tq + qpos, tk + tkp, tk, allowed)
        x = ln(tq + ca, b + "norms.0")
        sa = mha(1, x + qpos, x + qpos, x)
        x = ln(x + sa, b + "norms.1")
        f1 = torch.relu(x @ t(b + "ffns.0.layers.0.0.weight").T
                        + t(b + "ffns.0.layers.0.0.bias"))
        f2 = f1 @ t(b + "ffns.0.layers.1.weight").T + t(b + "ffns.0.layers.1.bias")
        want = ln(x + f2, b + "norms.2").numpy()

        # ---- ours ----
        layer = _MaskedDecoderLayer(C, nH, 64, C)
        (got, _) = jax.jit(
            lambda p, q, li: layer.apply({"params": p}, q, li)
        )(layer0, jnp.asarray(queries),
          (jnp.asarray(keys), jnp.asarray(key_valid),
           jnp.asarray(key_pos), jnp.asarray(mf_lvl)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)

    def test_detector_loads_raw_mmdet_pth(self, tmp_path):
        """End-to-end loading surface: a raw mmdet .pth (with the
        {'state_dict': ...} wrapper the published checkpoints use)
        converts on the fly into a live PSGMask2FormerRelation — the
        reference's `load_from` flow (baseline_r50.py:3)."""
        import dataclasses

        import torch

        from openpsg_tpu.models.detectors.mask2former_relation import (
            M2FRelationConfig,
            PSGMask2FormerRelation,
        )

        state = synthetic_mmdet_m2f_state(num_classes=8)
        p = tmp_path / "m2f.pth"
        torch.save(
            {"state_dict": {k: torch.tensor(v) for k, v in state.items()
                            if v.dtype != np.int64},
             "meta": {"note": "synthetic"}},
            p,
        )

        cfg = dataclasses.replace(
            M2FRelationConfig.tiny_test(), segmenter=self._cfg()
        )
        model = PSGMask2FormerRelation(
            cfg, jax.random.PRNGKey(0),
            class_names=[f"c{i}" for i in range(8)],
            relation_names=[f"r{i}" for i in range(6)],
            num_things=4,
        )
        before = np.asarray(jax.tree_util.tree_leaves(
            model.params["segmenter"])[0]).copy()
        model.load_segmenter_weights(str(p))
        after_tree = model.params["segmenter"]["params"]
        got = np.asarray(after_tree["decoder"]["query_embed"])
        np.testing.assert_allclose(
            got, state["panoptic_head.query_feat.weight"], atol=1e-6
        )
        assert not np.allclose(
            before, np.asarray(jax.tree_util.tree_leaves(
                model.params["segmenter"])[0])
        ) or before.shape != got.shape

    def test_full_pixel_decoder_matches_torch_golden(self):
        """GLUE-level value parity: the entire converted PixelDecoder —
        input 1x1 projections + GroupNorm(32), level-embed add, cumsum
        sine positions, the deformable encoder stack, and the FPN fusion
        to stride-4 mask_features — against an independent torch mirror
        of mmdet's MSDeformAttnPixelDecoder operating in CHECKPOINT
        (coarse-first) level order.  The layer-level goldens can't see
        miswired glue (a dropped level embed, GN axis mix-up, FPN conv
        transpose); this can."""
        from openpsg_tpu.models.segmenter.pixel_decoder import PixelDecoder
        from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former

        state = synthetic_mmdet_m2f_state(enc=2)
        params = convert_mask2former(state, self._cfg())
        pdp = params["pixel_decoder"]

        C = 32
        rng = np.random.default_rng(21)
        # feature maps for a 64x64 image: strides 4/8/16/32
        chs = (32, 64, 128, 256)
        hw = ((16, 16), (8, 8), (4, 4), (2, 2))
        feats = [rng.normal(size=(h, w, c)).astype(np.float32) * 0.5
                 for (h, w), c in zip(hw, chs)]

        want_mem, want_mf = torch_m2f_pixel_decoder_mirror(
            state, feats, enc_layers=2, C=C
        )

        pdm = PixelDecoder(dim=C, num_layers=2, ffn_hidden=64, mask_dim=C)
        mem, shapes, got_mf = jax.jit(
            lambda p, f: pdm.apply({"params": p}, f)
        )(pdp, tuple(jnp.asarray(f) for f in feats))
        assert tuple(shapes) == ((8, 8), (4, 4), (2, 2))
        np.testing.assert_allclose(np.asarray(mem), want_mem, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(got_mf), want_mf, rtol=3e-4, atol=3e-4)


def torch_m2f_pixel_decoder_mirror(state, feats, enc_layers, C=32, nH=8, K=4):
    """Independent torch mirror of mmdet's MSDeformAttnPixelDecoder in
    CHECKPOINT (coarse-first) level order, as a reusable golden fixture
    (also composed into the assembled full-trunk golden,
    tests/test_full_trunk_golden.py).

    ``feats``: 4 HWC numpy maps at strides 4/8/16/32 (fine-first).
    Returns ``(memory fine-first [Lv, C], mask_features [H4, W4, C])``.
    """
    import torch
    import torch.nn.functional as F

    pd = "panoptic_head.pixel_decoder."
    t = lambda k: torch.tensor(state[pd + k])
    shapes_ck = [tuple(feats[3].shape[:2]), tuple(feats[2].shape[:2]),
                 tuple(feats[1].shape[:2])]        # strides 32, 16, 8
    feat_of = {32: feats[3], 16: feats[2], 8: feats[1]}
    strides_ck = (32, 16, 8)

    def conv(x_nchw, w, b=None, pad=0):
        return F.conv2d(x_nchw, w, b, padding=pad)

    toks, poss = [], []
    for j, s in enumerate(strides_ck):
        x = torch.tensor(feat_of[s].transpose(2, 0, 1))[None]
        x = conv(x, t(f"input_convs.{j}.conv.weight"),
                 t(f"input_convs.{j}.conv.bias"))
        x = F.group_norm(x, 32, t(f"input_convs.{j}.gn.weight"),
                         t(f"input_convs.{j}.gn.bias"), eps=1e-5)
        h, w = shapes_ck[j]
        toks.append(x[0].reshape(C, h * w).T)
        # d2/mmdet sine positions (cumsum convention), interleaved
        nm = torch.ones(1, h, w)
        ye = nm.cumsum(1) / (h + 1e-6) * (2 * np.pi)
        xe = nm.cumsum(2) / (w + 1e-6) * (2 * np.pi)
        half = C // 2
        dim_t = 10000.0 ** (
            2 * torch.div(torch.arange(half), 2, rounding_mode="floor") / half
        )
        px, py = xe[..., None] / dim_t, ye[..., None] / dim_t
        px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), -1).flatten(3)
        py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), -1).flatten(3)
        pos = torch.cat((py, px), 3)[0].reshape(h * w, C)
        poss.append(pos + t("level_encoding.weight")[j])
    src = torch.cat(toks, 0)
    pos = torch.cat(poss, 0)

    # reference points at pixel centers, per level, valid_ratios=1
    refs = []
    for (h, w) in shapes_ck:
        ys, xs = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        refs.append(np.stack([xs, ys], -1).reshape(-1, 2))
    ref = torch.tensor(np.concatenate(refs, 0).astype(np.float32))

    L = 3
    starts = np.cumsum([0] + [h * w for h, w in shapes_ck])
    normalizer = torch.tensor([(w, h) for (h, w) in shapes_ck],
                              dtype=torch.float32)

    def msda(base, q, v):
        Lq = q.shape[0]
        hd = C // nH
        val = q.new_zeros(Lq, nH, hd)
        vv = v @ t(base + ".value_proj.weight").T + t(base + ".value_proj.bias")
        off = (q @ t(base + ".sampling_offsets.weight").T
               + t(base + ".sampling_offsets.bias")).reshape(Lq, nH, L, K, 2)
        aw = (q @ t(base + ".attention_weights.weight").T
              + t(base + ".attention_weights.bias")).reshape(Lq, nH, L * K)
        aw = torch.softmax(aw, -1).reshape(Lq, nH, L, K)
        loc = ref[:, None, None, None, :] + off / normalizer[None, None, :, None, :]
        out = torch.zeros(Lq, nH, hd)
        for lvl, (h, w) in enumerate(shapes_ck):
            vl = (vv[starts[lvl]:starts[lvl + 1]]
                  .reshape(h, w, nH, hd).permute(2, 3, 0, 1))  # [nH,hd,h,w]
            g = loc[:, :, lvl] * 2.0 - 1.0                      # [Lq,nH,K,2]
            sm = F.grid_sample(vl, g.permute(1, 0, 2, 3),
                               mode="bilinear", padding_mode="zeros",
                               align_corners=False)             # [nH,hd,Lq,K]
            out += (sm * aw[:, :, lvl].permute(1, 0, 2)[:, None]).sum(-1).permute(2, 0, 1)
        return out.reshape(Lq, C) @ t(base + ".output_proj.weight").T + t(
            base + ".output_proj.bias")

    x = src
    for l in range(enc_layers):
        b = f"encoder.layers.{l}"
        a = msda(b + ".attentions.0", x + pos, x)
        x = F.layer_norm(x + a, (C,), t(b + ".norms.0.weight"),
                         t(b + ".norms.0.bias"))
        f1 = torch.relu(x @ t(b + ".ffns.0.layers.0.0.weight").T
                        + t(b + ".ffns.0.layers.0.0.bias"))
        f2 = f1 @ t(b + ".ffns.0.layers.1.weight").T + t(b + ".ffns.0.layers.1.bias")
        x = F.layer_norm(x + f2, (C,), t(b + ".norms.1.weight"),
                         t(b + ".norms.1.bias"))

    # FPN: stride-8 encoder block up to stride 4
    h8, w8 = feats[1].shape[:2]
    enc8 = x[starts[2]:starts[3]].reshape(h8, w8, C).permute(2, 0, 1)[None]
    lat = torch.tensor(feats[0].transpose(2, 0, 1))[None]
    lat = conv(lat, t("lateral_convs.0.conv.weight"))
    lat = F.group_norm(lat, 32, t("lateral_convs.0.gn.weight"),
                       t("lateral_convs.0.gn.bias"), eps=1e-5)
    up = F.interpolate(enc8, size=tuple(feats[0].shape[:2]), mode="bilinear",
                       align_corners=False)
    fused = lat + up
    fused = conv(fused, t("output_convs.0.conv.weight"), pad=1)
    fused = F.group_norm(fused, 32, t("output_convs.0.gn.weight"),
                         t("output_convs.0.gn.bias"), eps=1e-5)
    fused = torch.relu(fused)
    mf = conv(fused, t("mask_feature.weight"), t("mask_feature.bias"))
    want_mf = mf[0].permute(1, 2, 0).numpy()

    # memory in checkpoint order -> internal (fine-first) order
    blocks = [x[starts[j]:starts[j + 1]].numpy() for j in range(3)]
    want_mem = np.concatenate([blocks[2], blocks[1], blocks[0]], 0)

    return want_mem, want_mf



def torch_m2f_masked_decoder_mirror(state, memory, mask_features,
                                    n_layers, shapes_int, C=32, nH=8):
    """Independent torch mirror of mmdet's Mask2FormerHead decoder loop
    (level round-robin, per-layer gates, post-norm broadcast, cls/mask
    heads), reusable golden fixture (also composed into the assembled
    full-trunk golden, tests/test_full_trunk_golden.py).

    ``memory``: fine-first [Lv, C]; ``mask_features``: [H4, W4, C].
    Returns ``(query_embed [Q, C], cls_logits, masks)``.
    """
    import torch
    import torch.nn.functional as F

    ph = "panoptic_head."
    t = lambda k: torch.tensor(state[ph + k])
    ln = lambda x, k: F.layer_norm(x, (C,), t(k + ".weight"), t(k + ".bias"))
    tmf = torch.tensor(mask_features.transpose(2, 0, 1))[None]  # [1,C,16,16]
    qpos = t("query_embed.weight")
    x = t("query_feat.weight")

    # per-level keys/pos in OUR memory layout, checkpoint level index
    # ckpt level j: stride (32,16,8)[j] -> our block (2,1,0)[j]
    starts = np.cumsum([0] + [h * w for h, w in shapes_int])
    def level(j):
        blk = {0: 2, 1: 1, 2: 0}[j]
        h, w = shapes_int[blk]
        k = torch.tensor(memory[starts[blk]:starts[blk + 1]])
        nm = torch.ones(1, h, w)
        ye = nm.cumsum(1) / (h + 1e-6) * (2 * np.pi)
        xe = nm.cumsum(2) / (w + 1e-6) * (2 * np.pi)
        half = C // 2
        dim_t = 10000.0 ** (
            2 * torch.div(torch.arange(half), 2, rounding_mode="floor") / half
        )
        px, py = xe[..., None] / dim_t, ye[..., None] / dim_t
        px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), -1).flatten(3)
        py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), -1).flatten(3)
        pos = torch.cat((py, px), 3)[0].reshape(h * w, C)
        pos = pos + t("level_embed.weight")[j]
        return k, pos, (h, w)

    def head_gate(q, size):
        z = ln(q, "transformer_decoder.post_norm")
        for i in (0, 2, 4):
            z = z @ t(f"mask_embed.{i}.weight").T + t(f"mask_embed.{i}.bias")
            if i != 4:
                z = torch.relu(z)
        mp = torch.einsum("qc,chw->qhw", z, tmf[0])[None]
        mp = F.interpolate(mp, size=size, mode="bilinear",
                           align_corners=False)[0]
        allowed = mp.flatten(1) > 0.0
        empty = ~allowed.any(1)
        allowed[empty] = True
        return allowed

    def mha(base, q, k, v, mask=None):
        out, _ = F.multi_head_attention_forward(
            q[:, None, :], k[:, None, :], v[:, None, :],
            C, nH,
            t(base + ".attn.in_proj_weight"), t(base + ".attn.in_proj_bias"),
            None, None, False, 0.0,
            t(base + ".attn.out_proj.weight"), t(base + ".attn.out_proj.bias"),
            training=False, need_weights=False,
            attn_mask=(~mask if mask is not None else None),
        )
        return out[:, 0]

    for l in range(n_layers):
        b = f"transformer_decoder.layers.{l}"
        k, pos, size = level(l % len(shapes_int))
        allowed = head_gate(x, size)
        ca = mha(b + ".attentions.0", x + qpos, k + pos, k, allowed)
        x = ln(x + ca, b + ".norms.0")
        sa = mha(b + ".attentions.1", x + qpos, x + qpos, x)
        x = ln(x + sa, b + ".norms.1")
        f1 = torch.relu(x @ t(b + ".ffns.0.layers.0.0.weight").T
                        + t(b + ".ffns.0.layers.0.0.bias"))
        f2 = f1 @ t(b + ".ffns.0.layers.1.weight").T + t(b + ".ffns.0.layers.1.bias")
        x = ln(x + f2, b + ".norms.2")

    dec = ln(x, "transformer_decoder.post_norm")
    want_cls = (dec @ t("cls_embed.weight").T + t("cls_embed.bias")).numpy()
    z = dec
    for i in (0, 2, 4):
        z = z @ t(f"mask_embed.{i}.weight").T + t(f"mask_embed.{i}.bias")
        if i != 4:
            z = torch.relu(z)
    want_masks = torch.einsum("qc,chw->qhw", z, tmf[0]).numpy()
    want_q = dec.numpy()
    return want_q, want_cls, want_masks


class TestMask2FormerDecoderGlueGolden:
    def _cfg(self):
        from openpsg_tpu.models.segmenter.mask2former import Mask2FormerConfig

        return Mask2FormerConfig(
            backbone="tiny_r50", dim=32, mask_dim=32, num_queries=10,
            enc_layers=2, dec_layers=3, ffn_hidden=64, num_classes=8,
        )

    def test_full_masked_decoder_matches_torch_golden(self):
        """GLUE-level value parity for the whole Mask2FormerDecoder: level
        slicing + padding, coarse→fine round-robin (stride 32 first),
        per-layer gate thresholds at each level's resolution, shared
        query_pos/post-norm broadcast, and the final cls/mask heads —
        against an independent torch mirror of mmdet's
        Mask2FormerHead.forward loop."""
        import torch
        import torch.nn.functional as F

        from openpsg_tpu.models.segmenter.mask2former_decoder import (
            Mask2FormerDecoder,
        )
        from openpsg_tpu.models.segmenter.weight_convert import convert_mask2former

        state = synthetic_mmdet_m2f_state(dec=3)
        params = convert_mask2former(state, self._cfg())

        C, nH, Q = 32, 8, 10
        shapes_int = [(8, 8), (4, 4), (2, 2)]     # ours: strides 8, 16, 32
        rng = np.random.default_rng(31)
        memory = rng.normal(size=(sum(h * w for h, w in shapes_int), C)
                            ).astype(np.float32)
        mask_features = rng.normal(size=(16, 16, C)).astype(np.float32)

        want_q, want_cls, want_masks = torch_m2f_masked_decoder_mirror(
            state, memory, mask_features, n_layers=3,
            shapes_int=shapes_int, C=C, nH=nH,
        )

        # ---- ours ----
        dm = Mask2FormerDecoder(dim=C, num_queries=Q, num_layers=3,
                                ffn_hidden=64, mask_dim=C, num_classes=8)
        out = jax.jit(
            lambda p, m, mf: dm.apply({"params": p}, m, tuple(shapes_int), mf)
        )(params["decoder"], jnp.asarray(memory), jnp.asarray(mask_features))
        np.testing.assert_allclose(np.asarray(out["query_embed"]), want_q,
                                   rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(out["cls_logits"]), want_cls,
                                   rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(np.asarray(out["masks"]), want_masks,
                                   rtol=3e-4, atol=3e-4)


class TestQueryDecoderGlueGolden:
    def test_full_query_decoder_matches_torch_golden(self):
        """GLUE-level value parity for the MaskDINO two-stage query decoder
        (the flagship OpenSeeD path): proposal generation with the
        Deformable-DETR validity rule (border positions outside
        (0.01, 0.99) get ZEROED memory + inf proposal logits yet still
        compete in topk), level-order-dependent anchor exponents
        (wh = 0.05·2^ckpt_lvl), language-space classification
        (normalize → class_embeds^T → ×exp(logit_scale)), top-k query
        selection, one refinement round, and the final decoder_norm /
        class / mask heads — against an independent torch mirror running
        in CHECKPOINT level order."""
        import dataclasses as dc

        import torch
        import torch.nn.functional as F

        from openpsg_tpu.models.segmenter.decoder import QueryDecoder
        from openpsg_tpu.models.segmenter.openseed import SegmenterConfig
        from openpsg_tpu.models.segmenter.weight_convert import convert_openseed

        cfg = dc.replace(SegmenterConfig.tiny_test(), total_levels=4,
                         proj_dim=32, dec_layers=1, num_queries=8)
        nH, K, C = 8, cfg.num_points, cfg.dim
        Q = cfg.num_queries
        state = synthetic_openseed_state(cfg)

        rng = np.random.default_rng(17)
        pr = "sem_seg_head.predictor."
        # randomize biases / norm scales so dropped mappings can't hide
        for k in list(state):
            if k.startswith(pr) and (
                k.endswith(".bias")
                or ".norm" in k and k.endswith(".weight")
                or k.endswith("enc_output_norm.weight")
            ):
                state[k] = rng.normal(scale=0.3, size=state[k].shape).astype(np.float32)
        state[pr + "decoder.layers.0.cross_attn.sampling_offsets.weight"] *= 0.05
        # keep enc/box deltas small so refined boxes stay interior
        for mk in ("bbox_embed.0", "bbox_embed.1"):
            if pr + mk + ".layers.2.weight" in state:
                state[pr + mk + ".layers.2.weight"] *= 0.1

        params, _ = convert_openseed(state, cfg)

        # level 0 (stride 8) is 52 rows tall -> its first row's centers are
        # y=(0.5)/52≈0.0096 < 0.01: INVALID, exercising the border rule
        shapes_int = [(52, 4), (6, 8), (3, 4), (2, 2)]
        stride_of = {(52, 4): 8, (6, 8): 16, (3, 4): 32, (2, 2): 64}
        ckpt_strides = tuple(cfg.ckpt_level_strides)    # (32, 16, 8, 64)
        shapes_ckpt = [next(s for s in shapes_int if stride_of[s] == st)
                       for st in ckpt_strides]
        L = len(shapes_int)
        blocks = {stride_of[s]: rng.normal(size=(s[0] * s[1], C)).astype(np.float32)
                  for s in shapes_int}
        mem_int = np.concatenate([blocks[stride_of[s]] for s in shapes_int], 0)
        mem_ck = np.concatenate([blocks[stride_of[s]] for s in shapes_ckpt], 0)
        mask_features = rng.normal(size=(10, 10, cfg.mask_dim)).astype(np.float32)
        n_cls = 7
        ce = rng.normal(size=(n_cls, cfg.proj_dim)).astype(np.float32)
        ce /= np.linalg.norm(ce, axis=-1, keepdims=True)

        # ---- torch mirror (checkpoint level order) ----
        tt = lambda k: torch.tensor(state[pr + k])
        lin = lambda x, k: x @ tt(k + ".weight").T + tt(k + ".bias")
        ln = lambda x, k: F.layer_norm(x, (C,), tt(k + ".weight"),
                                       tt(k + ".bias"), eps=1e-5)
        tce = torch.tensor(ce)
        cls_w = torch.tensor(state[pr + "class_embed"])
        logit_scale = float(state[pr + "lang_encoder.logit_scale"].reshape(()))

        def class_logits(x):
            p = x @ cls_w
            p = p / (p.norm(dim=-1, keepdim=True) + 1e-6)
            return (p @ tce.T) * np.exp(logit_scale)

        props, valids = [], []
        for lvl, (h, w) in enumerate(shapes_ckpt):
            ys, xs = np.meshgrid((np.arange(h) + 0.5) / h,
                                 (np.arange(w) + 0.5) / w, indexing="ij")
            ctr = np.stack([xs, ys], -1).reshape(-1, 2)
            wh = np.full((h * w, 2), 0.05 * 2.0 ** lvl)
            p = np.concatenate([ctr, wh], -1)
            props.append(p)
            valids.append(((p > 0.01) & (p < 0.99)).all(-1))
        props = torch.tensor(np.concatenate(props, 0).astype(np.float32))
        valid = torch.tensor(np.concatenate(valids, 0))
        assert (~valid).sum() == 8    # the stride-8 top AND bottom rows
        # (y = 0.5/52 ≈ 0.0096 < 0.01 and y = 51.5/52 ≈ 0.9904 > 0.99)

        out_mem = torch.where(valid[:, None], torch.tensor(mem_ck), torch.tensor(0.0))
        enc_out = ln(lin(out_mem, "enc_output"), "enc_output_norm")
        scores = class_logits(enc_out).max(-1).values
        top = torch.topk(scores, Q).indices
        assert len(torch.unique(scores[top])) == Q    # no ties in selection
        assert valid[top].all()                       # invalid rows not picked

        n_dec = 1
        delta = enc_out
        for j, i in ((0, 0), (1, 1), (2, 2)):
            delta = lin(delta, f"bbox_embed.{n_dec}.layers.{i}")
            if i != 2:
                delta = torch.relu(delta)
        plog = torch.where(valid[:, None],
                           torch.log(props / (1.0 - props)),
                           torch.tensor(float("inf")))
        prop_boxes = torch.sigmoid(plog + delta)

        tq = enc_out[top]
        tb = prop_boxes[top]

        # one refinement round (same mirror as the layer golden)
        def sine1d(v, half):
            dim_t = 10000.0 ** (
                2.0 * (torch.arange(half, dtype=torch.float64) // 2) / half)
            ang = (v.double() * 2.0 * np.pi) / dim_t
            out = torch.empty(v.shape[0], half, dtype=torch.float64)
            out[:, 0::2] = torch.sin(ang[:, 0::2])
            out[:, 1::2] = torch.cos(ang[:, 1::2])
            return out

        half = C // 2
        sine = torch.cat([sine1d(tb[:, i:i + 1], half) for i in (1, 0, 2, 3)],
                         -1).float()
        qpos = lin(torch.relu(lin(sine, "decoder.ref_point_head.layers.0")),
                   "decoder.ref_point_head.layers.1")

        inw = tt("decoder.layers.0.self_attn.in_proj_weight")
        inb = tt("decoder.layers.0.self_attn.in_proj_bias")
        qk = tq + qpos
        hd = C // nH
        qh = (qk @ inw[:C].T + inb[:C]).reshape(Q, nH, hd)
        kh = (qk @ inw[C:2 * C].T + inb[C:2 * C]).reshape(Q, nH, hd)
        vh = (tq @ inw[2 * C:].T + inb[2 * C:]).reshape(Q, nH, hd)
        att = torch.softmax(
            torch.einsum("qhd,khd->hqk", qh, kh) / np.sqrt(hd), -1)
        sa = torch.einsum("hqk,khd->qhd", att, vh).reshape(Q, C)
        sa = lin(sa, "decoder.layers.0.self_attn.out_proj")
        tq1 = ln(tq + sa, "decoder.layers.0.norm2")

        q2 = tq1 + qpos
        v = lin(torch.tensor(mem_ck), "decoder.layers.0.cross_attn.value_proj")
        off = lin(q2, "decoder.layers.0.cross_attn.sampling_offsets").reshape(
            Q, nH, L, K, 2)
        aw = lin(q2, "decoder.layers.0.cross_attn.attention_weights").reshape(
            Q, nH, L * K)
        aw = torch.softmax(aw, -1).reshape(Q, nH, L, K)
        loc = (tb[:, None, None, None, :2]
               + off / K * tb[:, None, None, None, 2:] * 0.5)
        starts = np.cumsum([0] + [h * w for h, w in shapes_ckpt])
        ca = torch.zeros(Q, nH, hd)
        for lvl, (h, w) in enumerate(shapes_ckpt):
            vl = (v[starts[lvl]:starts[lvl + 1]]
                  .reshape(h, w, nH, hd).permute(2, 3, 0, 1))
            g = (loc[:, :, lvl] * 2.0 - 1.0).permute(1, 0, 2, 3)
            sm = F.grid_sample(vl, g, mode="bilinear", padding_mode="zeros",
                               align_corners=False)
            wl = aw[:, :, lvl].permute(1, 0, 2)[:, None]
            ca += (sm * wl).sum(-1).permute(2, 0, 1)
        ca = lin(ca.reshape(Q, C), "decoder.layers.0.cross_attn.output_proj")
        tq2 = ln(tq1 + ca, "decoder.layers.0.norm1")
        ff = lin(torch.relu(lin(tq2, "decoder.layers.0.linear1")),
                 "decoder.layers.0.linear2")
        tq3 = ln(tq2 + ff, "decoder.layers.0.norm3")
        bdelta = tq3
        for i in (0, 1, 2):
            bdelta = lin(bdelta, f"bbox_embed.0.layers.{i}")
            if i != 2:
                bdelta = torch.relu(bdelta)
        want_boxes = torch.sigmoid(torch.log(tb / (1.0 - tb)) + bdelta).numpy()

        dec = ln(tq3, "decoder_norm")
        want_cls = class_logits(dec).numpy()
        z = dec
        for i in (0, 1, 2):
            z = lin(z, f"mask_embed.layers.{i}")
            if i != 2:
                z = torch.relu(z)
        want_masks = torch.einsum(
            "qc,hwc->qhw", z, torch.tensor(mask_features)).numpy()
        want_q = dec.numpy()

        # ---- ours (internal fine-first order; wh exponents via the knob) ----
        internal_strides = [8, 16, 32, 64]
        wh_exp = tuple(ckpt_strides.index(s) for s in internal_strides)
        qd = QueryDecoder(
            dim=C, num_queries=Q, num_layers=1, num_points=K,
            ffn_hidden=cfg.ffn_hidden, mask_dim=cfg.mask_dim,
            proj_dim=cfg.proj_dim, level_wh_exp=wh_exp,
        )
        out = jax.jit(
            lambda p, m, mf, c: qd.apply(
                {"params": p}, m, tuple(shapes_int), mf, c)
        )(params["decoder"], jnp.asarray(mem_int),
          jnp.asarray(mask_features), jnp.asarray(ce))

        np.testing.assert_allclose(np.asarray(out["query_embed"]), want_q,
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(out["cls_logits"]), want_cls,
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(out["boxes"]), want_boxes,
                                   rtol=5e-4, atol=5e-4)
        # mask logits reach ~1e3 here (synthetic unit-scale weights);
        # near-cancelling elements need an absolute floor scaled to that
        np.testing.assert_allclose(np.asarray(out["masks"]), want_masks,
                                   rtol=1e-3, atol=0.05)


def test_mmdet_swin_patch_merge_permutation_golden():
    """mmdet's PatchMerging gathers the 2x2 patch with nn.Unfold
    (channel-major, kernel positions row-major) while MS/HF Swin
    concatenates position-major slices (00, 10, 01, 11); the converter
    permutes the reduction/norm input columns between the two.  Golden:
    an unfold-based torch mirror with the RAW mmdet weights must equal
    the MS-style concat computed with the PERMUTED weights."""
    import torch
    import torch.nn.functional as F

    from openpsg_tpu.models.segmenter.weight_convert import (
        mmdet_swin_state_to_ms,
    )

    rng = np.random.default_rng(9)
    H = W = 6
    Cin = 8
    x = rng.normal(size=(H, W, Cin)).astype(np.float32)
    state = {
        "backbone.stages.0.downsample.reduction.weight":
            rng.normal(size=(2 * Cin, 4 * Cin)).astype(np.float32),
        "backbone.stages.0.downsample.norm.weight":
            rng.uniform(0.5, 1.5, 4 * Cin).astype(np.float32),
        "backbone.stages.0.downsample.norm.bias":
            rng.normal(size=(4 * Cin,)).astype(np.float32),
    }

    # torch mirror: mmcv PatchMerging forward (unfold -> norm -> reduce)
    xt = torch.tensor(x.transpose(2, 0, 1))[None]           # [1,C,H,W]
    unf = F.unfold(xt, kernel_size=2, stride=2)             # [1,4C,L]
    unf = unf.transpose(1, 2)[0]                            # [L, 4C]
    nrm = F.layer_norm(
        unf, (4 * Cin,),
        torch.tensor(state["backbone.stages.0.downsample.norm.weight"]),
        torch.tensor(state["backbone.stages.0.downsample.norm.bias"]),
    )
    want = (nrm @ torch.tensor(
        state["backbone.stages.0.downsample.reduction.weight"]).T).numpy()

    # MS-style concat with the converter's permuted weights
    ms = mmdet_swin_state_to_ms(state)
    x0 = x[0::2, 0::2]; x1 = x[1::2, 0::2]
    x2 = x[0::2, 1::2]; x3 = x[1::2, 1::2]
    cat = np.concatenate([x0, x1, x2, x3], -1).reshape(-1, 4 * Cin)
    w = ms["layers.0.downsample.norm.weight"]
    b = ms["layers.0.downsample.norm.bias"]
    mu = cat.mean(-1, keepdims=True)
    var = cat.var(-1, keepdims=True)
    nrm2 = (cat - mu) / np.sqrt(var + 1e-5) * w + b
    got = nrm2 @ ms["layers.0.downsample.reduction.weight"].T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestMetaLlamaGolden:
    """meta_llama_to_hf_state golden — against the REFERENCE's own
    Meta-format trunk (kings_sgg/models/commons/llama.py, torch-only so
    it loads standalone).  Pins the interleaved→rotate-half RoPE
    permutation on wq/wk: reference head-v3 checkpoints carry a TRAINED
    Meta-layout trunk (freeze_layers omit it, baseline_v3_r50.py:160),
    so importing them needs this bridge to be exactly right."""

    REF = "/root/reference/kings_sgg/models/commons/llama.py"

    def _load_ref_module(self):
        import importlib.util
        import os

        if not os.path.exists(self.REF):
            pytest.skip("reference tree not available")
        spec = importlib.util.spec_from_file_location("ref_llama", self.REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    @pytest.mark.parametrize("causal", [True, False])
    def test_hidden_and_logits_match_reference(self, causal):
        import torch

        from openpsg_tpu.models.llm.llama import (
            LlamaConfig,
            LlamaWithEmbeddings,
        )
        from openpsg_tpu.models.llm.weight_convert import (
            convert_llama,
            meta_llama_to_hf_state,
        )

        ref = self._load_ref_module()
        torch.manual_seed(0)
        args = ref.ModelArgs(
            dim=32, n_layers=2, n_heads=4, vocab_size=97,
            multiple_of=16, norm_eps=1e-5, max_seq_len=64,
        )
        if not hasattr(args, "shave_language_decoder_at"):
            args.shave_language_decoder_at = 0
        tm = ref.LlamaTransformer(args).eval()

        B, L = 2, 9
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 97, size=(B, L)).astype(np.int64)
        with torch.no_grad():
            want_logits, want_h = tm(
                torch.tensor(ids), is_train=True, causal_mask=causal
            )

        # FeedForward(dim, 4*dim, multiple_of=16): int(2*128/3)=85 → 96
        cfg = LlamaConfig(
            vocab_size=97, dim=32, n_layers=2, n_heads=4, n_kv_heads=4,
            ffn_hidden=96, max_seq_len=64, causal=causal,
            dtype=jnp.float32,
        )
        state = meta_llama_to_hf_state(
            {k: v.numpy() for k, v in tm.state_dict().items()},
            n_heads=4, n_kv_heads=4,
        )
        params = convert_llama(state, cfg, dtype=jnp.float32)
        model = LlamaWithEmbeddings(cfg)
        got_logits, _ = model.apply(
            params, token_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.ones((B, L), bool),
            positions=jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None], (B, L)
            ),
        )
        got_h, _ = model.apply(
            params, token_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.ones((B, L), bool),
            positions=jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None], (B, L)
            ),
            return_hidden=True,
        )
        np.testing.assert_allclose(
            np.asarray(got_h), want_h.numpy(), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_logits), want_logits.numpy(),
            rtol=2e-4, atol=2e-5,
        )
