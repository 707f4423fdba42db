"""Weight conversion: HF Llama layout → scanned flax tree.

No real checkpoints exist in this environment, so we build a synthetic HF
state dict with the canonical tensor names/shapes, convert, check the tree
matches a fresh init exactly, and check logits change when weights load
(i.e. the converted values actually land)."""

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
