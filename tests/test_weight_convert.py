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
