"""Llama-family decoder-only LLM, TPU-first (flax.linen).

Fills the role of the frozen HF ``Llama-2-7b-hf`` relation decoder
(relation_transformer_head_v4.py:99-105) and of the truncated-LLaMA v3
relation encoder (kings_sgg/models/commons/llama.py): RMSNorm, RoPE,
grouped-query attention, SwiGLU FFN.  Differences from the reference's
usage are deliberate TPU redesigns:

  * the reference issues ≤20 *sequential* ``generate()`` calls per image
    (SURVEY.md §3.5#3); here decode is one batched KV-cache loop
    (``decode.greedy_decode``) over all selected pairs;
  * attention masks / positions are explicit so left-padded prompts,
    visual-prefix tokens and teacher-forcing labels are all the same
    static-shape forward;
  * ``layer_truncate`` reproduces both ``llm_truncate_num``
    (v4, :101-103) and ``shave_language_decoder_at`` (v3 head);
  * optional non-causal mode mirrors v3's full-attention option
    (commons/llama.py:211-218).

Tensor-parallel sharding of the params is applied externally
(openpsg_tpu.parallel.sharding) — the module itself is mesh-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    ffn_hidden: int = 11008
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 512
    causal: bool = True
    dtype: Any = jnp.bfloat16

    @staticmethod
    def llama2_7b(dtype=jnp.bfloat16) -> "LlamaConfig":
        return LlamaConfig(dtype=dtype)

    @staticmethod
    def tiny_test(vocab_size: int = 128) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab_size, dim=64, n_layers=2, n_heads=4,
            n_kv_heads=2, ffn_hidden=128, max_seq_len=128, dtype=jnp.float32,
        )

    def truncate(self, n: int) -> "LlamaConfig":
        """Keep only the first n layers (llm_truncate_num /
        shave_language_decoder_at semantics)."""
        return dataclasses.replace(self, n_layers=n)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding. x: [B, L, H, hd]; positions: [B, L] int32."""
    hd = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, L, hd/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    # interleaved convention (x_even, x_odd) pairs, matching Llama weights
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1).astype(
        x.dtype
    )


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.mean(x32 ** 2, -1, keepdims=True) + self.eps)
        return (normed * w).astype(self.dtype)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                 # [B, L, D]
        positions: jnp.ndarray,         # [B, L]
        attn_mask: jnp.ndarray,         # [B, L, Lk] bool (True = attend)
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        hd = c.dim // c.n_heads
        B, L, _ = x.shape

        h = RMSNorm(c.dim, c.norm_eps, c.dtype, name="attn_norm")(x)
        q = nn.Dense(c.n_heads * hd, use_bias=False, dtype=c.dtype, name="wq")(h)
        k = nn.Dense(c.n_kv_heads * hd, use_bias=False, dtype=c.dtype, name="wk")(h)
        v = nn.Dense(c.n_kv_heads * hd, use_bias=False, dtype=c.dtype, name="wv")(h)
        q = q.reshape(B, L, c.n_heads, hd)
        k = k.reshape(B, L, c.n_kv_heads, hd)
        v = v.reshape(B, L, c.n_kv_heads, hd)
        q = _rope(q, positions, c.rope_theta)
        k = _rope(k, positions, c.rope_theta)

        if cache is not None:
            ck, cv = cache  # [B, S, n_kv, hd]
            ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype), cache_index, axis=1)
            cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype), cache_index, axis=1)
            k_all, v_all = ck, cv
            new_cache = (ck, cv)
        else:
            k_all, v_all = k, v
            new_cache = None

        rep = c.n_heads // c.n_kv_heads
        if rep > 1:
            k_all = jnp.repeat(k_all, rep, axis=2)
            v_all = jnp.repeat(v_all, rep, axis=2)

        attn = jnp.einsum(
            "blhd,bmhd->bhlm", q, k_all, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        attn = jnp.where(attn_mask[:, None], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v_all)
        out = out.reshape(B, L, c.n_heads * hd)
        x = x + nn.Dense(c.dim, use_bias=False, dtype=c.dtype, name="wo")(out)

        h = RMSNorm(c.dim, c.norm_eps, c.dtype, name="ffn_norm")(x)
        gate = nn.Dense(c.ffn_hidden, use_bias=False, dtype=c.dtype, name="w_gate")(h)
        up = nn.Dense(c.ffn_hidden, use_bias=False, dtype=c.dtype, name="w_up")(h)
        down = nn.Dense(c.dim, use_bias=False, dtype=c.dtype, name="w_down")(
            nn.silu(gate) * up
        )
        return x + down, new_cache


class Llama(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        *,
        input_embeds: jnp.ndarray,              # [B, L, D]
        attention_mask: jnp.ndarray,            # [B, Lk_total] bool over keys
        positions: jnp.ndarray,                 # [B, L] int32
        cache: Optional[Tuple] = None,          # tuple per layer of (k, v)
        cache_index: Optional[jnp.ndarray] = None,
        key_positions: Optional[jnp.ndarray] = None,  # [B, S] when cache used
        return_hidden: bool = False,
    ):
        """Returns (logits [B, L, V], new_cache).

        With ``cache``: keys span the cache length S; ``attention_mask`` and
        ``key_positions`` must be [B, S] (the caller maintains the positions
        it wrote into each cache slot — this supports padded/held layouts
        like the reference's [visual ; left-padded text] prompt, where HF
        computes position_ids = cumsum(mask)-1).  Without cache: keys are
        the inputs and ``key_positions`` defaults to ``positions``.
        Causality: query at position p attends to keys with position ≤ p;
        padded slots are excluded by ``attention_mask``.
        """
        c = self.cfg
        B, L, _ = input_embeds.shape

        if cache is not None:
            assert key_positions is not None, "cache path requires key_positions"
        else:
            key_positions = positions if key_positions is None else key_positions
        if c.causal:
            causal = key_positions[:, None, :] <= positions[:, :, None]
        else:
            causal = jnp.ones((B, L, key_positions.shape[1]), bool)
        mask = causal & attention_mask[:, None, :]

        x = input_embeds.astype(c.dtype)
        new_caches = []
        for i in range(c.n_layers):
            layer_cache = cache[i] if cache is not None else None
            x, nc = LlamaBlock(c, name=f"layer{i}")(
                x, positions, mask, layer_cache, cache_index
            )
            new_caches.append(nc)
        x = RMSNorm(c.dim, c.norm_eps, c.dtype, name="final_norm")(x)
        if return_hidden:
            return x, (tuple(new_caches) if cache is not None else None)
        logits = nn.Dense(
            c.vocab_size, use_bias=False, dtype=c.dtype, name="lm_head"
        )(x)
        return logits.astype(jnp.float32), (
            tuple(new_caches) if cache is not None else None
        )

    def embed_tokens(self, params, token_ids: jnp.ndarray) -> jnp.ndarray:
        """Look up input embeddings (the ``get_input_embeddings()`` path)."""
        emb = params["params"]["tok_embed"]["embedding"]
        return jnp.take(emb, token_ids, axis=0).astype(self.cfg.dtype)

    def setup_embed(self):  # pragma: no cover - placeholder
        pass


class LlamaWithEmbeddings(nn.Module):
    """Llama plus its token-embedding table as one module."""

    cfg: LlamaConfig

    def setup(self):
        self.tok_embed = nn.Embed(
            self.cfg.vocab_size, self.cfg.dim, dtype=self.cfg.dtype,
            name="tok_embed",
        )
        self.core = Llama(self.cfg, name="core")

    def embed(self, token_ids):
        return self.tok_embed(token_ids)

    def __call__(self, *, input_embeds=None, token_ids=None, attention_mask,
                 positions, cache=None, cache_index=None, key_positions=None,
                 return_hidden=False):
        if input_embeds is None:
            input_embeds = self.tok_embed(token_ids)
        return self.core(
            input_embeds=input_embeds, attention_mask=attention_mask,
            positions=positions, cache=cache, cache_index=cache_index,
            key_positions=key_positions, return_hidden=return_hidden,
        )


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=None):
    """Zeroed per-layer (k, v) cache: tuple of [B, max_len, n_kv, hd]."""
    hd = cfg.dim // cfg.n_heads
    dtype = dtype or cfg.dtype
    one = lambda: jnp.zeros((batch, max_len, cfg.n_kv_heads, hd), dtype)
    return tuple((one(), one()) for _ in range(cfg.n_layers))
