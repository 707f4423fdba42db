"""Llama-family decoder-only LLM, TPU-first (flax.linen).

Fills the role of the frozen HF ``Llama-2-7b-hf`` relation decoder
(relation_transformer_head_v4.py:99-105) and of the truncated-LLaMA v3
relation encoder (kings_sgg/models/commons/llama.py): RMSNorm, RoPE,
grouped-query attention, SwiGLU FFN.  Deliberate TPU redesigns:

  * layers run under ``nn.scan`` — one compiled block instead of
    ``n_layers`` unrolled copies (compile time and HLO size stay flat as
    depth grows; params are stacked on a leading layer axis);
  * full forward and cached decode are ONE code path: a forward without a
    caller-provided cache writes into a fresh cache of the input length
    (prefill ≡ forward), so the scanned block is always homogeneous;
  * explicit positions + attention masks support any pad layout, matching
    HF ``cumsum(mask)-1`` semantics (the reference feeds
    [visual ; left-padded text] whose pads sit mid-sequence);
  * ``layer_truncate`` reproduces ``llm_truncate_num`` (v4 :101-103) and
    v3's ``shave_language_decoder_at``; optional non-causal mode mirrors
    commons/llama.py:211-218.

Tensor-parallel sharding of params is applied externally
(openpsg_tpu.parallel.sharding); the module is mesh-agnostic.
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
    # weight-only int8: projection kernels stored int8 with per-output-
    # channel f32 scales (dequantized into the matmul's operand dtype).
    # Halves→quarters HBM for the frozen 7B so it fits one v5e chip;
    # activations/cache stay in ``dtype``.
    quant: bool = False
    # dynamic per-token int8 ACTIVATION quantization for large (prefill-
    # shaped) matmuls on top of the int8 weights: int8×int8 rides the MXU
    # at 2× bf16 throughput (measured 1.68× end-to-end on the 1024×4096×
    # 11008 FFN matmul incl. the quantize step, v5e).  Quality knob —
    # default OFF for reference parity; decode (few rows, HBM-bound)
    # always stays on the bf16 path.
    act_int8: bool = False
    # rematerialize each scanned layer in the backward pass (training-path
    # knob).  Without it, grads flowing THROUGH the frozen stack (Q-Former
    # trains on the teacher-forcing loss, reference head_v4 :293-341) make
    # the layer scan save per-layer residuals — including the DEQUANTIZED
    # bf16 int8 kernels, ~0.4 GB × n_layers at 7B — which OOMs a 16 GB
    # v5e chip.  Remat re-runs each layer's forward during backward
    # instead; the teacher-forcing sequences are tiny (≤4 pairs × ~80
    # tokens) so the recompute is noise.
    remat: bool = False
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
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1).astype(
        x.dtype
    )


def _int8_init(key, shape, dtype=jnp.int8):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


class QDense(nn.Module):
    """Weight-only int8 linear: kernel_q int8 [in, out] + scale f32 [out].

    Param names keep the ``kernel`` substring so the tensor-parallel
    sharding rules (parallel.sharding) apply unchanged.

    With ``act_int8`` and ≥``ACT_INT8_MIN_ROWS`` input rows (a static,
    trace-time property — prefill, not decode), activations are
    dynamically quantized per token (symmetric, max-abs) and the matmul
    runs int8×int8→int32 on the MXU at ~2× bf16 throughput; the output
    is rescaled by ``s_x · scale``."""

    features: int
    dtype: Any = jnp.bfloat16
    act_int8: bool = False

    ACT_INT8_MIN_ROWS = 256

    @nn.compact
    def __call__(self, x):
        kq = self.param("kernel_q", _int8_init, (x.shape[-1], self.features))
        scale = self.param(
            "scale", nn.initializers.constant(1.0 / 127.0), (self.features,)
        )
        rows = 1
        for d in x.shape[:-1]:
            rows *= int(d)
        if self.act_int8 and rows >= self.ACT_INT8_MIN_ROWS:
            xf = x.astype(jnp.float32)
            s_x = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6
            ) / 127.0
            xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (
                y.astype(jnp.float32) * s_x * scale.astype(jnp.float32)
            ).astype(self.dtype)
        y = jnp.einsum(
            "...i,io->...o", x, kq.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return (y * scale.astype(jnp.float32)).astype(self.dtype)


def _dense(cfg: LlamaConfig, features: int, name: str):
    if cfg.quant:
        return QDense(
            features, dtype=cfg.dtype, act_int8=cfg.act_int8, name=name
        )
    return nn.Dense(features, use_bias=False, dtype=cfg.dtype, name=name)


def quantize_llama(params):
    """bf16/f32 LlamaWithEmbeddings params → weight-only int8 tree for a
    ``quant=True`` config: per-output-channel symmetric scales over the
    input axis; embeddings and norms untouched."""
    import numpy as np

    targets = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head"}

    def walk(tree, under_target=False):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, under_target or k in targets)
            elif k == "kernel" and under_target:
                w = np.asarray(v, np.float32)
                scale = np.maximum(
                    np.max(np.abs(w), axis=-2, keepdims=True) / 127.0, 1e-8
                )
                out["kernel_q"] = np.clip(
                    np.round(w / scale), -127, 127
                ).astype(np.int8)
                out["scale"] = np.squeeze(scale, -2).astype(np.float32)
            else:
                out[k] = v
        return out

    return walk(params)


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
    """One decoder block.  Scan signature: carry is the hidden state plus
    shared masks; per-layer xs is that layer's READ-ONLY (k, v) cache
    (possibly zero-length), per-layer ys is the (k, v) of the current
    tokens.  The cache is never rewritten inside the layer scan — the
    caller folds ys into the big cache with ONE dynamic_update_slice, so a
    decode step writes ~L tokens of KV instead of the whole cache (the
    old ys-the-updated-cache layout cost 2 full cache writes per step)."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, carry, layer_cache: Tuple[jnp.ndarray, jnp.ndarray]):
        x, positions, mask_cache, mask_cur = carry
        c = self.cfg
        hd = c.dim // c.n_heads
        B, L, _ = x.shape

        h = RMSNorm(c.dim, c.norm_eps, c.dtype, name="attn_norm")(x)
        q = _dense(c, c.n_heads * hd, "wq")(h)
        k = _dense(c, c.n_kv_heads * hd, "wk")(h)
        v = _dense(c, c.n_kv_heads * hd, "wv")(h)
        q = _rope(q.reshape(B, L, c.n_heads, hd), positions, c.rope_theta)
        k = _rope(k.reshape(B, L, c.n_kv_heads, hd), positions, c.rope_theta)
        v = v.reshape(B, L, c.n_kv_heads, hd)

        ck, cv = layer_cache  # [B, S, n_kv, hd] (S may be 0)
        rep = c.n_heads // c.n_kv_heads

        def expand(t):
            return jnp.repeat(t, rep, axis=2) if rep > 1 else t

        # scores over [cached keys ; current keys] — cached keys are stored
        # pre-roped; current-slot staleness is excluded via mask_cache
        s_cache = jnp.einsum(
            "blhd,bmhd->bhlm", q, expand(ck.astype(q.dtype)),
            preferred_element_type=jnp.float32,
        )
        s_cur = jnp.einsum(
            "blhd,bmhd->bhlm", q, expand(k),
            preferred_element_type=jnp.float32,
        )
        attn = jnp.concatenate([s_cache, s_cur], axis=-1) * (hd ** -0.5)
        mask = jnp.concatenate([mask_cache, mask_cur], axis=-1)
        attn = jnp.where(mask[:, None], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1).astype(c.dtype)
        S = ck.shape[1]
        out = jnp.einsum(
            "bhlm,bmhd->blhd", attn[..., :S], expand(cv.astype(v.dtype))
        ) + jnp.einsum("bhlm,bmhd->blhd", attn[..., S:], expand(v))
        out = out.reshape(B, L, c.n_heads * hd)
        x = x + _dense(c, c.dim, "wo")(out)

        h = RMSNorm(c.dim, c.norm_eps, c.dtype, name="ffn_norm")(x)
        gate = _dense(c, c.ffn_hidden, "w_gate")(h)
        up = _dense(c, c.ffn_hidden, "w_up")(h)
        down = _dense(c, c.dim, "w_down")(nn.silu(gate) * up)
        return (x + down, positions, mask_cache, mask_cur), (
            k.astype(ck.dtype), v.astype(cv.dtype)
        )


class Llama(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        *,
        input_embeds: jnp.ndarray,              # [B, L, D]
        attention_mask: jnp.ndarray,            # [B, S] bool over keys
        positions: jnp.ndarray,                 # [B, L] int32
        cache: Optional[Tuple] = None,          # stacked (k, v): [nL, B, S, kv, hd]
        cache_index: Optional[jnp.ndarray] = None,
        key_positions: Optional[jnp.ndarray] = None,  # [B, S] when cache used
        full_mask: Optional[jnp.ndarray] = None,      # [B, L, S] bool override
        return_hidden: bool = False,
        last_logit_only: bool = False,
    ):
        """Returns (logits [B, L, V] or hidden, new_cache).

        With an external ``cache`` (from ``init_kv_cache``): keys span the
        cache length S plus the L current tokens; ``attention_mask`` and
        ``key_positions`` are [B, S] (the L current tokens' slots
        [cache_index, cache_index+L) take their validity from
        ``attention_mask`` but their keys come from this call, never from
        the stale cache contents).  ``new_cache`` is the cache with the
        current tokens' (k, v) folded in at ``cache_index``.

        Without an external cache: attention runs over the L current
        tokens only (S == L) and ``new_cache`` is the packed
        ([n_layers, B, L, n_kv, hd], ...) KV of this call — a valid cache
        of length L (callers that don't decode may ignore it).
        Causality: query position p attends to key positions ≤ p; padded
        slots excluded by ``attention_mask``.
        """
        c = self.cfg
        B, L, _ = input_embeds.shape
        hd = c.dim // c.n_heads

        if cache is None:
            # no cached keys: zero-length read-only cache, current tokens
            # attend among themselves
            cache = (
                jnp.zeros((c.n_layers, B, 0, c.n_kv_heads, hd), c.dtype),
                jnp.zeros((c.n_layers, B, 0, c.n_kv_heads, hd), c.dtype),
            )
            cache_index = jnp.int32(0)
            external_cache = False
            if full_mask is not None:
                mask_cur = full_mask
            elif c.causal:
                kp = positions if key_positions is None else key_positions
                mask_cur = kp[:, None, :] <= positions[:, :, None]
            else:
                mask_cur = jnp.ones((B, L, L), bool)
            mask_cur = mask_cur & attention_mask[:, None, :]
            mask_cache = jnp.zeros((B, L, 0), bool)
        else:
            assert key_positions is not None, "cache path requires key_positions"
            external_cache = True
            S = cache[0].shape[2]
            if full_mask is not None:
                base = full_mask
                mask_cur = jax.lax.dynamic_slice(
                    full_mask, (0, 0, cache_index), (B, L, L)
                )
            elif c.causal:
                base = key_positions[:, None, :] <= positions[:, :, None]
                mask_cur = positions[:, None, :] <= positions[:, :, None]
            else:
                base = jnp.ones((B, L, S), bool)
                mask_cur = jnp.ones((B, L, L), bool)
            # current tokens' slots: keys come from this call (ys), so the
            # stale cache entries there are masked out of the cache part
            slot = jnp.arange(S, dtype=jnp.int32)[None, None, :]
            in_cur = (slot >= cache_index) & (slot < cache_index + L)
            mask_cache = base & attention_mask[:, None, :] & ~in_cur
            cur_valid = jax.lax.dynamic_slice(
                attention_mask, (0, cache_index), (B, L)
            )
            mask_cur = mask_cur & cur_valid[:, None, :]

        block_cls = (
            nn.remat(LlamaBlock, prevent_cse=False) if c.remat else LlamaBlock
        )
        block = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
        )(c, name="layers")
        (x, _, _, _), (k_new, v_new) = block(
            (input_embeds.astype(c.dtype), positions, mask_cache, mask_cur),
            cache,
        )
        if external_cache:
            new_cache = (
                jax.lax.dynamic_update_slice(
                    cache[0], k_new, (0, 0, cache_index, 0, 0)
                ),
                jax.lax.dynamic_update_slice(
                    cache[1], v_new, (0, 0, cache_index, 0, 0)
                ),
            )
        else:
            new_cache = (k_new, v_new)
        x = RMSNorm(c.dim, c.norm_eps, c.dtype, name="final_norm")(x)
        if return_hidden:
            return x, new_cache
        if last_logit_only:
            # project only the final position (the reference's inference
            # also takes last-token logits only, commons/llama.py:294);
            # skips a [B, L, V] materialization at prefill
            x = x[:, -1:]
        logits = _dense(c, c.vocab_size, "lm_head")(x)
        return logits.astype(jnp.float32), new_cache


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
                 full_mask=None, return_hidden=False, last_logit_only=False):
        if input_embeds is None:
            input_embeds = self.tok_embed(token_ids)
        return self.core(
            input_embeds=input_embeds, attention_mask=attention_mask,
            positions=positions, cache=cache, cache_index=cache_index,
            key_positions=key_positions, full_mask=full_mask,
            return_hidden=return_hidden, last_logit_only=last_logit_only,
        )


def decouple_label_masks(
    token_ids,
    answer_id: int,
    delimiter_id: int,
    decouple_positions: bool = False,
):
    """Host-side port of the reference's ``decouple_label_tok_embeds``
    attention surgery (kings_sgg/models/commons/llama.py:226-288): the
    answer region after the last ``answer_id`` token holds delimiter-
    separated label segments; each segment attends causally within itself
    plus the full prompt, but NOT to earlier segments, so per-label
    predictions are conditionally independent given the prompt.  With
    ``decouple_positions`` every segment's RoPE positions restart at the
    answer position (the reference's ``decouple_freqs_cis``).

    → (mask [B, L, L] bool — feed as ``full_mask``; positions [B, L] i32).
    The reference hardcodes ids 526 ("are") / 29892 (","); pass your
    tokenizer's equivalents.
    """
    import numpy as np

    ids = np.asarray(token_ids)
    B, L = ids.shape
    tril = np.tril(np.ones((L, L), bool))
    mask = np.tile(tril[None], (B, 1, 1))
    positions = np.tile(np.arange(L, dtype=np.int32)[None], (B, 1))

    # answer start: first answer_id in the LAST sample (reference :232)
    hits = np.nonzero(ids[-1] == answer_id)[0]
    if not len(hits):
        return mask, positions
    a = int(hits[0])

    for b in range(B):
        prev = a
        delims = np.nonzero(ids[b] == delimiter_id)[0]
        for d in delims:
            end = int(d) + 1  # delimiter conditions on its own segment
            # tokens of this segment must not see earlier label segments
            mask[b, prev:end, a + 1 : prev] = False
            if decouple_positions:
                positions[b, prev:end] = a + np.arange(end - prev)
            prev = end
        # trailing segment after the last delimiter
        if prev < L:
            mask[b, prev:, a + 1 : prev] = False
            if decouple_positions:
                positions[b, prev:] = a + np.arange(L - prev)
    return mask, positions


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=None):
    """Zeroed stacked (k, v) cache: two [n_layers, B, max_len, n_kv, hd]
    arrays (leading layer axis matches the scanned block layout)."""
    hd = cfg.dim // cfg.n_heads
    dtype = dtype or cfg.dtype
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, hd)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
