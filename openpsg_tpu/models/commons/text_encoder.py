"""BERT/CLIP-style transformer encoder with the reference's wrapper knobs.

Covers the capability surface of the reference's commons zoo
(SURVEY.md §2.5) in ONE configurable module:

  * layer truncation (``num_layers`` — BertWrapper ``num_transformer_layer``,
    bert_wrapper.py:45-46);
  * decoder mode with cross-attention to encoder states
    (``add_cross_attention`` — bert_wrapper.py:28-30, used by head v2's
    pair text↔vision experts);
  * bottleneck adapters after attention and parallel to the FFN with the
    trunk frozen (bert_with_adapter.py:15-65, clip_with_adapter.py:30-98;
    freezing is an optimizer-mask concern in JAX — see
    openpsg_tpu.train.checkpoint.split_trainable);
  * learnable prompt embeddings spliced between CLS and the text tokens
    with mask extension (bert_with_learnable_embeds.py:80-86, 135-139);
  * ``forward_embeds`` (externally-projected token sequences, no word
    embedding — bert_wrapper.py:53-58 / clip_wrapper.py:45-54) and
    ``forward_texts`` (token ids → pooled vector, bert_wrapper.py:60-69).

Layers run under nn.scan (stacked params) like the rest of the framework.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BertStyleConfig:
    hidden_size: int = 768
    num_layers: int = 2
    num_heads: int = 12
    intermediate: int = 3072
    vocab_size: int = 1024
    max_len: int = 128
    add_cross_attention: bool = False
    encoder_hidden_size: int = 256
    use_adapters: bool = False
    adapter_reduction: int = 4        # bottleneck /4 (clip_with_adapter.py:16-27)
    num_learnable_prompts: int = 0
    pre_ln: bool = False              # CLIP towers are pre-LN; BERT post-LN
    quick_gelu: bool = False          # CLIP's x*sigmoid(1.702x) activation
    causal: bool = False              # CLIP text attention is causal
    ln_eps: float = 1e-12             # HF BERT epsilon; CLIP towers use 1e-5
    bare: bool = False                # raw HF BertEncoder: layer stack only
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test(**kw) -> "BertStyleConfig":
        base = dict(hidden_size=32, num_layers=2, num_heads=2,
                    intermediate=64, vocab_size=64, max_len=32)
        base.update(kw)
        return BertStyleConfig(**base)


class DenseLN(nn.Module):
    """Linear → LayerNorm, the reference's ubiquitous fc block.

    Every projection the reference heads call ``fc_*`` is
    ``nn.Sequential(nn.Linear(...), nn.LayerNorm(...))`` (e.g.
    relation_transformer_head.py:83-94, _v2.py:82-113, _v3.py:125-150);
    torch LayerNorm eps default 1e-5.  Param scopes {dense, ln} map 1:1
    onto the checkpoint's ``<name>.0`` / ``<name>.1`` entries."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype, name="dense")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)


class _Adapter(nn.Module):
    """Bottleneck adapter: down /r → GELU → up, residual added by caller."""

    dim: int
    reduction: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim // self.reduction, dtype=self.dtype, name="down")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="up")(h)


class _EncoderLayer(nn.Module):
    """``skip_cross`` mirrors HF BERT: a decoder layer applies its
    cross-attention block only when encoder_hidden_states are passed —
    head v2's shared pair encoder is called both ways (pair_vision_only
    self-attends only; the text↔vision experts cross-attend).  The cross
    modules are still CALLED on a dummy key so the param tree is identical
    regardless of which call happens first; the result is discarded
    statically (XLA dead-code-eliminates it)."""

    cfg: BertStyleConfig
    skip_cross: bool = False

    @nn.compact
    def __call__(self, carry, _):
        x, self_mask, enc_states, enc_mask = carry
        c = self.cfg
        D = c.hidden_size

        if c.pre_ln:
            # CLIP ordering: x += attn(LN(x)); x += mlp(LN(x))
            h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="attn_pre_ln")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=c.num_heads, dtype=c.dtype, name="self_attn"
            )(h, inputs_k=h, inputs_v=h, mask=self_mask[:, None])
            if c.use_adapters:
                h = h + _Adapter(D, c.adapter_reduction, c.dtype, name="attn_adapter")(h)
            x = x + h
            if c.add_cross_attention:
                h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="cross_pre_ln")(x)
                h = nn.MultiHeadDotProductAttention(
                    num_heads=c.num_heads, dtype=c.dtype, name="cross_attn"
                )(h, inputs_k=enc_states, inputs_v=enc_states,
                  mask=enc_mask[:, None])
                if not self.skip_cross:
                    x = x + h
            h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ffn_pre_ln")(x)
            f = nn.Dense(c.intermediate, dtype=c.dtype, name="ffn_up")(h)
            if c.quick_gelu:
                f = f * jax.nn.sigmoid(1.702 * f)
            else:
                f = nn.gelu(f, approximate=False)
            f = nn.Dense(D, dtype=c.dtype, name="ffn_down")(f)
            if c.use_adapters:
                f = f + _Adapter(D, c.adapter_reduction, c.dtype, name="ffn_adapter")(h)
            x = x + f
            return (x, self_mask, enc_states, enc_mask), None

        h = nn.MultiHeadDotProductAttention(
            num_heads=c.num_heads, dtype=c.dtype, name="self_attn"
        )(x, inputs_k=x, inputs_v=x, mask=self_mask[:, None])
        if c.use_adapters:
            h = h + _Adapter(D, c.adapter_reduction, c.dtype, name="attn_adapter")(h)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="self_ln")(x + h)

        if c.add_cross_attention:
            h = nn.MultiHeadDotProductAttention(
                num_heads=c.num_heads, dtype=c.dtype, name="cross_attn"
            )(x, inputs_k=enc_states, inputs_v=enc_states,
              mask=enc_mask[:, None])
            xc = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="cross_ln")(x + h)
            if not self.skip_cross:
                x = xc

        f = nn.Dense(c.intermediate, dtype=c.dtype, name="ffn_up")(x)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(D, dtype=c.dtype, name="ffn_down")(f)
        if c.use_adapters:
            # parallel adapter on the FFN input (bert_with_adapter.py:15-65)
            f = f + _Adapter(D, c.adapter_reduction, c.dtype, name="ffn_adapter")(x)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ffn_ln")(x + f)
        return (x, self_mask, enc_states, enc_mask), None


class BertStyleEncoder(nn.Module):
    cfg: BertStyleConfig

    @nn.compact
    def __call__(
        self,
        *,
        token_ids: Optional[jnp.ndarray] = None,      # [B, L]
        input_embeds: Optional[jnp.ndarray] = None,   # [B, L, D] (forward_embeds)
        attention_mask: Optional[jnp.ndarray] = None, # [B, L] bool
        encoder_hidden: Optional[jnp.ndarray] = None, # [B, P, De]
        encoder_mask: Optional[jnp.ndarray] = None,   # [B, P] bool
        pool: bool = False,                           # forward_texts pooling
        position_ids: Optional[int] = None,           # None=range; int=constant
        learnable_embeds: Optional[jnp.ndarray] = None,  # [B, P, D] per-row
    ):
        """``position_ids``: the reference heads feed OBJECT tokens with a
        CONSTANT position id — v1 passes ``torch.ones`` (row 1,
        relation_transformer_head.py:159-163) and v2 ``torch.zeros`` (row 0,
        relation_transformer_head_v2.py:199-302) — so relation scores are
        permutation-equivariant in the (arbitrary) object order.  Text paths
        (forward_texts) keep the normal 0..L-1 range (None)."""
        c = self.cfg
        D = c.hidden_size
        if input_embeds is None:
            emb = nn.Embed(c.vocab_size, D, dtype=c.dtype, name="word_embed")(token_ids)
        else:
            emb = input_embeds.astype(c.dtype)
        B, L = emb.shape[:2]
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), bool)

        if c.bare:
            # raw HF ``BertEncoder`` semantics (head v3's o_in/o_out/r_out
            # formers, relation_transformer_head_v3.py:116-121): no
            # embeddings, no position table, no embedding LN, no pooler —
            # just the layer stack over caller-provided hidden states.
            x = emb
        else:
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02), (c.max_len, D)
            )
            if position_ids is None:
                x = emb + pos[None, :L].astype(c.dtype)
            else:
                x = emb + pos[position_ids][None, None].astype(c.dtype)

        if not c.pre_ln and not c.bare:  # CLIP/bare have no embedding LN
            x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="embed_ln")(x)

        if learnable_embeds is not None or c.num_learnable_prompts > 0:
            # splice learned prompts between position 0 (CLS) and the rest,
            # AFTER the embeddings module — i.e. past the BERT embedding
            # LayerNorm and without position rows, exactly like the
            # reference's BertModelWithLearnableEmbeds /
            # CLIPTextTransformerWithLearnableEmbeds (both splice the raw
            # prompt table into embeddings' output, :133-141 / :45-51).
            # ``learnable_embeds`` [B, P, D] is the per-ROW table the v1
            # head passes (one prompt block per relation text); the
            # config-driven path learns one shared [P, D] block.
            if learnable_embeds is None:
                prompts = self.param(
                    "learnable_prompts", nn.initializers.normal(0.02),
                    (c.num_learnable_prompts, D),
                )
                learnable_embeds = jnp.broadcast_to(
                    prompts[None], (B,) + prompts.shape
                )
            pr = learnable_embeds.astype(c.dtype)
            P = pr.shape[1]
            x = jnp.concatenate([x[:, :1], pr, x[:, 1:]], axis=1)
            attention_mask = jnp.concatenate(
                [
                    attention_mask[:, :1],
                    jnp.ones((B, P), bool),
                    attention_mask[:, 1:],
                ],
                axis=1,
            )
            L = L + P

        # HF semantics: the attention mask hides KEYS only — padded QUERY
        # rows still attend over the valid keys (BertModel
        # get_extended_attention_mask broadcasts [B,1,1,L]).  AND-ing in
        # query validity diverges on pad rows (uniform attention vs real),
        # which golden tests against HF towers would catch.
        self_mask = jnp.broadcast_to(attention_mask[:, None, :], (B, L, L))
        if c.causal:
            self_mask = self_mask & jnp.tril(jnp.ones((L, L), bool))[None]
        if encoder_hidden is None:
            enc_states = jnp.zeros((B, 1, D), c.dtype)
            enc_mask3 = jnp.ones((B, L, 1), bool)
        else:
            if encoder_hidden.shape[-1] != D:
                encoder_hidden = nn.Dense(
                    D, dtype=c.dtype, name="encoder_proj"
                )(encoder_hidden)
            enc_states = encoder_hidden.astype(c.dtype)
            em = (
                encoder_mask
                if encoder_mask is not None
                else jnp.ones(enc_states.shape[:2], bool)
            )
            enc_mask3 = jnp.broadcast_to(em[:, None, :], (B, L, em.shape[1]))

        layer = nn.scan(
            _EncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.num_layers,
        )(c, skip_cross=encoder_hidden is None, name="layers")
        (x, _, _, _), _ = layer((x, self_mask, enc_states, enc_mask3), None)
        if c.bare:
            return x
        if c.pre_ln:
            x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="final_ln")(x)

        # BERT pooler: tanh(dense(CLS)) (bert_wrapper.py:60-69).  Always
        # constructed so init creates its params regardless of call flags.
        pooled = nn.tanh(nn.Dense(D, dtype=c.dtype, name="pooler")(x[:, 0]))
        return pooled if pool else x
