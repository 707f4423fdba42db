"""Relation Q-Former (InstructBLIP-style), batched over object pairs.

Reference: a 2-layer ``InstructBlipQFormerModel`` with queries = 1 cls
token + 32 relation queries, per-pair text instruction, cross-attention to
image patches restricted by the pair's OR-mask
(relation_transformer_head_v4.py:78-98, 144-186).

Weight-slot compatible with HF ``InstructBlipQFormerModel`` — verified by
a golden test (tests/test_weight_convert.py::TestQFormerConvert runs the
same weights through both and compares outputs; converter:
relation/weight_convert.py):
  * self-attention runs over [queries ; instruction tokens];
  * cross-attention and a *separate* query FFN apply only to the query
    positions (BLIP-2's ``intermediate_query``/``output_query`` split);
  * text embeddings are word-embedding + position; the embedding
    LayerNorm applies to the concatenated [queries ; text] (HF semantics).

TPU-first batching: ALL pairs are processed as one [n_pairs, ...] batch —
the reference's inference already batches all N² ≤ 900 pairs at once
(:179-186); training subsampling (32 pairs @ 3:1 neg:pos) is a static
gather before this module.  Invalid (padding) pairs are masked, not
skipped: static shapes everywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openpsg_tpu.ops.pallas.flash_cross_attn import (
    flash_shared_kv_cross_attn,
    shared_kv_cross_attn_reference,
)


def _guard_empty_mask(mask):
    """Rows with an all-False mask attend everywhere instead.

    For a fully-masked row the flash kernel returns zeros (normalizer
    stays 0) while the XLA reference returns the uniform-softmax mean of
    V — a TPU-inference vs train/CPU divergence.  Guarding HERE (not only
    in RelationQFormer) means the two implementations can never be called
    with semantics-diverging inputs (round-2 advisor finding).  Such rows
    are padding pairs whose outputs are discarded downstream."""
    return jnp.where(jnp.any(mask, axis=-1)[:, None], mask, True)


@jax.custom_vjp
def _shared_kv_attention(q, k, v, mask):
    """q [B, H, Lq, hd]; k/v [H, P, hd]; mask [B, P] → [B, H, Lq, hd].

    Primal: flash Pallas kernel on TPU (scores stay in VMEM), plain XLA
    on CPU.  Autodiff routes through the plain path (training quality
    over training speed; the hot path is inference over all 1024 pairs)."""
    mask = _guard_empty_mask(mask)
    if jax.default_backend() == "cpu":
        return shared_kv_cross_attn_reference(q, k, v, mask)
    return flash_shared_kv_cross_attn(q, k, v, mask)


def _skv_fwd(q, k, v, mask):
    mask = _guard_empty_mask(mask)
    return shared_kv_cross_attn_reference(q, k, v, mask), (q, k, v, mask)


def _skv_bwd(res, ct):
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda a, b, c: shared_kv_cross_attn_reference(a, b, c, mask), q, k, v
    )
    dq, dk, dv = vjp(ct)
    return dq, dk, dv, np.zeros(mask.shape, dtype=jax.dtypes.float0)


_shared_kv_attention.defvjp(_skv_fwd, _skv_bwd)


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    num_layers: int = 2           # qformer_layer_num
    num_heads: int = 12
    intermediate: int = 3072
    encoder_hidden_size: int = 256
    num_relation_queries: int = 32
    vocab_size: int = 1024        # prompt tokenizer vocab (closed set)
    max_text_len: int = 16
    dtype: Any = jnp.float32

    @staticmethod
    def tiny_test() -> "QFormerConfig":
        return QFormerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate=64,
            encoder_hidden_size=16, num_relation_queries=4, vocab_size=64,
            max_text_len=8,
        )


class _MHA(nn.Module):
    """Plain multi-head attention with additive-free boolean masking."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask: Optional[jnp.ndarray] = None):
        """q_in: [B, Lq, D]; kv_in: [B, Lk, Dk]; mask: [B, Lq, Lk] bool."""
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(q_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_in)
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        if mask is not None:
            attn = jnp.where(mask[:, None], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="o")(out)


class _SharedKVCrossAttention(nn.Module):
    """Cross-attention where ALL batch rows attend to the SAME key/value
    sequence, differing only in their boolean mask.

    The image patches are identical for every object pair — only the pair
    OR-mask changes — so K/V projections are computed once ([P, D]) instead
    of per pair ([NP, P, D], the naive broadcast the reference's HF module
    implies).  For NP=1024 pairs this removes a 1024x duplication of the
    K/V matmuls and a ~100 MB intermediate."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_shared, mask):
        """q_in: [B, Lq, D]; kv_shared: [P, Dk]; mask: [B, P] bool."""
        hd = self.dim // self.num_heads
        B, Lq, _ = q_in.shape
        P = kv_shared.shape[0]
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(q_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_shared)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_shared)
        q = q.reshape(B, Lq, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(P, self.num_heads, hd).transpose(1, 0, 2)
        v = v.reshape(P, self.num_heads, hd).transpose(1, 0, 2)
        out = _shared_kv_attention(q, k, v, mask)       # [B, H, Lq, hd]
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="o")(out)


class RelationQFormer(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(
        self,
        query_embeds: jnp.ndarray,    # [B, Q, D] (cls + relation queries)
        text_ids: jnp.ndarray,        # [B, T] int32
        text_mask: jnp.ndarray,       # [B, T] bool
        encoder_hidden: jnp.ndarray,  # [P, De] image patches (SHARED by all pairs)
        encoder_mask: jnp.ndarray,    # [B, P] bool — the pair OR-mask
    ) -> jnp.ndarray:                 # [B, Q, D] query outputs
        c = self.cfg
        B, Qn, D = query_embeds.shape
        T = text_ids.shape[1]
        assert encoder_hidden.ndim == 2, "patches are shared across pairs"

        tok = nn.Embed(c.vocab_size, D, dtype=c.dtype, name="word_embed")(text_ids)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (c.max_text_len, D)
        )
        tok = tok + pos[None, :T].astype(c.dtype)

        x = jnp.concatenate([query_embeds.astype(c.dtype), tok], axis=1)  # [B, Q+T, D]
        # HF InstructBlipQFormerEmbeddings norms the CONCATENATED
        # [queries ; text] sequence (modeling_instructblip.py:819-826)
        x = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="embed_ln")(x)
        seq_mask = jnp.concatenate(
            [jnp.ones((B, Qn), bool), text_mask], axis=1
        )                                                                  # [B, Q+T]
        self_mask = seq_mask[:, None, :] & seq_mask[:, :, None]

        for i in range(c.num_layers):
            # self-attention over queries+text
            h = _MHA(D, c.num_heads, dtype=c.dtype, name=f"self_attn{i}")(
                x, x, self_mask
            )
            x = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name=f"self_ln{i}")(x + h)

            # cross-attention: query positions only, masked to the pair
            # region (empty padding-pair masks are guarded inside
            # _shared_kv_attention)
            xq = x[:, :Qn]
            hq = _SharedKVCrossAttention(
                D, c.num_heads, dtype=c.dtype, name=f"cross_attn{i}"
            )(xq, encoder_hidden.astype(c.dtype), encoder_mask)
            xq = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name=f"cross_ln{i}")(xq + hq)

            # split FFN: query tokens get their own weights (BLIP-2)
            fq = nn.Dense(c.intermediate, dtype=c.dtype, name=f"ffn_q_up{i}")(xq)
            fq = nn.gelu(fq, approximate=False)
            fq = nn.Dense(D, dtype=c.dtype, name=f"ffn_q_down{i}")(fq)
            xq = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name=f"ffn_q_ln{i}")(xq + fq)

            xt = x[:, Qn:]
            ft = nn.Dense(c.intermediate, dtype=c.dtype, name=f"ffn_t_up{i}")(xt)
            ft = nn.gelu(ft, approximate=False)
            ft = nn.Dense(D, dtype=c.dtype, name=f"ffn_t_down{i}")(ft)
            xt = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name=f"ffn_t_ln{i}")(xt + ft)

            x = jnp.concatenate([xq, xt], axis=1)

        return x[:, :Qn]
