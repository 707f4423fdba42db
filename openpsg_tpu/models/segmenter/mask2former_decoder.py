"""Mask2Former-style masked-attention query decoder.

For the v1/v2/v3 model generations the segmenter is mmdet Mask2Former
(configs/psg/baseline_r50.py:84-109): 100 *learned* queries, 9 decoder
layers cycling over the 3 encoder scales, and cross-attention restricted
to each query's currently-predicted foreground ("masked attention",
arXiv 2112.01527) — unlike the box-guided deformable decoder of the v4
OpenSeeD path (decoder.py).

TPU design: layers run under nn.scan; per-layer inputs carry that layer's
level slice (keys / positions / validity, padded to the largest level)
plus level-resolution mask features for the attention gate.  The gate is
recomputed from the evolving queries each layer (sigmoid>0.5 foreground,
with the paper's all-background fallback).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.segmenter.deform_layers import (
    MLP,
    make_cumsum_points,
    sine_pos_embed,
)


class _MaskedDecoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_hidden: int
    mask_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, level_inputs):
        keys, key_valid, key_pos, mf_lvl = level_inputs  # [P,C],[P],[P,C],[P,Dm]
        Q = queries.shape[0]

        # current mask prediction gates cross-attention.  mmdet computes the
        # gate from post_norm(query) (Mask2FormerHead._forward_head applies
        # transformer_decoder.post_norm before mask_embed); gate_norm is the
        # per-layer copy of that shared norm (the converter broadcasts it).
        gated = nn.LayerNorm(dtype=self.dtype, name="gate_norm")(queries)
        mask_embed = MLP(self.dim, self.mask_dim, layers=3,
                         dtype=self.dtype, name="mask_head")(gated)
        attn_gate = jnp.einsum(
            "qc,pc->qp", mask_embed.astype(jnp.float32),
            mf_lvl.astype(jnp.float32),
        ) > 0.0
        # fallback: a query with empty foreground attends everywhere
        attn_gate = jnp.where(
            jnp.any(attn_gate & key_valid[None], axis=1, keepdims=True),
            attn_gate, True,
        )
        attn_mask = (attn_gate & key_valid[None])[None]     # [1, Q, P]

        qpos = self.param(
            "query_pos", nn.initializers.normal(0.02), (Q, self.dim)
        ).astype(self.dtype)
        q = (queries + qpos)[None]
        kv = (keys + key_pos)[None]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="cross_attn"
        )(q, inputs_k=kv, inputs_v=keys[None], mask=attn_mask[:, None])
        queries = nn.LayerNorm(dtype=self.dtype, name="ln_cross")(queries + h[0])

        # self-attn adds query_pos to q AND k, value stays plain (mmcv
        # MultiheadAttention semantics in DetrTransformerDecoderLayer)
        sq = (queries + qpos)[None]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attn"
        )(sq, inputs_k=sq, inputs_v=queries[None])
        queries = nn.LayerNorm(dtype=self.dtype, name="ln_self")(queries + h[0])

        f = nn.Dense(self.ffn_hidden, dtype=self.dtype, name="ffn_up")(queries)
        f = nn.Dense(self.dim, dtype=self.dtype, name="ffn_down")(nn.relu(f))
        queries = nn.LayerNorm(dtype=self.dtype, name="ln_ffn")(queries + f)
        return queries, None


class Mask2FormerDecoder(nn.Module):
    dim: int = 256
    num_queries: int = 100
    num_layers: int = 9
    num_heads: int = 8
    ffn_hidden: int = 2048
    mask_dim: int = 256
    num_classes: int = 133
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,          # [Lv, C] flattened levels (8/16/32)
        spatial_shapes,               # static [(h, w)] * 3
        mask_features: jnp.ndarray,   # [H4, W4, mask_dim]
    ):
        """→ dict(cls_logits [Q, K+1] (void column last), masks [Q, H4, W4],
        query_embed [Q, C])."""
        C = self.dim

        sizes = [h * w for h, w in spatial_shapes]
        P = max(sizes)
        keys, valids, poss, mfs = [], [], [], []
        start = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            sl = jax.lax.slice_in_dim(memory, start, start + h * w, axis=0)
            pe = sine_pos_embed(
                jnp.asarray(make_cumsum_points([(h, w)])), C
            ).astype(self.dtype)
            lvl_embed = self.param(
                f"level_embed{lvl}", nn.initializers.normal(1.0), (C,)
            ).astype(self.dtype)
            pad = P - h * w
            keys.append(jnp.pad(sl, ((0, pad), (0, 0))))
            poss.append(jnp.pad(pe + lvl_embed[None], ((0, pad), (0, 0))))
            valids.append(jnp.arange(P) < h * w)
            # antialias=False: torch F.interpolate semantics — with the
            # default antialiased kernel this DOWNSCALE diverges from the
            # reference's gate logits (linearity makes resize-then-dot equal
            # dot-then-resize, but only for the same resize kernel)
            mf_lvl = jax.image.resize(
                mask_features, (h, w, mask_features.shape[-1]),
                method="bilinear", antialias=False,
            ).reshape(h * w, -1)
            mfs.append(jnp.pad(mf_lvl, ((0, pad), (0, 0))))
            start += h * w

        # round-robin from the COARSEST level (Mask2Former feeds scales
        # low→high resolution: layer 0 attends stride 32, then 16, then 8 —
        # mmdet Mask2FormerHead.forward level_idx over multi_scale_memorys
        # which are ordered coarse-first); our spatial_shapes are fine-first
        L = len(spatial_shapes)
        order = [L - 1 - (i % L) for i in range(self.num_layers)]
        level_inputs = (
            jnp.stack([keys[i] for i in order]),
            jnp.stack([valids[i] for i in order]),
            jnp.stack([poss[i] for i in order]),
            jnp.stack([mfs[i] for i in order]),
        )

        queries = self.param(
            "query_embed", nn.initializers.normal(0.02),
            (self.num_queries, C),
        ).astype(self.dtype)

        layer = nn.scan(
            _MaskedDecoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
        )(self.dim, self.num_heads, self.ffn_hidden, self.mask_dim,
          dtype=self.dtype, name="layers")
        queries, _ = layer(queries, level_inputs)

        decoded = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")(queries)
        cls_logits = nn.Dense(
            self.num_classes + 1, dtype=self.dtype, name="cls_head"
        )(decoded)
        mask_embed = MLP(self.dim, self.mask_dim, layers=3,
                         dtype=self.dtype, name="final_mask_head")(decoded)
        masks = jnp.einsum(
            "qc,hwc->qhw", mask_embed, mask_features,
            preferred_element_type=jnp.float32,
        )
        return {
            "cls_logits": cls_logits.astype(jnp.float32),
            "masks": masks,
            "query_embed": decoded,
        }
