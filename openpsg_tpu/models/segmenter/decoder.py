"""MaskDINO-style query decoder with open-vocabulary classification.

Two-stage: encoder memory proposes the top-Q query locations/boxes; the
decoder refines them over ``num_layers`` rounds of self-attention +
deformable cross-attention.  Classification is a dot product with language
class embeddings (open-vocab, as in OpenSeeD — the reference precomputes
them once at init, openseed_relation_v2.py:59-60); masks are a dot product
between decoded query embeddings and the stride-4 mask features.

TPU notes: Q is static; top-k keeps static shapes; the per-layer stack
(self-attn → deformable cross-attn → FFN → box refinement) runs under
``nn.scan`` so compile cost is one block, not ``num_layers`` copies; box
refinement uses inverse-sigmoid deltas; dense attention rides the MXU and
the deformable cross-attention routes through the gather kernel.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.segmenter.deform_layers import (
    FFN,
    MLP,
    MSDeformAttnLayer,
    inverse_sigmoid,
    sine_pos_embed,
)


class SelfAttention(nn.Module):
    dim: int = 256
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        q = k = x + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="mha"
        )(q, inputs_k=k, inputs_v=x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x + attn)


class DecoderLayer(nn.Module):
    """One refinement round; scanned over layers (carry = queries+boxes)."""

    dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    ffn_hidden: int = 2048
    spatial_shapes: Tuple[Tuple[int, int], ...] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        queries, boxes, memory = carry
        qpos = nn.Dense(self.dim, dtype=self.dtype, name="ref_point_head")(
            sine_pos_embed(boxes[:, :2], self.dim).astype(self.dtype)
        )
        queries = SelfAttention(
            self.dim, self.num_heads, dtype=self.dtype, name="self_attn"
        )(queries[None], qpos[None])[0]
        cross = MSDeformAttnLayer(
            self.dim, self.num_heads, self.num_levels, self.num_points,
            dtype=self.dtype, name="cross_attn",
        )(queries + qpos, memory, self.spatial_shapes, boxes)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm_cross")(queries + cross)
        queries = FFN(self.dim, self.ffn_hidden, dtype=self.dtype, name="ffn")(queries)
        delta = MLP(self.dim, 4, layers=3, dtype=self.dtype, name="box_head")(queries)
        boxes = jax.nn.sigmoid(inverse_sigmoid(boxes) + delta.astype(jnp.float32))
        return (queries, boxes, memory), None


class QueryDecoder(nn.Module):
    dim: int = 256
    num_queries: int = 100
    num_layers: int = 9
    num_heads: int = 8
    num_points: int = 4
    ffn_hidden: int = 2048
    mask_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,        # [Lv, C] encoder output (strides 8/16/32)
        spatial_shapes,             # static [(h, w)] * 3
        mask_features: jnp.ndarray, # [H4, W4, mask_dim]
        class_embeds: jnp.ndarray,  # [num_classes, C] language embeddings (unit-norm)
    ):
        """Returns dict with cls_logits [Q, num_classes], masks [Q, H4, W4],
        boxes [Q, 4] (cxcywh, normalized), query_embed [Q, C]."""
        C = self.dim

        # ---- two-stage proposals from encoder memory ----
        enc_out = nn.LayerNorm(dtype=self.dtype, name="enc_norm")(
            nn.Dense(C, dtype=self.dtype, name="enc_proj")(memory)
        )
        enc_cls = self._class_logits(enc_out, class_embeds, name="enc")
        enc_score = jnp.max(enc_cls.astype(jnp.float32), axis=-1)     # [Lv]
        _, top_idx = jax.lax.top_k(enc_score, self.num_queries)       # static Q

        from openpsg_tpu.models.segmenter.deform_layers import make_reference_points

        centers = jnp.asarray(make_reference_points(spatial_shapes))  # [Lv, 2]
        base_wh = jnp.concatenate(
            [
                jnp.full((h * w, 2), 0.1, jnp.float32) * (2.0 ** lvl)
                for lvl, (h, w) in enumerate(spatial_shapes)
            ]
        )
        base_boxes = jnp.concatenate([centers, base_wh], -1)          # [Lv, 4]
        enc_delta = MLP(C, 4, layers=3, dtype=self.dtype, name="enc_box_head")(enc_out)
        proposal_boxes = jax.nn.sigmoid(
            inverse_sigmoid(base_boxes) + enc_delta.astype(jnp.float32)
        )

        queries = jax.lax.stop_gradient(enc_out[top_idx])             # [Q, C]
        boxes = jax.lax.stop_gradient(proposal_boxes[top_idx])        # [Q, 4]

        # ---- iterative refinement, scanned over layers ----
        layer = nn.scan(
            DecoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
        )(
            self.dim, self.num_heads, len(spatial_shapes), self.num_points,
            self.ffn_hidden, tuple(spatial_shapes), dtype=self.dtype,
            name="layers",
        )
        (queries, boxes, _), _ = layer((queries, boxes, memory), None)

        decoded = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")(queries)
        cls_logits = self._class_logits(decoded, class_embeds, name="final")
        mask_embed = MLP(C, self.mask_dim, layers=3, dtype=self.dtype, name="mask_head")(decoded)
        masks = jnp.einsum(
            "qc,hwc->qhw", mask_embed, mask_features,
            preferred_element_type=jnp.float32,
        )
        return {
            "cls_logits": cls_logits.astype(jnp.float32),
            "masks": masks,
            "boxes": boxes,
            "query_embed": decoded,
        }

    def _class_logits(self, x, class_embeds, name: str):
        """Open-vocab classification: cosine(query, class text embed) * τ."""
        proj = nn.Dense(class_embeds.shape[-1], dtype=self.dtype, name=f"{name}_cls_proj")(x)
        proj = proj / (jnp.linalg.norm(proj.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6)
        logit_scale = self.param(
            f"{name}_logit_scale", nn.initializers.constant(2.659), ()
        )
        return (
            proj.astype(jnp.float32) @ class_embeds.astype(jnp.float32).T
        ) * jnp.exp(logit_scale)
