"""MaskDINO-style query decoder with open-vocabulary classification.

Two-stage: encoder memory proposes the top-Q query locations/boxes; the
decoder refines them over ``num_layers`` rounds of self-attention +
deformable cross-attention.  Classification is language-space: queries are
projected through a shared ``class_embed`` matrix [C, proj_dim] and scored
by cosine similarity against class-name text embeddings × exp(logit_scale)
(OpenSeeD precomputes the text matrix once at init,
openseed_relation_v2.py:59-60); masks are a dot product between decoded
query embeddings and the stride-4 mask features.

Weight-layout parity with the published OpenSeeD checkpoint
(``sem_seg_head.predictor.*``; see segmenter/weight_convert.py for the
key map): shared class_embed, single logit_scale, 2-layer ref_point_head
over the 4-D box sine embedding, per-layer 3-layer bbox MLPs, shared
mask_embed MLP + decoder_norm, enc_output(+norm) two-stage projection.

TPU notes: Q is static; top-k keeps static shapes; the per-layer stack
(self-attn → deformable cross-attn → FFN → box refinement) runs under
``nn.scan`` so compile cost is one block, not ``num_layers`` copies; box
refinement uses inverse-sigmoid deltas; dense attention rides the MXU and
the deformable cross-attention routes through the gather kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openpsg_tpu.models.segmenter.deform_layers import (
    FFN,
    MLP,
    MSDeformAttnLayer,
    box_sine_embed,
    inverse_sigmoid,
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
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x + attn)


class DecoderLayer(nn.Module):
    """One refinement round; scanned over layers (carry = queries+boxes).

    The ref_point_head is a single module in the torch checkpoint; under
    nn.scan it is stacked per layer and the converter tiles the shared
    weights across the layer axis."""

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
        # query position from the full 4-D box (MaskDINO
        # gen_sineembed_for_position → 2-layer MLP ref_point_head)
        qpos = MLP(self.dim, self.dim, layers=2, dtype=self.dtype,
                   name="ref_point_head")(
            box_sine_embed(boxes, self.dim).astype(self.dtype)
        )
        queries = SelfAttention(
            self.dim, self.num_heads, dtype=self.dtype, name="self_attn"
        )(queries[None], qpos[None])[0]
        cross = MSDeformAttnLayer(
            self.dim, self.num_heads, self.num_levels, self.num_points,
            dtype=self.dtype, name="cross_attn",
        )(queries + qpos, memory, self.spatial_shapes, boxes)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_cross")(queries + cross)
        queries = FFN(self.dim, self.ffn_hidden, dtype=self.dtype, name="ffn")(queries)
        delta = MLP(self.dim, 4, layers=3, dtype=self.dtype, name="box_head")(queries)
        boxes = jax.nn.sigmoid(inverse_sigmoid(boxes) + delta.astype(jnp.float32))
        return (queries, boxes, memory), None


class QueryDecoder(nn.Module):
    dim: int = 256
    num_queries: int = 300
    num_layers: int = 9
    num_heads: int = 8
    num_points: int = 4
    ffn_hidden: int = 2048
    mask_dim: int = 256
    proj_dim: int = 512     # language-space width (OpenSeeD DIM_PROJ)
    # proposal-anchor exponent per level: wh = 0.05 * 2**exp.  MaskDINO
    # assigns the exponent by ITS level ordering (gen_encoder_output_
    # proposals), so a converted checkpoint needs the exponents of the
    # ORIGINAL order (SegmenterConfig.ckpt_level_strides derives these);
    # None → the internal level index (scratch training).
    level_wh_exp: Optional[Tuple[int, ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,        # [Lv, C] encoder output (level-major)
        spatial_shapes,             # static [(h, w)] per level
        mask_features: jnp.ndarray, # [H4, W4, mask_dim]
        class_embeds: jnp.ndarray,  # [num_classes, proj_dim] language embeddings (unit-norm)
    ):
        """Returns dict with cls_logits [Q, num_classes], masks [Q, H4, W4],
        boxes [Q, 4] (cxcywh, normalized), query_embed [Q, C]."""
        C = self.dim

        # shared language projection + temperature (OpenSeeD: predictor
        # class_embed parameter + lang_encoder.logit_scale)
        class_embed = self.param(
            "class_embed", nn.initializers.lecun_normal(),
            (C, class_embeds.shape[-1]),
        )
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.659), ()  # ln(1/0.07)
        )

        def class_logits(x):
            proj = x.astype(jnp.float32) @ class_embed.astype(jnp.float32)
            proj = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-6)
            return (proj @ class_embeds.astype(jnp.float32).T) * jnp.exp(logit_scale)

        # ---- two-stage proposals from encoder memory ----
        # (Deformable-DETR gen_encoder_output_proposals, reused by MaskDINO:
        # border positions whose proposal coords fall outside (0.01, 0.99)
        # are invalid — their memory is ZEROED before the enc projection and
        # their proposal logits filled +inf; all rows still compete in topk,
        # exactly as the torch code behaves.)
        from openpsg_tpu.models.segmenter.deform_layers import make_reference_points

        centers_np = make_reference_points(spatial_shapes)            # [Lv, 2]
        wh_exp = self.level_wh_exp or tuple(range(len(spatial_shapes)))
        base_wh_np = np.concatenate(
            [
                np.full((h * w, 2), 0.05, np.float32) * (2.0 ** wh_exp[lvl])
                for lvl, (h, w) in enumerate(spatial_shapes)
            ]
        )
        base_np = np.concatenate([centers_np, base_wh_np], -1)        # [Lv, 4]
        valid_np = ((base_np > 0.01) & (base_np < 0.99)).all(-1)      # static
        valid = jnp.asarray(valid_np)
        base_boxes = jnp.asarray(base_np)

        enc_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="enc_norm")(
            nn.Dense(C, dtype=self.dtype, name="enc_proj")(
                jnp.where(valid[:, None], memory, 0)
            )
        )
        enc_cls = class_logits(enc_out)
        enc_score = jnp.max(enc_cls, axis=-1)                          # [Lv]
        _, top_idx = jax.lax.top_k(enc_score, self.num_queries)       # static Q

        enc_delta = MLP(C, 4, layers=3, dtype=self.dtype, name="enc_box_head")(enc_out)
        proposal_logits = jnp.where(
            valid[:, None], inverse_sigmoid(base_boxes), jnp.inf
        )
        proposal_boxes = jax.nn.sigmoid(
            proposal_logits + enc_delta.astype(jnp.float32)
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

        decoded = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")(queries)
        cls_logits = class_logits(decoded)
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
