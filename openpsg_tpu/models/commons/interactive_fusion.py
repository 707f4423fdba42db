"""InteractiveFusionModule: fuse object (node) and predicate-text (edge)
embeddings into a dense relation score tensor.

Reference: kings_sgg/models/relation_heads/interactive_fusion_module.py
:8-68, mirrored exactly (checkpoint-relevant):

  * without a graph transformer, cls_s/cls_o/cls_r are plain Linears
    from the RAW input sizes (object tower width / semantic text width)
    to ``output_size`` (= the head's cls_qk_size, :137-139 of
    relation_transformer_head.py);
  * with one, fc_node/fc_edge first project both to ``output_size``,
    a 3-layer GraphTransformer message-passes, and cls_* become
    RefMLP blocks (Linear → LayerNorm → Linear — the reference's "act"
    is a LayerNorm, no nonlinearity, :71-80);
  * scoring modes (:37-67):
      'attention'  — pair outer product sub⊗obj → fc_q; relations →
                     fc_k; logits q·kᵀ/√output_size
      'einsum'     — einsum('nsc,noc,rc->nrso'), unscaled
      'einsum_v1'  — same contraction via the explicit pair product
      'einsum_v2'  — einsum_v1 gated by sigmoid(sub·obj) (a parameter-
                     free pair-existence dot product, NOT a learned MLP)

Output: [B, R, N, N] relation scores.  Edges are the unbatched [R, De]
predicate table, as the reference feeds them (semantic_embedding from
forward_texts).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.commons.graph_transformer import GraphTransformer


class RefMLP(nn.Module):
    """The reference fusion MLP: fc1 → LayerNorm (named ``act``!) → fc2
    (interactive_fusion_module.py:71-80)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="act")(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class InteractiveFusionModule(nn.Module):
    pred_type: str = "einsum"         # attention | einsum | einsum_v1 | einsum_v2
    output_size: int = 64             # the head's cls_qk_size
    use_graph_transformer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, nodes: jnp.ndarray, edges: jnp.ndarray):
        """nodes: [B, N, Do] object embeddings; edges: [R, De] predicate
        text embeddings → [B, R, N, N] scores."""
        D = self.output_size
        dt = self.dtype
        if edges.ndim == 3:           # tolerate a legacy batched edge table
            edges = edges[0]

        if self.use_graph_transformer:
            nodes = nn.Dense(D, dtype=dt, name="fc_node")(nodes)
            edges = nn.Dense(D, dtype=dt, name="fc_edge")(edges)
            nodes, edges = GraphTransformer(D, dtype=dt, name="graph")(
                nodes, edges
            )
            sub = RefMLP(2 * D, D, dtype=dt, name="cls_s")(nodes)
            obj = RefMLP(2 * D, D, dtype=dt, name="cls_o")(nodes)
            rel = RefMLP(2 * D, D, dtype=dt, name="cls_r")(edges)
        else:
            sub = nn.Dense(D, dtype=dt, name="cls_s")(nodes)
            obj = nn.Dense(D, dtype=dt, name="cls_o")(nodes)
            rel = nn.Dense(D, dtype=dt, name="cls_r")(edges)

        B, N = sub.shape[:2]
        R = rel.shape[0]
        if self.pred_type == "attention":
            so = jnp.einsum("nsc,noc->nsoc", sub, obj).reshape(B, N * N, D)
            q = RefMLP(2 * D, D, dtype=dt, name="fc_q")(so)
            k = RefMLP(2 * D, D, dtype=dt, name="fc_k")(
                jnp.broadcast_to(rel[None], (B, R, D))
            )
            pred = jnp.einsum(
                "bpc,brc->bpr", q, k, preferred_element_type=jnp.float32
            ) / (D ** 0.5)
            return pred.reshape(B, N, N, R).transpose(0, 3, 1, 2)
        if self.pred_type == "einsum":
            return jnp.einsum(
                "nsc,noc,rc->nrso", sub, obj, rel,
                preferred_element_type=jnp.float32,
            )
        if self.pred_type in ("einsum_v1", "einsum_v2"):
            pair = jnp.einsum("nsc,noc->nsoc", sub, obj)
            scores = jnp.einsum(
                "nsoc,rc->nrso", pair, rel,
                preferred_element_type=jnp.float32,
            )
            if self.pred_type == "einsum_v2":
                gate = jax.nn.sigmoid(
                    jnp.einsum("nsc,noc->nso", sub, obj).astype(jnp.float32)
                )
                scores = scores * gate[:, None]
            return scores
        raise ValueError(self.pred_type)

