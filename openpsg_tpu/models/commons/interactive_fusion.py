"""InteractiveFusionModule: fuse object (node) and predicate-text (edge)
embeddings into a dense relation score tensor.

Reference: kings_sgg/models/relation_heads/interactive_fusion_module.py
:28-68 — optional GraphTransformer message passing, then subject/object/
relation projections and one of four scoring modes:

  * 'attention'  — per-relation attention logits q·k over pairs
  * 'einsum'     — sub ⋅ rel ⋅ obj trilinear contraction
  * 'einsum_v1'  — (sub*obj) pair product contracted with rel
  * 'einsum_v2'  — einsum_v1 gated by a sigmoid pair-existence term

Output: [B, R, N, N] relation scores.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpsg_tpu.models.commons.graph_transformer import GraphTransformer


class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"fc{self.layers - 1}")(x)


class InteractiveFusionModule(nn.Module):
    dim: int = 256
    pred_type: str = "einsum"         # attention | einsum | einsum_v1 | einsum_v2
    use_graph_transformer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, nodes: jnp.ndarray, edges: jnp.ndarray):
        """nodes: [B, N, D] object embeddings; edges: [B, R, D] predicate
        text embeddings → [B, R, N, N] scores."""
        if self.use_graph_transformer:
            nodes, edges = GraphTransformer(
                self.dim, dtype=self.dtype, name="graph"
            )(nodes, edges)

        sub = MLP(self.dim, self.dim, dtype=self.dtype, name="sub_proj")(nodes)
        obj = MLP(self.dim, self.dim, dtype=self.dtype, name="obj_proj")(nodes)
        rel = MLP(self.dim, self.dim, dtype=self.dtype, name="rel_proj")(edges)

        scale = self.dim ** -0.5
        if self.pred_type == "attention":
            q = jnp.einsum("brd,bnd->brn", rel, sub) * scale       # rel↔sub
            k = jnp.einsum("brd,bmd->brm", rel, obj) * scale       # rel↔obj
            return q[..., :, None] + k[..., None, :]
        if self.pred_type == "einsum":
            return jnp.einsum(
                "bnd,brd,bmd->brnm", sub, rel, obj,
                preferred_element_type=jnp.float32,
            ) * scale
        if self.pred_type in ("einsum_v1", "einsum_v2"):
            pair = sub[:, :, None, :] * obj[:, None, :, :]          # [B,N,N,D]
            scores = jnp.einsum(
                "bnmd,brd->brnm", pair, rel,
                preferred_element_type=jnp.float32,
            ) * scale
            if self.pred_type == "einsum_v2":
                exist = MLP(self.dim, 1, dtype=self.dtype, name="exist")(pair)
                scores = scores * jax.nn.sigmoid(
                    exist[..., 0].astype(jnp.float32)
                )[:, None]
            return scores
        raise ValueError(self.pred_type)
