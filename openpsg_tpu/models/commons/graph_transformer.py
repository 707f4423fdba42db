"""GraphTransformer: alternating edge↔node cross-attention message passing.

Reference: kings_sgg/models/commons/graph_transformer.py:16-22 — two
stacked transformer decoders, one updating edge features by attending to
nodes, one updating node features by attending to edges.  Used by the v1
head's InteractiveFusionModule when ``use_graph_transformer`` is on.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class _CrossBlock(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, kv):
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attn"
        )(q, inputs_k=q, inputs_v=q)
        q = nn.LayerNorm(dtype=self.dtype, name="ln1")(q + h)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="cross_attn"
        )(q, inputs_k=kv, inputs_v=kv)
        q = nn.LayerNorm(dtype=self.dtype, name="ln2")(q + h)
        f = nn.Dense(4 * self.dim, dtype=self.dtype, name="ffn_up")(q)
        f = nn.Dense(self.dim, dtype=self.dtype, name="ffn_down")(nn.relu(f))
        return nn.LayerNorm(dtype=self.dtype, name="ln3")(q + f)


class GraphTransformer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    num_rounds: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, nodes: jnp.ndarray, edges: jnp.ndarray):
        """nodes: [B, N, D]; edges: [B, E, D] → (nodes', edges')."""
        for r in range(self.num_rounds):
            edges = _CrossBlock(
                self.dim, self.num_heads, self.dtype, name=f"edge_round{r}"
            )(edges, nodes)
            nodes = _CrossBlock(
                self.dim, self.num_heads, self.dtype, name=f"node_round{r}"
            )(nodes, edges)
        return nodes, edges
