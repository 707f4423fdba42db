"""GraphTransformer: edge↔node message passing via transformer decoders.

Reference: kings_sgg/models/commons/graph_transformer.py — two
``nn.TransformerDecoder`` stacks (3 layers each, torch defaults: 8 heads,
dim_feedforward 2048, ReLU, post-LN, eps 1e-5).  ``edge2node_decoder``
updates node features attending to edges; ``node2edge_decoder`` updates
the (batch-repeated) edge features attending to the updated nodes, then
means over batch back to the unbatched [R, D] edge table (:16-22).

The decoder layer mirrors ``nn.TransformerDecoderLayer`` exactly
(checkpoint-relevant): self-attn → add&norm → cross-attn → add&norm →
Linear(D→ffn) ReLU Linear(ffn→D) → add&norm; torch
``MultiheadAttention`` scaling (1/√head_dim).  Layers run under
``nn.scan`` (stacked params); ``convert_graph_transformer`` in
models/commons/weight_convert.py splits torch's packed
``in_proj_weight`` accordingly.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class TorchMHA(nn.Module):
    """``torch.nn.MultiheadAttention`` equivalent (separate q/k/v Dense —
    the converter splits torch's packed in_proj)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        D, H = self.dim, self.num_heads
        hd = D // H
        qp = nn.Dense(D, dtype=self.dtype, name="q")(q)
        kp = nn.Dense(D, dtype=self.dtype, name="k")(k)
        vp = nn.Dense(D, dtype=self.dtype, name="v")(v)
        B, Lq = qp.shape[:2]
        Lk = kp.shape[1]
        qp = qp.reshape(B, Lq, H, hd)
        kp = kp.reshape(B, Lk, H, hd)
        vp = vp.reshape(B, Lk, H, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / (hd ** 0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qp.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(B, Lq, D)
        return nn.Dense(D, dtype=self.dtype, name="out")(out)


class _DecoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        x, mem = carry
        h = TorchMHA(self.dim, self.num_heads, self.dtype, name="self_attn")(
            x, x, x
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x + h)
        h = TorchMHA(self.dim, self.num_heads, self.dtype, name="cross_attn")(
            x, mem, mem
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x + h)
        f = nn.Dense(self.ffn_hidden, dtype=self.dtype, name="ffn_up")(x)
        f = nn.Dense(self.dim, dtype=self.dtype, name="ffn_down")(nn.relu(f))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln3")(x + f)
        return (x, mem), None


class TorchTransformerDecoder(nn.Module):
    """``nn.TransformerDecoder(layer, num_layers)`` (no final norm)."""

    dim: int
    num_heads: int = 8
    num_layers: int = 3
    ffn_hidden: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory):
        layer = nn.scan(
            _DecoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
        )(self.dim, self.num_heads, self.ffn_hidden, self.dtype,
          name="layers")
        (x, _), _ = layer((tgt, memory), None)
        return x


class GraphTransformer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    num_layers: int = 3
    ffn_hidden: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, nodes: jnp.ndarray, edges: jnp.ndarray):
        """nodes: [B, N, D]; edges: [R, D] (unbatched predicate table,
        repeated over batch like the reference's ``.repeat(b, 1, 1)``)
        → (nodes' [B, N, D], edges' [R, D] — batch-meaned, :21-22)."""
        B = nodes.shape[0]
        edges_b = jnp.broadcast_to(edges[None], (B,) + edges.shape)
        nodes = TorchTransformerDecoder(
            self.dim, self.num_heads, self.num_layers, self.ffn_hidden,
            self.dtype, name="edge2node",
        )(nodes, edges_b)
        edges_b = TorchTransformerDecoder(
            self.dim, self.num_heads, self.num_layers, self.ffn_hidden,
            self.dtype, name="node2edge",
        )(edges_b, nodes)
        return nodes, edges_b.mean(axis=0)
