"""Language (class-name) encoder for open-vocabulary classification.

The reference computes class-name text embeddings once at detector init via
OpenSeeD's CLIP-style ``lang_encoder.get_text_embeddings(thing+stuff)``
(openseed_relation_v2.py:59-60) and treats them as a constant classifier
matrix thereafter.  We mirror that contract:

  * ``TextEncoder`` — a compact byte-level transformer text tower in flax;
    deterministic, trainable, good enough to *learn* open-vocab class
    embeddings from scratch on TPU;
  * ``get_text_embeddings`` — encodes a list of names to a unit-norm
    [num_classes, dim] matrix (run once, host or device);
  * loading a precomputed matrix from ``.npy`` is supported so converted
    CLIP/OpenSeeD embeddings can slot in without the tower.

A full CLIP-BPE tokenizer + weight converter belongs to the weight-porting
workstream; byte-level tokenization keeps this self-contained (zero vocab
assets) and is TPU-friendly (static [N, max_len] batches).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

MAX_NAME_LEN = 32
BYTE_VOCAB = 257  # 256 bytes + padding id 256


def encode_names(names: List[str], max_len: int = MAX_NAME_LEN) -> np.ndarray:
    """Byte-encode class names to a static [N, max_len] int32 batch."""
    out = np.full((len(names), max_len), BYTE_VOCAB - 1, np.int32)
    for i, name in enumerate(names):
        b = name.lower().encode("utf-8")[:max_len]
        out[i, : len(b)] = np.frombuffer(b, np.uint8)
    return out


class TextEncoder(nn.Module):
    dim: int = 256
    depth: int = 4
    num_heads: int = 8
    max_len: int = MAX_NAME_LEN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids: [N, L] int32 → unit-norm [N, dim]."""
        N, L = token_ids.shape
        emb = nn.Embed(BYTE_VOCAB, self.dim, dtype=self.dtype, name="tok_embed")(token_ids)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.01), (self.max_len, self.dim)
        )
        x = emb + pos[None, :L].astype(self.dtype)
        pad_mask = token_ids != (BYTE_VOCAB - 1)                 # [N, L]
        attn_mask = pad_mask[:, None, None, :]                   # [N, 1, 1, L]
        for i in range(self.depth):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype, name=f"attn{i}"
            )(h, inputs_k=h, inputs_v=h, mask=attn_mask)
            x = x + h
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            h = nn.Dense(4 * self.dim, dtype=self.dtype, name=f"mlp1_{i}")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, dtype=self.dtype, name=f"mlp2_{i}")(h)
            x = x + h
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        # masked mean pool
        m = pad_mask[..., None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        pooled = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj")(pooled)
        norm = jnp.linalg.norm(pooled.astype(jnp.float32), axis=-1, keepdims=True)
        return (pooled.astype(jnp.float32) / (norm + 1e-6)).astype(jnp.float32)


def clip_text_tower_config(width: int = 512, layers: int = 12, heads: int = 8,
                           vocab: int = 49408):
    """BertStyleConfig for the OpenSeeD/CLIP language tower (pre-LN,
    quickGELU, causal — the OpenAI CLIP text architecture X-Decoder
    reuses).  Defaults are CLIP ViT-B's text tower."""
    from openpsg_tpu.models.commons.text_encoder import BertStyleConfig

    return BertStyleConfig(
        hidden_size=width, num_layers=layers, num_heads=heads,
        intermediate=4 * width, vocab_size=vocab, max_len=77,
        pre_ln=True, quick_gelu=True, causal=True, ln_eps=1e-5,
    )


def clip_class_embeddings(
    tower_cfg,
    tower_params,
    lang_proj: np.ndarray,
    tokenizer,
    names: List[str],
    templates: List[str] = ("{}",),
) -> np.ndarray:
    """Class names → unit-norm [N, proj_dim] language embeddings, the
    in-repo equivalent of OpenSeeD's
    ``lang_encoder.get_text_embeddings(thing+stuff)``
    (openseed_relation_v2.py:59-60): CLIP-BPE tokenize, run the (converted)
    CLIP text tower, pool the EOT position, project through ``lang_proj``,
    normalize; multiple prompt templates are averaged then renormalized.

    The result is what ``precomputed_path`` / ``PSGv4(precomputed_class_
    embeds=...)`` consume — save with ``np.save``.
    """
    from openpsg_tpu.models.commons.text_encoder import BertStyleEncoder

    enc = BertStyleEncoder(tower_cfg)
    if "pooler" not in tower_params:
        # converted CLIP weights have no BERT pooler; the module always
        # constructs one (unused on this path) — fill with zeros
        D = tower_cfg.hidden_size
        tower_params = dict(tower_params)
        tower_params["pooler"] = {
            "kernel": jnp.zeros((D, D), jnp.float32),
            "bias": jnp.zeros((D,), jnp.float32),
        }
    fwd = jax.jit(lambda p, i: enc.apply({"params": p}, token_ids=i))
    embs = []
    for tmpl in templates:
        ids = np.asarray(tokenizer([tmpl.format(n) for n in names]))
        x = fwd(tower_params, jnp.asarray(ids))          # [N, 77, D]
        eot = jnp.argmax(jnp.asarray(ids), axis=-1)      # EOT = max id (CLIP)
        pooled = x[jnp.arange(x.shape[0]), eot]
        emb = pooled.astype(jnp.float32) @ jnp.asarray(lang_proj, jnp.float32)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-6)
        embs.append(emb)
    out = jnp.mean(jnp.stack(embs), 0)
    out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-6)
    return np.asarray(out)


def get_text_embeddings(
    encoder: TextEncoder,
    params,
    names: List[str],
    precomputed_path: Optional[str] = None,
) -> jnp.ndarray:
    """Unit-norm class embedding matrix [len(names), dim].

    Mirrors the reference's one-time
    ``lang_encoder.get_text_embeddings(thing+stuff)``; if
    ``precomputed_path`` points at an ``.npy`` with matching shape it wins
    (converted CLIP/OpenSeeD embeddings).
    """
    if precomputed_path:
        mat = np.load(precomputed_path)
        assert mat.shape[0] == len(names), (mat.shape, len(names))
        mat = mat / (np.linalg.norm(mat, axis=-1, keepdims=True) + 1e-6)
        return jnp.asarray(mat, jnp.float32)
    tokens = jnp.asarray(encode_names(names))
    return encoder.apply({"params": params}, tokens)
