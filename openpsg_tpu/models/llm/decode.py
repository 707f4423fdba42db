"""Batched greedy decoding with a shared static KV cache.

The reference decodes relations with a *python loop* of ≤20 independent
``language_model.generate(max_new_tokens=16)`` calls per image
(relation_transformer_head_v4.py:293-312) — no batching, no cache sharing
(SURVEY.md §3.5 hot-loop #3).  Here all selected pairs decode together:

  * one prefill over the whole [n_pairs, prefix_len] batch (MXU-friendly);
  * one ``lax.scan`` of ``max_new_tokens`` single-token steps;
  * RoPE positions follow HF semantics ``cumsum(attention_mask) - 1`` so
    arbitrary pad layouts work — including the reference's
    [visual tokens ; left-padded text] prompt whose pads sit mid-sequence;
  * per-sequence EOS early-exit via a ``done`` mask (tokens after EOS are
    emitted as ``pad_id``; compute still runs — static shapes — but the
    whole batch costs 16 steps instead of 20×16 sequential calls).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from openpsg_tpu.models.llm.llama import LlamaWithEmbeddings, init_kv_cache


def greedy_decode(
    model: LlamaWithEmbeddings,
    params,
    prefix_embeds: jnp.ndarray,   # [B, Lp, D] left-padded prompt embeddings
    prefix_mask: jnp.ndarray,     # [B, Lp] bool
    max_new_tokens: int,
    eos_id: int,
    pad_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens [B, max_new_tokens] int32, scores [B, max_new_tokens] f32).

    ``scores`` are greedy-token log-probs (for ranking triplets); positions
    after EOS hold ``pad_id`` / 0.  The emitted sequence does NOT include
    the EOS token itself (it terminates generation), matching how the
    reference splits generated text on '</s>' (:313-316).
    """
    cfg = model.cfg
    B, Lp, _ = prefix_embeds.shape
    S = Lp + max_new_tokens

    key_mask = jnp.concatenate(
        [prefix_mask, jnp.zeros((B, max_new_tokens), bool)], axis=1
    )                                                           # [B, S]
    # HF position convention: pads don't advance positions
    positions = jnp.cumsum(prefix_mask.astype(jnp.int32), axis=1) - 1
    positions = jnp.maximum(positions, 0)
    n_real = jnp.sum(prefix_mask.astype(jnp.int32), axis=1)     # [B]
    key_positions = jnp.concatenate(
        [positions, jnp.zeros((B, max_new_tokens), jnp.int32)], axis=1
    )
    # prefill WITHOUT a cache (no zero-cache read); the returned packed KV
    # is placed into the full-length cache with one update
    logits, kv = model.apply(
        params,
        input_embeds=prefix_embeds,
        attention_mask=prefix_mask,
        positions=positions,
        last_logit_only=True,
    )
    ck, cv = init_kv_cache(cfg, B, S)
    cache = (
        jax.lax.dynamic_update_slice(ck, kv[0].astype(ck.dtype), (0, 0, 0, 0, 0)),
        jax.lax.dynamic_update_slice(cv, kv[1].astype(cv.dtype), (0, 0, 0, 0, 0)),
    )
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    score = jax.nn.log_softmax(logits[:, -1], axis=-1)[jnp.arange(B), tok]
    done = jnp.zeros((B,), bool)

    def step(carry, t):
        tok, score, done, cache, key_mask, key_positions = carry
        # emit the token chosen at the previous forward (masked once done)
        hit_eos = tok == eos_id
        out_tok = jnp.where(done | hit_eos, pad_id, tok)
        out_score = jnp.where(done | hit_eos, 0.0, score)
        done = done | hit_eos

        slot = Lp + t
        key_mask = key_mask.at[:, slot].set(True)
        pos = (n_real + t)[:, None]                         # [B, 1]
        key_positions = jax.lax.dynamic_update_slice_in_dim(
            key_positions, pos, slot, axis=1
        )
        emb = model.apply(params, tok[:, None], method=lambda m, ids: m.embed(ids))
        logits, cache = model.apply(
            params,
            input_embeds=emb,
            attention_mask=key_mask,
            positions=pos,
            cache=cache,
            cache_index=slot,
            key_positions=key_positions,
        )
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        nscore = jax.nn.log_softmax(logits[:, 0], axis=-1)[jnp.arange(B), nxt]
        return (nxt, nscore, done, cache, key_mask, key_positions), (out_tok, out_score)

    (_, _, _, _, _, _), (toks, scores) = jax.lax.scan(
        step,
        (tok, score, done, cache, key_mask, key_positions),
        jnp.arange(max_new_tokens, dtype=jnp.int32),
    )
    return toks.T, scores.T
