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
  * EOS early-exit: a ``lax.while_loop`` stops the whole batch as soon
    as every sequence has emitted EOS (predicates are 1-4 tokens, so real
    decode runs ~5 of the 16 worst-case steps); tokens after a sequence's
    EOS are emitted as ``pad_id``.  Outputs are bit-identical to the
    fixed-16-step loop — only the step count is data-dependent.
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
    early_exit: bool = True,
    return_trips: bool = False,
    trip_budget=None,
) -> Tuple[jnp.ndarray, ...]:
    """→ (tokens [B, max_new_tokens] int32, scores [B, max_new_tokens] f32).

    ``scores`` are greedy-token log-probs (for ranking triplets); positions
    after EOS hold ``pad_id`` / 0.  The emitted sequence does NOT include
    the EOS token itself (it terminates generation), matching how the
    reference splits generated text on '</s>' (:313-316).

    ``return_trips`` appends the ACTUAL while_loop trip count (int32
    scalar) — the realized decode cost.  Counting non-pad output tokens
    UNDERCOUNTS it whenever a not-yet-done sequence's argmax is
    ``pad_id`` itself (those steps emit pads but still run): measured on
    the r4 knob bench, a straggler pair emitting id-0 tokens made a
    ~12-trip decode read as 4 "realized steps", which mis-attributed
    ~80 ms to a phantom act_int8×pruning interaction.

    ``trip_budget``: optional RUNTIME int32 scalar bounding the number of
    decode trips (a tail-latency SLO knob: caps the worst case without
    recompiling — the reference's only lever is the static
    ``max_new_tokens=16`` of generate(), relation_transformer_head_v4.py:
    298).  A traced scalar joins the while_loop cond, so ONE compiled
    program serves every budget 1..max_new_tokens; sequences cut by the
    budget keep their tokens-so-far (pads after).  ``None`` = the static
    bound only.  bench.py uses this to measure the realistic 4-trip
    decode regime on the SAME executable that serves deployment.
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
    toks0 = jnp.full((B, max_new_tokens), pad_id, jnp.int32)
    scores0 = jnp.zeros((B, max_new_tokens), jnp.float32)

    def body(carry):
        t, tok, score, done, cache, key_mask, key_positions, toks, scores = carry
        # emit the token chosen at the previous forward (masked once done)
        hit_eos = tok == eos_id
        out_tok = jnp.where(done | hit_eos, pad_id, tok)
        out_score = jnp.where(done | hit_eos, 0.0, score)
        done = done | hit_eos
        toks = jax.lax.dynamic_update_slice(toks, out_tok[:, None], (0, t))
        scores = jax.lax.dynamic_update_slice(scores, out_score[:, None], (0, t))

        slot = Lp + t
        key_mask = jax.lax.dynamic_update_slice(
            key_mask, jnp.ones((B, 1), bool), (0, slot)
        )
        pos = (n_real + t)[:, None]                         # [B, 1]
        key_positions = jax.lax.dynamic_update_slice(
            key_positions, pos, (0, slot)
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
        return (t + 1, nxt, nscore, done, cache, key_mask, key_positions,
                toks, scores)

    def cond(carry):
        t, tok, _, done = carry[:4]
        # stop as soon as every sequence has emitted EOS: predicates are
        # 1-4 tokens, so real decode runs ~5 of the 16 worst-case steps.
        # Remaining buffer slots keep pad_id/0 — EXACTLY what the fixed
        # 16-step loop would emit (post-EOS steps emit pads).
        alive = ~jnp.all(done | (tok == eos_id)) if early_exit else True
        within = (
            (t < max_new_tokens) if trip_budget is None
            else (t < jnp.minimum(max_new_tokens, trip_budget))
        )
        return within & alive

    carry = (jnp.int32(0), tok, score, done, cache, key_mask, key_positions,
             toks0, scores0)
    carry = jax.lax.while_loop(cond, body, carry)
    if return_trips:
        return carry[7], carry[8], carry[0]
    return carry[7], carry[8]
