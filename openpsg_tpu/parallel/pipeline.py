"""Pipeline parallelism (GPipe schedule) for the LLaMA trunk.

The reference never needed pipeline parallelism: its 7B relation decoder
fits one 80 GB A100 and the distributed story is pure DDP
(/root/reference/tools/train.py:84-88, SURVEY.md §2.11).  On v5e a bf16
7B does NOT fit one 16 GB chip, so openpsg_tpu ships two complementary
model-parallel paths:

  * tensor parallel (``parallel/sharding.py``): Megatron-style column/row
    sharding of every projection — collectives on every matmul;
  * pipeline parallel (this module): the 32-layer stack is cut into
    ``pp`` contiguous STAGES, each chip holds only ``n_layers/pp`` layers,
    and microbatches flow stage→stage over ICI with ``lax.ppermute``.
    One activation transfer per stage boundary per microbatch — far less
    traffic than tp when the batch is small, at the cost of a pipeline
    bubble of ``(pp-1)/(pp-1+n_micro)``.

TPU-native construction: the layer stack already lives as ONE stacked
param tree (leading layer axis, ``nn.scan`` layout — llama.py:347-353),
so a pipeline stage is literally a shard of that axis: leaves are sharded
``P('pp')`` and ``shard_map`` hands each device its local
``[n_layers/pp, ...]`` slice.  Inside, the classic GPipe loop runs as a
``lax.scan`` over ``n_micro + pp - 1`` ticks; at tick ``t`` stage ``s``
processes microbatch ``t - s`` (garbage ticks are computed but never
collected — XLA-friendly static control flow, no host sync).  Backward
is plain autodiff: the transpose of ``ppermute`` is the reverse
permutation, so ``jax.grad`` through this function IS pipelined backprop
(the reverse schedule), which is what makes the dp×pp TRAIN step in
``__graft_entry__.dryrun_multichip`` work.

The two paths COMPOSE: ``make_dp_pp_mesh(pp, dp, tp)`` builds a
("dp", "pp", "tp") mesh where ``shard_map`` is manual over dp/pp only
(``axis_names``) and tp stays GSPMD-auto — ``pp_param_shardings`` lays
the Megatron rules of ``parallel/sharding.py`` onto the feature axes of
the pp-sharded layer leaves, sharding propagation carries them through
each stage's matmuls, and XLA inserts the per-block tp psums INSIDE the
pipeline ticks.  dp×pp×tp over one mesh: 3D parallelism with zero
changes to the model code.

Scope: the no-cache forward (prefill / teacher-forced training — the
shapes that dominate training).  Autoregressive decode keeps the tp
path: a 1-token pipeline tick would be all bubble.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openpsg_tpu.models.llm.llama import (
    LlamaBlock,
    LlamaConfig,
    QDense,
    RMSNorm,
)
from flax import linen as nn


def make_dp_pp_mesh(
    pp: int, dp: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    """Mesh over ("dp", "pp") — or ("dp", "pp", "tp") when ``tp > 1``
    (tensor parallelism INSIDE each pipeline stage; tp innermost so its
    per-matmul collectives ride the fastest ICI links).  Defaults: all
    remaining devices on dp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (pp * tp) == 0, (n, pp, tp)
        dp = n // (pp * tp)
    assert dp * pp * tp == n, f"dp({dp}) * pp({pp}) * tp({tp}) != devices({n})"
    if tp == 1:
        return Mesh(np.asarray(devices).reshape(dp, pp), ("dp", "pp"))
    return Mesh(np.asarray(devices).reshape(dp, pp, tp), ("dp", "pp", "tp"))


def pp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding tree for ``LlamaWithEmbeddings`` params under dp×pp(×tp):
    stacked layer leaves split on their leading (layer) axis over ``pp``;
    when the mesh carries a ``tp`` axis the Megatron rules of
    ``parallel/sharding.py`` compose on the trailing feature axes (the
    rules are rank-aware, so they target in/out dims of the stacked
    ``[L, in, out]`` leaves, never the layer axis); everything else
    (embeddings, final norm, lm_head) follows the tp rules alone —
    replicated on a plain dp×pp mesh."""
    from openpsg_tpu.parallel.sharding import param_sharding_rules

    has_tp = "tp" in mesh.axis_names and mesh.shape["tp"] > 1

    def plan(path, leaf):
        on_layers = any(getattr(k, "key", None) == "layers" for k in path)
        axes = [None] * leaf.ndim
        if has_tp:
            spec = param_sharding_rules(path, leaf)
            # divisibility degrade, as plan_shardings does
            if all(
                ax is None
                or (dim < leaf.ndim and leaf.shape[dim] % mesh.shape[ax] == 0)
                for dim, ax in enumerate(spec)
            ):
                axes = list(spec) + [None] * (leaf.ndim - len(spec))
        if on_layers:
            assert axes[0] is None, (path, axes)  # layer axis is pp-only
            axes[0] = "pp"
        return NamedSharding(mesh, P(*axes))

    return jax.tree_util.tree_map_with_path(plan, params)


def _lm_head(cfg: LlamaConfig):
    # mirrors llama._dense but unnamed (top-level .apply forbids names)
    if cfg.quant:
        return QDense(cfg.vocab_size, dtype=cfg.dtype, act_int8=cfg.act_int8)
    return nn.Dense(cfg.vocab_size, use_bias=False, dtype=cfg.dtype)


def pipelined_llama_logits(
    model,
    params: Any,
    input_embeds: jnp.ndarray,      # [B, L, D]
    attention_mask: jnp.ndarray,    # [B, L] bool
    positions: jnp.ndarray,         # [B, L] int32
    mesh: Mesh,
    n_micro: int,
    *,
    last_logit_only: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """No-cache forward of ``LlamaWithEmbeddings`` over a ("dp", "pp")
    mesh, numerically equal to
    ``model.apply(params, input_embeds=..., attention_mask=...,
    positions=...)[0]`` (tests pin it).

    The batch splits into ``n_micro`` microbatches (B % n_micro == 0) on
    the GPipe schedule; each microbatch additionally splits over ``dp``.
    ``remat=True`` checkpoints each (stage, microbatch) block so backward
    memory is one microbatch of activations per stage.
    """
    cfg: LlamaConfig = model.cfg
    core = params["params"]["core"]
    n_stages = mesh.shape["pp"]
    assert cfg.n_layers % n_stages == 0, (cfg.n_layers, n_stages)
    B, L, D = input_embeds.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    n_kv, hd = cfg.n_kv_heads, cfg.dim // cfg.n_heads

    # no-cache mask, exactly as Llama.__call__ builds it (llama.py:310-317)
    if cfg.causal:
        mask = positions[:, None, :] <= positions[:, :, None]
    else:
        mask = jnp.ones((B, L, L), bool)
    mask = mask & attention_mask[:, None, :]

    emb_s = input_embeds.reshape(n_micro, mb, L, D)
    pos_s = positions.reshape(n_micro, mb, L)
    mask_s = mask.reshape(n_micro, mb, L, L)

    def run_stage(layers_local, x, pos, msk):
        zero_cache = (
            jnp.zeros((x.shape[0], 0, n_kv, hd), cfg.dtype),
            jnp.zeros((x.shape[0], 0, n_kv, hd), cfg.dtype),
        )
        mask_cache = jnp.zeros((x.shape[0], L, 0), bool)

        def body(carry, lp):
            carry, _ys = LlamaBlock(cfg).apply({"params": lp}, carry, zero_cache)
            return carry, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        (x, _, _, _), _ = lax.scan(
            body, (x.astype(cfg.dtype), pos, mask_cache, msk), layers_local
        )
        return x

    def pipeline(layers_local, emb_s, pos_s, mask_s):
        s = lax.axis_index("pp")
        state = jnp.zeros(emb_s.shape[1:], cfg.dtype)          # [mb_l, L, D]
        outputs = jnp.zeros((n_micro,) + emb_s.shape[1:], cfg.dtype)
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def step(carry, t):
            state, outputs = carry
            mb_in = jnp.clip(t - s, 0, n_micro - 1)
            x0 = lax.dynamic_index_in_dim(
                emb_s, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            x_in = jnp.where(s == 0, x0.astype(cfg.dtype), state)
            pos = lax.dynamic_index_in_dim(pos_s, mb_in, 0, keepdims=False)
            msk = lax.dynamic_index_in_dim(mask_s, mb_in, 0, keepdims=False)
            y = run_stage(layers_local, x_in, pos, msk)
            # last stage collects microbatch t-(pp-1) when it is real
            slot = t - (n_stages - 1)
            cl = jnp.clip(slot, 0, n_micro - 1)
            take = (s == n_stages - 1) & (slot >= 0)
            cur = lax.dynamic_index_in_dim(outputs, cl, 0, keepdims=False)
            outputs = lax.dynamic_update_index_in_dim(
                outputs, jnp.where(take, y, cur), cl, 0
            )
            if perm:
                state = lax.ppermute(y, "pp", perm)  # stage 0 receives zeros
            return (state, outputs), None

        (_, outputs), _ = lax.scan(
            step, (state, outputs), jnp.arange(n_micro + n_stages - 1)
        )
        # outputs live on the last stage only; psum replicates them
        return lax.psum(
            jnp.where(s == n_stages - 1, outputs, jnp.zeros_like(outputs)),
            "pp",
        )

    # manual only over dp/pp; a "tp" mesh axis (make_dp_pp_mesh(tp>1))
    # stays GSPMD-auto — the Megatron shardings on the layer leaves'
    # feature axes (pp_param_shardings) propagate through each stage's
    # matmuls and XLA inserts the per-block tp psums inside the pipeline
    hidden = jax.shard_map(
        pipeline,
        mesh=mesh,
        in_specs=(P("pp"), P(None, "dp"), P(None, "dp"), P(None, "dp")),
        out_specs=P(None, "dp"),
        axis_names=frozenset({"dp", "pp"}),
        check_vma=False,
    )(core["layers"], emb_s, pos_s, mask_s)
    hidden = hidden.reshape(B, L, D)

    # final norm + lm_head are tiny — replicated, outside the pipeline
    x = RMSNorm(cfg.dim, cfg.norm_eps, cfg.dtype).apply(
        {"params": core["final_norm"]}, hidden
    )
    if last_logit_only:
        x = x[:, -1:]
    logits = _lm_head(cfg).apply({"params": core["lm_head"]}, x)
    return logits.astype(jnp.float32)
