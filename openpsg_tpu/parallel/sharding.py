"""Parameter / batch sharding policy.

Megatron-style tensor parallelism for the LLM, replication for the small
relation head and segmenter, batch sharding over ``dp`` for data:

  * attention q/k/v and FFN up/gate: shard the *output* feature axis on tp
    (column parallel);
  * attention output and FFN down: shard the *input* feature axis on tp
    (row parallel) — XLA then inserts one psum per block, riding ICI;
  * embeddings / lm_head: shard the vocab axis;
  * everything else: replicated.

Rules are matched on parameter path names, so they apply to any pytree
produced by our flax modules.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, role) — first match wins.  Roles are rank-aware because
# scanned layer stacks carry a leading layer axis ([L, in, out] kernels):
#   col   → shard the LAST axis (output features; column parallel)
#   row   → shard the SECOND-TO-LAST axis (input features; row parallel —
#           XLA inserts one psum per block, riding ICI)
#   vocab → shard axis 0 of the 2-D embedding table
_LLM_RULES: Tuple[Tuple[str, str], ...] = (
    (r".*tok_embed.*embedding", "vocab"),
    (r".*\bwq\b.*kernel", "col"),
    (r".*\bwk\b.*kernel", "col"),
    (r".*\bwv\b.*kernel", "col"),
    (r".*\bwo\b.*kernel", "row"),
    (r".*w_gate.*kernel", "col"),
    (r".*w_up.*kernel", "col"),
    (r".*w_down.*kernel", "row"),
    (r".*lm_head.*kernel", "col"),
)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_sharding_rules(path, leaf) -> P:
    s = _path_str(path)
    nd = leaf.ndim
    for pat, role in _LLM_RULES:
        if re.match(pat, s):
            if role == "vocab":
                return P(*(("tp",) + (None,) * (nd - 1)))
            axes = [None] * nd
            axes[nd - 1 if role == "col" else nd - 2] = "tp"
            return P(*axes)
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Apply the rules, skipping specs whose sharded axis doesn't divide."""

    def assign(path, leaf):
        spec = param_sharding_rules(path, leaf)
        # validate divisibility; degrade to replicated on mismatch
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                return jax.device_put(leaf, NamedSharding(mesh, P()))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(assign, params)


def assert_llm_sharded(llm_params: Any, mesh: Mesh, min_sharded: int = 4) -> int:
    """Guard against silent replication: with tp>1 the core projection
    kernels MUST carry 'tp' in their committed sharding (the divisibility
    fallback in shard_params could otherwise quietly replicate everything
    on small shapes).  Returns the count of tp-sharded leaves; raises if
    fewer than ``min_sharded``."""
    if mesh.shape.get("tp", 1) <= 1:
        return 0
    n = 0

    def check(path, leaf):
        nonlocal n
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is not None and any(a == "tp" for a in spec if a is not None):
            n += 1

    jax.tree_util.tree_map_with_path(check, llm_params)
    if n < min_sharded:
        raise AssertionError(
            f"LLM params not tensor-sharded: only {n} leaves carry 'tp' "
            f"(need ≥{min_sharded}) — shapes too small for tp="
            f"{mesh.shape['tp']}?"
        )
    return n


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch/image) sharding over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
