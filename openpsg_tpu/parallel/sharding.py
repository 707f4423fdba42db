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
    # int8 QDense per-output-channel scales must CO-SHARD with their
    # kernel_q: column-parallel layers shard the output axis of both
    # ([L, in, out] kernel_q + [L, out] scale); row-parallel layers shard
    # the INPUT axis of kernel_q, so their [out] scale — applied after the
    # psum — stays replicated (no rule).
    (r".*\bwq\b.*scale", "col"),
    (r".*\bwk\b.*scale", "col"),
    (r".*\bwv\b.*scale", "col"),
    (r".*w_gate.*scale", "col"),
    (r".*w_up.*scale", "col"),
    (r".*lm_head.*scale", "col"),
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


def plan_shardings(params: Any, mesh: Mesh) -> Any:
    """Rule + divisibility resolution WITHOUT allocation: works on real
    arrays or ``jax.ShapeDtypeStruct`` trees (spec-level tests at 7B
    shapes).  Returns a PartitionSpec tree; non-dividing axes degrade to
    replicated."""

    def plan(path, leaf):
        spec = param_sharding_rules(path, leaf)
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= leaf.ndim or leaf.shape[dim] % mesh.shape[axis] != 0:
                return P()
        return spec

    return jax.tree_util.tree_map_with_path(plan, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Apply the planned specs, committing each leaf to its sharding."""
    specs = plan_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs,
    )


def assert_llm_sharded(llm_params: Any, mesh: Mesh, min_sharded: int = 4) -> int:
    """Guard against silent replication: with tp>1 every leaf whose RULE
    plans a dividing 'tp' axis must carry it in its COMMITTED sharding.

    The expected count is computed from the rules + shapes (not a
    hardcoded floor), so the guard tightens automatically with depth and
    quantization; ``min_sharded`` additionally sanity-checks that the
    rules found enough shardable leaves at all (shapes too small for the
    configured tp would otherwise quietly replicate the whole LLM).
    Returns the count of tp-sharded leaves."""
    if mesh.shape.get("tp", 1) <= 1:
        return 0

    def _has_tp(spec) -> bool:
        return spec is not None and any(
            a == "tp" for a in spec if a is not None
        )

    expected = sum(
        _has_tp(s)
        for s in jax.tree_util.tree_leaves(
            plan_shardings(llm_params, mesh),
            is_leaf=lambda x: isinstance(x, P),
        )
    )
    n = 0

    def check(path, leaf):
        nonlocal n
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if _has_tp(spec):
            n += 1

    jax.tree_util.tree_map_with_path(check, llm_params)
    if expected < min_sharded:
        raise AssertionError(
            f"sharding rules planned only {expected} tp leaves "
            f"(need ≥{min_sharded}) — shapes too small for tp="
            f"{mesh.shape['tp']}?"
        )
    if n < expected:
        raise AssertionError(
            f"LLM params not tensor-sharded: {n} leaves carry 'tp' but the "
            f"rules plan {expected} at these shapes — params were committed "
            "without shard_params?"
        )
    return n


def pair_sharded_constraint(mesh: Mesh, num_pairs: int, axis: str = "dp"):
    """Sequence-parallel analogue for the relation stage (SURVEY §5: "the
    TPU analogue of sequence parallelism here is sharding the pair axis
    across chips").

    Returns a trace-time constraint ``f(x) -> x`` that pins a pair-major
    array's LEADING axis onto the mesh ``axis`` (trailing dims replicate).
    Applied to the relation head's pair-major inputs *and* outputs, GSPMD
    runs the pair Q-Former with ``num_pairs / mesh.shape[axis]`` pairs per
    chip while the tiny top-k / decode gathers ride ICI.  Returns ``None``
    when ``num_pairs`` doesn't divide the axis (constraint would be
    rejected at lowering)."""
    n = int(mesh.shape.get(axis, 1))
    if n <= 1 or num_pairs % n != 0:
        return None
    sharding = NamedSharding(mesh, P(axis))

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, sharding)

    return constrain


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch/image) sharding over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
