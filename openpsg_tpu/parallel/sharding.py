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

# (path regex, PartitionSpec) — first match wins. Llama param kernels are
# [in, out] (flax Dense convention).
_LLM_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*tok_embed.*embedding", P("tp", None)),     # vocab axis
    (r".*\bwq\b.*kernel", P(None, "tp")),
    (r".*\bwk\b.*kernel", P(None, "tp")),
    (r".*\bwv\b.*kernel", P(None, "tp")),
    (r".*\bwo\b.*kernel", P("tp", None)),
    (r".*w_gate.*kernel", P(None, "tp")),
    (r".*w_up.*kernel", P(None, "tp")),
    (r".*w_down.*kernel", P("tp", None)),
    (r".*lm_head.*kernel", P(None, "tp")),
)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_sharding_rules(path, leaf) -> P:
    s = _path_str(path)
    for pat, spec in _LLM_RULES:
        if re.match(pat, s):
            # guard: axis must divide; fall back to replication otherwise
            return spec
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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch/image) sharding over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
