"""Logger + parameter table (reference tools/train.py:178-222 parity:
timestamped log file in work_dir, PrettyTable-style parameter listing)."""

from __future__ import annotations

import logging
import os
import time
from typing import Any

import jax
import numpy as np


def setup_logger(work_dir: str, name: str = "openpsg_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    ts = time.strftime("%Y%m%d_%H%M%S")
    fh = logging.FileHandler(os.path.join(work_dir, f"{ts}.log"))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    return logger


def param_table(params: Any, max_rows: int = 200) -> str:
    """Human-readable parameter inventory with counts per top-level group."""
    lines = ["parameter groups:"]
    total = 0
    for group, tree in params.items():
        leaves = jax.tree_util.tree_leaves(tree)
        n = sum(int(np.prod(l.shape)) for l in leaves if hasattr(l, "shape"))
        total += n
        lines.append(f"  {group:>12}: {n:>14,} params, {len(leaves)} tensors")
    lines.append(f"  {'TOTAL':>12}: {total:>14,}")
    return "\n".join(lines)


def honor_platform_env() -> None:
    """Apply an explicit ``JAX_PLATFORMS=cpu`` request via the config API.

    The axon sitecustomize force-prepends its TPU platform to
    ``jax_platforms``, so the environment variable alone cannot select CPU
    (CLAUDE.md gotcha); tools call this right after importing jax."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
