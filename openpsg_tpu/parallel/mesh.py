"""Device mesh construction.

TPU-native replacement for the reference's NCCL/DDP distributed runtime
(SURVEY.md §2.11: torchrun 8-proc DDP, allreduce via
MMDistributedDataParallel).  Here parallelism is expressed once as a
``jax.sharding.Mesh`` with two axes:

  * ``dp`` — data parallel over images (the reference's only strategy);
  * ``tp`` — tensor parallel for the LLM (a *new* requirement on v5e:
    7B bf16 ≈ 14 GB exceeds a single chip's HBM once activations count,
    so the LLM shards across the slice; SURVEY.md §5 'distributed').

XLA inserts the collectives (psum for DP grad sync ≡ NCCL allreduce;
all-gather/reduce-scatter along tp) — no explicit communication code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over (dp, tp).  Defaults: all devices on dp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))
