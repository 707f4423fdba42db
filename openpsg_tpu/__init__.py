"""openpsg_tpu — TPU-native open-set panoptic scene graph generation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
franciszzj/OpenPSG (PyTorch + mmdetection).  The compute path is pure JAX
(jit/pjit/shard_map over a ``jax.sharding.Mesh``); hot kernels are Pallas;
the host runtime (data loading, submission IO) is Python + native helpers.

Layering (bottom → top):
  ops/        — Pallas/XLA kernels (deformable attention, mask pooling, ...)
  models/     — segmenter (OpenSeeD-style), relation heads, LLM decoder
  data/       — PSG dataset, preprocessing (static-bucket, XLA-fused)
  parallel/   — mesh / sharding policy
  train/      — losses, optimizer, trainer, checkpointing
  tools/      — CLI parity with the reference (train/infer/predict/...)
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persist XLA programs across processes (first compile on the 1-core
    host / tunneled TPU is minutes; cached reloads are seconds)."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            # partition by platform: AOT artifacts are not portable across
            # backends/machine feature sets (CPU loader SIGILL risk).
            # IMPORTANT: consult jax.config FIRST — the axon sitecustomize
            # exports JAX_PLATFORMS=axon globally, so a test process that
            # forced CPU via jax.config.update (the only way that works
            # here, see tests/conftest.py) still has the axon env var.
            plats = (
                getattr(jax.config, "jax_platforms", None)
                or _os.environ.get("JAX_PLATFORMS")
                or "default"
            )
            # the sitecustomize sets 'axon,cpu' — the FIRST entry is the
            # platform that actually executes (the rest are fallbacks)
            plat = plats.split(",")[0].strip()
            if plat in ("cpu", "default"):
                # NO persistent cache for the CPU backend: jaxlib's
                # executable (de)serialization segfaults on some hosts for
                # the large segmenter programs (observed on BOTH the read
                # and the write path — host-ISA-dependent codegen, same
                # family as the '+prefer-no-scatter ... SIGILL' warnings).
                # CPU compiles are local anyway; the cache only pays off
                # for the remote-compiled TPU (axon) backend.
                return
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(_os.path.dirname(_os.path.dirname(
                    _os.path.abspath(__file__))), ".jax_cache", plat),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from openpsg_tpu.core.registry import Registry, DETECTORS, HEADS, DATASETS  # noqa: F401
from openpsg_tpu.core.config import Config  # noqa: F401
