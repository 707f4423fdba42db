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

from openpsg_tpu.core.registry import Registry, DETECTORS, HEADS, DATASETS  # noqa: F401
from openpsg_tpu.core.config import Config  # noqa: F401
