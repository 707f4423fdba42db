"""Test environment: CPU backend with 8 virtual devices.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4).  Must run before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize prepends 'axon' to jax_platforms, overriding the
# env var — force CPU via the config API so the 8-device virtual mesh works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent compile cache on CPU: jaxlib's executable
# (de)serialization segfaults on some hosts for the large segmenter
# programs — observed on both the read and the write path (full trace in
# openpsg_tpu/__init__.py).  Cold compiles cost the suite ~2x wall time
# but never crash it.
