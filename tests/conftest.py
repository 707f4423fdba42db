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
# This VM has ONE cpu core and ~1.3s per-op XLA compile latency: always jit
# whole model fns (never eager init) and persist compiled programs across
# test runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache", "cpu",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
