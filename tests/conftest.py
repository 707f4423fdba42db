"""Test environment: CPU backend with 8 virtual devices.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4).  Must run before jax import.
"""

import os
import resource

# XLA's CPU compiler and the compile-cache proto (de)serialization recurse
# per-instruction on the main thread; the largest segmenter programs
# overflow the default 8 MB soft stack and SIGSEGV the whole suite.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY:
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

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
# Install the big-stack compile thread + the per-host-keyed persistent
# compile cache BEFORE any test compiles (openpsg_tpu/__init__.py does
# both; importing it here makes the ordering explicit rather than
# depending on which test module imports first).
import openpsg_tpu  # noqa: E402,F401
