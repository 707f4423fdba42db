"""Test environment: CPU backend with 8 virtual devices.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4).  Must run before jax import.
"""

import os
import resource
import sys

# XLA's CPU compiler and the compile-cache proto (de)serialization recurse
# per-instruction, and on a thread-pool thread as often as on the caller;
# the largest segmenter programs overflow the default 8 MB stack and
# SIGSEGV the whole suite.  glibc fixes the DEFAULT pthread stack size
# from RLIMIT_STACK once, at process start — a runtime setrlimit only
# affects the main thread (and even that unreliably: growth depends on
# ASLR-placed mappings below it).  So: raise the limit and RE-EXEC once;
# every thread in the re-exec'd process then gets a 1 GB stack.
# (Measured: ulimit-at-start 1 GB → pthread stacks 1 GiB;
# setrlimit-at-runtime → pthread stacks stay 8 MiB.)
#
# The re-exec must NOT happen at conftest import time: pytest's global
# FD capture is already active then (fd 1/2 point at capture temp files),
# so the exec'd process inherits those fds and the whole run's output is
# silently discarded.  Instead it runs in pytest_configure below, where
# the capture manager is reachable and can restore the real fds first.
_WANT_STACK = 1 << 30
# Snapshot BEFORE openpsg_tpu is imported below: its import raises the
# soft limit for the main thread, but glibc already fixed the default
# pthread stack size from the limit that was in force at process start —
# this snapshot is the closest observable proxy for that value.
_SOFT_AT_IMPORT = resource.getrlimit(resource.RLIMIT_STACK)[0]


def _reexec_command():
    """Reconstruct this pytest invocation's argv, or None if unknown.

    None means pytest was started in-process (e.g. ``python -c "...
    pytest.main(...)"``) — re-execing ``sys.argv`` there would produce a
    broken command like ``python -c`` with no payload.
    """
    if not sys.argv:
        return None
    if sys.argv[0].endswith(os.path.join("pytest", "__main__.py")):
        # `python -m pytest …`: re-execing argv[0] as a script would drop
        # the cwd sys.path entry that `-m` adds — keep the module form.
        return [sys.executable, "-m", "pytest"] + sys.argv[1:]
    if os.path.basename(sys.argv[0]) in ("pytest", "py.test"):
        # console script: a python script, so exec'ing it under
        # sys.executable preserves the invocation.
        return [sys.executable] + sys.argv
    return None


def pytest_configure(config):
    hard = resource.getrlimit(resource.RLIMIT_STACK)[1]
    if (
        _SOFT_AT_IMPORT == resource.RLIM_INFINITY
        or _SOFT_AT_IMPORT >= _WANT_STACK
        or os.environ.get("_OPENPSG_STACK_REEXEC") == "1"
    ):
        return
    cmd = _reexec_command()
    if cmd is None:
        return  # in-process pytest.main: keep the big-stack compile thread only
    new = _WANT_STACK if hard == resource.RLIM_INFINITY else min(_WANT_STACK, hard)
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (new, hard))
    except (ValueError, OSError):
        return  # best-effort: fall through with the old limit
    os.environ["_OPENPSG_STACK_REEXEC"] = "1"
    # Restore the real stdout/stderr fds: pytest's FD capture has dup'd
    # them away, and exec preserves the fd table.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    try:
        os.execv(sys.executable, cmd)
    except OSError:
        os.environ.pop("_OPENPSG_STACK_REEXEC", None)
        if capman is not None:
            capman.start_global_capturing()

# make `pytest tests/…` (console script; no cwd on sys.path) work the
# same as `python -m pytest`
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_resident_programs():
    """Drop compiled executables at every module boundary.

    Full-suite runs die with a native SIGSEGV/SIGABRT inside XLA:CPU
    compile / cached-executable deserialization once a process holds
    hundreds of compiled programs (an XLA code-placement limit, NOT a
    stack limit — see CLAUDE.md).  ``-n 2 --dist loadfile`` kept each
    worker under that cliff at ~260 tests; the r5 suite (~370 tests,
    heavier tool modules) crossed it again (observed segfaults in
    test_train_tool / test_infer_tool workers).  Clearing jax's
    in-process caches at module teardown bounds residency to one
    module's worth; the on-disk .jax_cache keeps the re-JITs cheap.
    """
    yield
    import jax

    jax.clear_caches()
