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


def _raise_stack_limit():
    """XLA's CPU compiler and the compile-cache proto (de)serialization
    recurse per-instruction on the MAIN thread; our largest segmenter
    programs overflow the default 8 MB soft stack limit and die with
    SIGSEGV (observed in backend_compile, executable.serialize AND
    deserialize_executable — one root cause, three symptoms).  Raising
    the soft limit to the hard limit extends main-thread stack growth
    retroactively on Linux."""
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        if soft != resource.RLIM_INFINITY and (
            hard == resource.RLIM_INFINITY or soft < hard
        ):
            resource.setrlimit(resource.RLIMIT_STACK, (hard, hard))
    except Exception:  # pragma: no cover - best-effort
        pass


def _route_compiles_to_big_stack_thread():
    """Run XLA compilation (and the compile-cache (de)serialization it
    brackets) on a dedicated thread with an EXPLICIT 1 GB stack.

    The retroactive rlimit raise above is not sufficient: whether the
    main thread can actually grow to the raised limit depends on the
    ASLR-placed mappings below it, so the biggest segmenter train-step
    programs still segfaulted intermittently (observed in
    backend_compile_and_load with soft=RLIM_INFINITY).  A thread created
    with ``threading.stack_size(1 << 30)`` owns a full 1 GB mapping up
    front — compile depth no longer depends on address-space luck.
    ``compile_or_get_cached`` is the single choke point covering compile,
    cache write (executable.serialize) and cache read."""
    try:
        import threading

        import jax._src.compiler as _compiler

        if getattr(_compiler, "_openpsg_big_stack", False):
            return
        orig = _compiler.compile_or_get_cached
        lock = threading.Lock()

        def patched(*args, **kwargs):
            result, error = [], []

            def run():
                try:
                    result.append(orig(*args, **kwargs))
                except BaseException as e:  # re-raised on the caller
                    error.append(e)

            with lock:   # threading.stack_size is process-global
                old = threading.stack_size(1 << 30)
                try:
                    t = threading.Thread(
                        target=run, name="xla-compile-big-stack"
                    )
                    t.start()
                finally:
                    threading.stack_size(old)
            t.join()
            if error:
                raise error[0]
            return result[0]

        patched.__wrapped__ = orig
        _compiler.compile_or_get_cached = patched
        _compiler._openpsg_big_stack = True
    except Exception:  # pragma: no cover - best-effort
        pass


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
                # CPU AOT executables embed host ISA; loading a blob
                # cached by a machine with different CPU features
                # segfaults inside compilation_cache reads (observed:
                # driver machine ≠ session host).  Key the dir by the
                # host's feature flags so each machine gets its own.
                # The (de)serialization stack overflows that previously
                # forced the CPU cache OFF are gone now that
                # compile_or_get_cached runs on the explicit 1 GB stack
                # thread (see _route_compiles_to_big_stack_thread).
                try:
                    import hashlib

                    with open("/proc/cpuinfo") as f:
                        flags = next(
                            (ln for ln in f if ln.startswith("flags")), ""
                        )
                    plat += "-" + hashlib.md5(flags.encode()).hexdigest()[:10]
                except OSError:
                    pass
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(_os.path.dirname(_os.path.dirname(
                    _os.path.abspath(__file__))), ".jax_cache", plat),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_raise_stack_limit()
_route_compiles_to_big_stack_thread()
_enable_compile_cache()

from openpsg_tpu.core.registry import Registry, DETECTORS, HEADS, DATASETS  # noqa: F401
from openpsg_tpu.core.config import Config  # noqa: F401
