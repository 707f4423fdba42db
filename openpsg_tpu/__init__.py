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
        import queue as _queue

        orig = _compiler.compile_or_get_cached
        jobs: "_queue.Queue" = _queue.Queue()
        started = threading.Event()
        start_lock = threading.Lock()

        def worker():
            while True:
                fn, out, done = jobs.get()
                try:
                    out.append((True, fn()))
                except BaseException as e:  # re-raised on the caller
                    out.append((False, e))
                finally:
                    done.set()

        def ensure_worker():
            # ONE persistent 2 GB-stack worker for every compile / cache
            # (de)serialization.  A fresh thread per compile (the previous
            # design) creates and destroys hundreds of 1-2 GB stack
            # mappings per test run; full-suite runs then SIGSEGVed
            # deterministically inside deserialize_executable /
            # pthread_getattr_np (write fault at a 32-bit-truncated stack
            # address — an address-space-layout-sensitive glibc/XLA
            # interaction, 2026-08).  One long-lived mapping sidesteps the
            # churn, and 2 GB covers XLA's per-instruction recursion on
            # the biggest segmenter programs.
            if started.is_set():
                return
            with start_lock:
                if started.is_set():
                    return
                old = threading.stack_size(2 << 30)
                try:
                    t = threading.Thread(
                        target=worker, name="xla-compile-big-stack",
                        daemon=True,
                    )
                    t.start()
                finally:
                    threading.stack_size(old)
                started.set()

        def patched(*args, **kwargs):
            backend = kwargs.get("backend", args[0] if args else None)
            if backend is not None:
                _ensure_cache_dir(backend)
            # reentrancy guard: a nested compile issued FROM the worker
            # would deadlock the single-thread queue — run it inline
            # (already on the big stack)
            if threading.current_thread().name == "xla-compile-big-stack":
                return orig(*args, **kwargs)
            ensure_worker()
            out, done = [], threading.Event()
            jobs.put((lambda: orig(*args, **kwargs), out, done))
            done.wait()
            ok, val = out[0]
            if not ok:
                raise val
            return val

        patched.__wrapped__ = orig
        _compiler.compile_or_get_cached = patched
        _compiler._openpsg_big_stack = True
    except Exception:  # pragma: no cover - best-effort
        pass


_CACHE_ROOT = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    ".jax_cache",
)
# True iff the cache dir is ours to manage (the user/env didn't set one);
# decided once at import so we never clobber an explicit user dir.
_MANAGE_CACHE_DIR = False


def _cache_dir_for_platform(plat):
    """Per-platform persistent cache dir.  AOT artifacts are not portable
    across backends/machine feature sets (CPU loader SIGILL risk)."""
    if plat == "tpu" and not _os.path.isdir(
        _os.path.join(_CACHE_ROOT, "tpu")
    ) and _os.path.isdir(_os.path.join(_CACHE_ROOT, "axon")):
        # legacy dir name from when the dir was keyed off the JAX_PLATFORMS
        # env var ('axon') rather than the backend ('tpu'); keep the warm
        # multi-GB cache rather than recompiling everything.
        plat = "axon"
    if plat == "cpu":
        # CPU AOT executables embed host ISA; loading a blob cached by a
        # machine with different CPU features segfaults inside
        # compilation_cache reads (observed: driver machine ≠ session
        # host).  Key the dir by the host's feature flags so each machine
        # gets its own.  The (de)serialization stack overflows that
        # previously forced the CPU cache OFF are gone now that
        # compile_or_get_cached runs on the explicit 1 GB stack thread
        # (see _route_compiles_to_big_stack_thread).
        try:
            import hashlib

            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
            plat += "-" + hashlib.md5(flags.encode()).hexdigest()[:10]
        except OSError:
            pass
    return _os.path.join(_CACHE_ROOT, plat)


def _ensure_cache_dir(backend):
    """Point the persistent compile cache at the dir for the EXECUTING
    backend.  Called from the compile choke point (below) on every compile:
    the platform is only known then — tools import this package first and
    flip jax to CPU afterwards (utils.logging.honor_platform_env), so an
    import-time decision reads the wrong platform and cross-pollutes the
    cache dirs (host-ISA CPU blobs in the shared 'axon' dir → SIGSEGV on
    the next machine)."""
    if not _MANAGE_CACHE_DIR:
        return
    try:
        import jax
        from jax._src import compilation_cache as _cc

        want = _cache_dir_for_platform(backend.platform)
        if jax.config.jax_compilation_cache_dir != want:
            jax.config.update("jax_compilation_cache_dir", want)
            # the cache is a read-once singleton; re-init it against the
            # new dir (no-op if it was never initialized)
            _cc.reset_cache()
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _enable_compile_cache():
    """Persist XLA programs across processes (first compile on the 1-core
    host / tunneled TPU is minutes; cached reloads are seconds).  The dir
    itself is resolved lazily per-backend in _ensure_cache_dir."""
    global _MANAGE_CACHE_DIR
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            _MANAGE_CACHE_DIR = True
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_raise_stack_limit()
_route_compiles_to_big_stack_thread()
_enable_compile_cache()

from openpsg_tpu.core.registry import Registry, DETECTORS, HEADS, DATASETS  # noqa: F401
from openpsg_tpu.core.config import Config  # noqa: F401
