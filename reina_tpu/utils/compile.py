"""Backend-aware jit helper.

On this TPU toolchain, XLA's scheduler inserts forced delays when its
memory-pressure estimate crosses a threshold; for the engine's large
day-step program that heuristic misfires catastrophically (measured
~20,000× slowdown and ~10× compile time — see tools/profile_morph.py
and docs/performance.md). ``engine_jit`` compiles with the heuristic's
delay injection disabled on TPU backends; other backends get a plain
jit (the option is TPU-specific).
"""
from __future__ import annotations

import contextlib
import functools
import os
from typing import Any, Dict, Optional

import jax

TPU_COMPILER_OPTIONS: Dict[str, Any] = {
    "xla_tpu_force_delay_over_memory_pressure": "false",
    # headroom for the blockwise MXU one-hot kernels: their (block, 128)
    # lane-padded intermediates exceed the default 16 MB scoped-vmem
    # budget at large block sizes (v5e has 128 MB of VMEM total)
    "xla_tpu_scoped_vmem_limit_kib": "49152",
}


def host_cpu_fingerprint() -> str:
    """Short digest of the host CPU's feature set. XLA:CPU cache
    entries are AOT machine code compiled for the build host's exact
    features; jax's cache key does NOT include them, so a cache
    directory shared across heterogeneous machines serves foreign
    executables whose load SIGILLs/segfaults (observed: cpu_aot_loader
    'machine type ... doesn't match' warnings, then a segfault inside
    get_executable_and_time mid-suite)."""
    import hashlib
    import platform
    feat = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            got_flags = got_model = False
            for line in f:
                # the model name too, not just the flags: LLVM applies
                # model-derived TUNING (e.g. +prefer-no-scatter) that
                # two hosts with identical cpuinfo flags may not share
                # (observed 2026-08-21: cache dir matched, loader
                # warned about mismatched compile-machine features)
                if line.startswith("flags") and not got_flags:
                    feat += " ".join(sorted(line.split(":", 1)[1].split()))
                    got_flags = True
                elif line.startswith("model name") and not got_model:
                    feat += line.split(":", 1)[1].strip()
                    got_model = True
                if got_flags and got_model:
                    break
    except OSError:
        pass
    return hashlib.sha256(feat.encode()).hexdigest()[:10]


def enable_persistent_cache(cache_dir: Optional[str] = None) -> str:
    """Point jax's persistent compilation cache at a shared directory so
    second-process runs (bench, CLI, server) skip the multi-minute TPU
    compile. Tests use the same directory via tests/conftest.py. Safe to
    call more than once; returns the directory used.

    When the CPU platform is forced (tests, dryruns, CPU servers), the
    cache lives in a per-host-CPU subdirectory — see
    ``host_cpu_fingerprint``. TPU executables are device binaries and
    stay in the shared root."""
    if cache_dir is None:
        cache_dir = (os.environ.get("REINA_JAX_CACHE")
                     or os.environ.get("REINA_JAX_CACHE_DIR")
                     or os.path.join(os.path.dirname(os.path.dirname(
                         os.path.dirname(os.path.abspath(__file__)))),
                         ".jax_cache"))
        if jax.config.jax_platforms == "cpu":
            cache_dir = os.path.join(
                cache_dir, "cpu-%s" % host_cpu_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def engine_jit(fn=None, *, static_argnums=(), no_persistent_cache=False):
    """Like jax.jit, but resolves TPU-specific compiler options at first
    call (the active backend isn't known at import time — tests switch
    to CPU after import).

    ``no_persistent_cache=True`` keeps this program out of the on-disk
    compilation cache: serializing/deserializing the large vmapped
    ensemble executable segfaults inside the XLA CPU client when the
    process has compiled many other programs first (reproduced 3× in
    the full test suite at both the cache-put and cache-get paths; the
    identical program round-trips fine in a fresh process). The flag is
    flipped around every call (any call with a new arg shape compiles),
    so every other program keeps the warm-start cache."""
    if fn is None:
        return functools.partial(engine_jit, static_argnums=static_argnums,
                                 no_persistent_cache=no_persistent_cache)

    compiled = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        backend = "tpu" if _is_tpu() else "other"
        # The active shard_pallas mesh is consulted at TRACE time (the
        # fused ops wrap themselves in shard_map islands over it), so it
        # must be part of the jit cache key: two meshes with the same
        # agent-shard count would otherwise silently reuse the first
        # mesh's compiled program (ADVICE r4).
        jitted = compiled.get((backend, _shard_fingerprint()))
        if jitted is None:
            opts = TPU_COMPILER_OPTIONS if backend == "tpu" else None
            jitted = jax.jit(fn, static_argnums=static_argnums,
                             compiler_options=opts)
            compiled[(backend, _shard_fingerprint())] = jitted
        if no_persistent_cache:
            with persistent_cache_disabled():
                return jitted(*args, **kwargs)
        return jitted(*args, **kwargs)

    return wrapper


def _shard_fingerprint():
    """Hashable identity of the active shard_pallas context (device ids
    + axis names + interpret flag), or None outside one."""
    from ..ops.fusedmap import _shard_get
    shard = _shard_get()
    if shard is None:
        return None
    mesh, ax, interp = shard
    return (tuple(int(d.id) for d in mesh.devices.flat),
            tuple(mesh.axis_names), ax, interp)


@contextlib.contextmanager
def persistent_cache_disabled():
    """Disable the on-disk compilation cache (reads AND writes) for the
    calls under the context.

    Flipping ``jax_enable_compilation_cache`` alone is NOT enough:
    ``compilation_cache.is_cache_used`` memoizes its verdict after the
    first cached compile in the process, after which cache keys are
    produced and the GET path deserializes entries regardless of the
    flag. ``reset_cache()`` clears that memoization (and the cache
    object) so the flag is genuinely re-consulted; a second reset on
    exit lets later compiles re-initialize the cache normally. This
    matters because XLA:CPU segfaults inside executable
    (de)serialization after enough cumulative compiles in one process
    (reproduced at a cache GET of a small eager-dispatched sampler
    scan ~100 tests in, and at the 4th+ big vmapped-engine compile) —
    keep fragile or cache-worthless programs out entirely."""
    from jax._src import compilation_cache

    prev = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    compilation_cache.reset_cache()
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
        compilation_cache.reset_cache()
