"""Persistent XLA compilation cache setup.

First compiles over this image's axon remote-compile tunnel take minutes;
the standard jax persistent cache brings repeat compiles of identical
programs down to seconds (measured 111s -> 3.2s). Enabled by every entry
point with a repo-local, git-ignored cache directory so compiled programs
survive across processes and rounds.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def _host_cache_tag() -> str:
    """Host-ISA fingerprint for partitioning CPU-backend cache entries.

    XLA:CPU AOT results embed machine-feature-specific code chosen by the
    COMPILING host, and jax's cache key does not include the executing
    host's features — loading an entry produced on a machine with e.g. AMX
    onto one without it SIGILLs mid-execution (observed: Eigen pack_rhs
    crash in dryrun_multichip after a machine change between rounds).
    """
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return platform.machine() or "unknown"


def enable_compilation_cache(cache_dir: str = "") -> str:
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    # TPU executables are host-independent (compiled for the chip) and stay
    # in the shared top-level dir; CPU-platform runs get a per-host subdir.
    # Decide by the RESOLVED backend, not the platform string: the axon
    # environment sets jax_platforms='axon,cpu' (cpu as fallback), so a
    # substring test would shunt host-independent TPU executables into the
    # per-host partition and every new host would recompile everything
    # (observed: a whole session's TPU programs, ~200 MB, filed under
    # cpu-<host>). default_backend() also covers auto-selected CPU on
    # accelerator-less hosts, whose AOT executables are ISA-specific (the
    # SIGILL case the partition exists for).
    on_cpu = False
    try:
        on_cpu = jax.default_backend() == "cpu"
    except Exception:
        platforms = ""
        try:
            platforms = jax.config.jax_platforms or ""
        except Exception:
            pass
        platforms = platforms or os.environ.get("JAX_PLATFORMS", "") or ""
        first = next((p.strip() for p in platforms.split(",") if p.strip()),
                     "")
        on_cpu = first == "cpu"
    if on_cpu:
        cache_dir = os.path.join(cache_dir, "cpu-" + _host_cache_tag())
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
    return cache_dir
