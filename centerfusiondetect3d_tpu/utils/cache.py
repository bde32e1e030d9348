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


def enable_compilation_cache(cache_dir: str = "") -> str:
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
    return cache_dir
