"""Persistent XLA compilation cache.

First compile of the full fused parse pipeline costs 2-4 minutes; with the
persistent cache, warm restarts (serving redeploys, repeated bench runs)
reload compiled executables from disk in seconds.  The reference has no
analogue (torch eager); this is a TPU/XLA-specific serving lever.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "OMNIPARSER_TPU_CACHE", os.path.expanduser("~/.cache/omniparser_tpu/xla")
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently point JAX's persistent compilation cache at cache_dir.

    Safe to call before or after backend init.  Returns the directory."""
    global _enabled
    import jax

    path = cache_dir or _DEFAULT_DIR
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful compile time; the fused parse
    # graphs are seconds-to-minutes each
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path
