"""Persistent XLA compilation cache helper.

TPU compiles in this environment go through a remote compile service and
routinely take 20-40 s per program; the persistent cache makes every rerun
of the pipeline / training / benches start hot.  One shared entry point so
every driver (CLI or library use) opts in identically.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/jax_comp_cache"
_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotently point JAX's compilation cache at a persistent directory.

    Safe to call before or after backend init; never raises (an unwritable
    directory just disables the cache).
    """
    global _enabled
    if _enabled:
        return
    try:
        import jax

        # TPU-backend only: in this environment CPU programs can be
        # compiled by the REMOTE compile service for a different CPU
        # microarchitecture; loading such an AOT result from the cache
        # SIGILLs/SIGSEGVs the process (observed in the test suite).  The
        # cache's entire value is skipping the 20-40 s remote TPU
        # compiles anyway.
        if jax.default_backend() in ("cpu", "gpu"):
            return

        path = cache_dir or os.environ.get(
            "VIT_COLMAP_TPU_CACHE_DIR", _DEFAULT_DIR
        )
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass
