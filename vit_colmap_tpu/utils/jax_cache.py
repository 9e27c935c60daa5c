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

        path = cache_dir or os.environ.get(
            "VIT_COLMAP_TPU_CACHE_DIR", _DEFAULT_DIR
        )
        # CPU-backend sessions (the test suite) get a SEPARATE, local-only
        # cache directory.  In axon/TPU sessions, host-side CPU programs can
        # be compiled by the REMOTE compile service for a different CPU
        # microarchitecture; loading such an AOT entry SIGILLs the process
        # (observed in the test suite when both session kinds shared one
        # directory).  A dir only CPU-default sessions write keeps every
        # entry locally compiled, which makes per-module cache clearing in
        # tests cheap (recompiles deserialize from disk) — the mitigation
        # for XLA:CPU's segfault under accumulated executable state.
        if jax.default_backend() == "gpu":
            return
        if jax.default_backend() == "cpu":
            path = path + "_cpu_local"
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass
