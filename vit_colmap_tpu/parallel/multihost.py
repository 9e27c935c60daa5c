"""Multi-host (multi-slice / DCN) execution support.

Single-slice meshes ride ICI links only; spanning hosts (a v5e-256 pod or
multiple slices over DCN) requires ``jax.distributed`` process coordination
before any backend use.  This module is the one entry point:

* :func:`initialize` — wraps ``jax.distributed.initialize`` (no-op when
  single-process or already initialized), reading the standard
  ``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` / ``PROCESS_ID`` env contract
  used by TPU pod launchers when args are omitted.
* :func:`local_image_slice` — the data-loading plan per host: each process
  reads only its contiguous shard of the image list, so host RAM and
  decode time scale out with processes (the mapper/DB stages stay on
  process 0).

Sharding design across hosts is unchanged from the single-slice design
(``parallel/mesh.py``): the global mesh enumerates all devices across
processes; pair batches / image batches shard over ``data``; XLA routes
intra-slice collectives over ICI and inter-slice ones over DCN.  The
descriptor ``all_gather`` of the scale-out matcher
(``pipeline/match.py::_build_desc_sharded_matcher``) is hierarchical under
XLA's collective lowering, so its DCN leg transfers each descriptor shard
once per slice rather than once per chip.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX if a multi-process env is configured.

    Returns True when running multi-process (after initialization), False
    for plain single-process runs.  Safe to call multiple times.
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        # Single-process: nothing to coordinate.  (Cloud TPU pod slices are
        # auto-detected by jax.distributed.initialize() with no args, but
        # only initialize implicitly when the env opts in.)
        _initialized = True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "Multi-host initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def is_primary() -> bool:
    """True on the process that should own host-side side effects (DB
    writes, checkpoint metadata, logging)."""
    import jax

    return jax.process_index() == 0


def local_image_slice(paths: Sequence, *, batch: int = 1) -> list:
    """Per-host data-loading plan: the contiguous shard of ``paths`` this
    process should decode and feed to its addressable devices.

    The slice is padded conceptually by the caller's batch padding; handing
    each host a contiguous run keeps DB insertion order deterministic when
    process 0 concatenates results.
    """
    import jax

    n_proc = jax.process_count()
    if n_proc == 1:
        return list(paths)
    pid = jax.process_index()
    per = -(-len(paths) // n_proc)  # ceil
    return list(paths[pid * per : (pid + 1) * per])
