"""Worker for the 2-process jax.distributed test (spawned by
tests/test_parallel.py::test_multihost_two_process_cpu).

Each process gets 2 virtual CPU devices; together they form a 4-device
global mesh.  Exercises the real multi-host seam the framework exposes
(``parallel/multihost.py``): distributed init via the env contract, the
per-host data-loading plan, and one cross-process collective.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from vit_colmap_tpu.parallel.multihost import (  # noqa: E402
    initialize,
    is_primary,
    local_image_slice,
)


def main() -> None:
    # Env contract: COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID set by
    # the spawning test (the same variables a pod launcher would set).
    assert initialize() is True, "expected multi-process initialization"
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert is_primary() == (pid == 0)

    # Per-host data plan: disjoint contiguous halves covering the list.
    paths = [f"img_{i:02d}.png" for i in range(10)]
    mine = local_image_slice(paths)
    assert mine == paths[:5] if pid == 0 else mine == paths[5:], (pid, mine)

    # One real cross-process collective: allgather of per-process scalars.
    from jax.experimental import multihost_utils

    got = multihost_utils.process_allgather(pid + 1)
    assert sorted(got.tolist()) == [1, 2], got

    print(f"MULTIHOST_OK pid={pid}")


if __name__ == "__main__":
    main()
