"""Test configuration: force an 8-virtual-device CPU mesh.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``); real-TPU behavior is covered by
bench.py and the driver's dryrun.  Env vars must be set before jax's backend
initializes, hence this module-level code.
"""

import os
import sys

# Overwrite (not setdefault): the session env pins JAX_PLATFORMS=axon (the
# real TPU tunnel), which is slow and single-chip; unit tests always run on
# the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start, overriding the env var; undo it before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the five-point-augmented verification
# program takes minutes to compile on this 1-core CPU; cache it across test
# sessions (keys include platform/flags, so CPU and TPU entries coexist).
from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

# XLA:CPU segfaults in backend_compile_and_load once hundreds of live
# executables from prior modules accumulate (reproduced at ~test 123/164 of
# single-invocation full-suite runs).  Clearing compiled-program caches at
# every module boundary bounds that state; with the CPU-local persistent
# cache above, cross-module recompiles deserialize from disk instead of
# paying the multi-minute verification-program compiles again.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_executable_state():
    jax.clear_caches()
    yield

