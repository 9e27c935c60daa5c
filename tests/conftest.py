"""Test configuration: force an 8-virtual-device CPU mesh.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``); real-TPU behavior is covered by
bench.py and the driver's dryrun.  Env vars must be set before jax's backend
initializes, hence this module-level code.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
