"""Device-mesh utilities.

The reference has no distributed execution at all (SURVEY.md §2.4); here
parallelism is a first-class green-field design:

* **extraction**: images are data-parallel over the ``data`` axis,
* **matching / verification**: image *pairs* are sharded over the same axis
  (each pair's similarity matmul is independent; descriptors are replicated
  or gathered over ICI),
* **training**: standard DP with gradient ``psum`` over ``data``.

Mesh axes are named so tensor-parallel sharding of wide MLPs can be added
later without changing call sites (``model`` axis reserved).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a batch-leading array sharded over the data axis."""
    return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))


def replicate(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
