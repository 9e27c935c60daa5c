"""Mesh utilities + sharded matching consistency on the virtual 8-CPU mesh."""

import jax
import numpy as np
import pytest

from vit_colmap_tpu.parallel.mesh import get_mesh, pad_to_multiple, replicate, shard_batch


def test_mesh_shape_and_axes():
    mesh = get_mesh()
    assert mesh.devices.size == 8
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh2 = get_mesh(data=4, model=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}


def test_shard_and_replicate_placement():
    import jax.numpy as jnp

    mesh = get_mesh()
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(x, mesh)
    assert len(xs.sharding.device_set) == 8
    xr = replicate(x, mesh)
    assert xr.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_pad_to_multiple():
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(9, 8) == 16


def test_sharded_matching_equals_single_device():
    """The data-parallel matching path must give identical matches."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_colmap_tpu.ops.matching import match_pairs_batched, normalize_descriptors

    rng = np.random.default_rng(0)
    Pn, N, D = 8, 64, 32
    d1 = np.asarray(normalize_descriptors(rng.standard_normal((Pn, N, D)).astype(np.float32)))
    d2 = np.asarray(normalize_descriptors(rng.standard_normal((Pn, N, D)).astype(np.float32)))
    v = np.ones((Pn, N), bool)

    ref = np.asarray(match_pairs_batched(d1, d2, v, v))

    mesh = get_mesh()
    sh = NamedSharding(mesh, P("data"))
    out = match_pairs_batched(
        jax.device_put(d1, sh), jax.device_put(d2, sh),
        jax.device_put(v, sh), jax.device_put(v, sh),
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
