"""Unit tests for the device matcher (mutual-NN + ratio/distance tests)."""

import numpy as np

from vit_colmap_tpu.ops.matching import (
    compact_matches,
    match_pair,
    match_pairs_batched,
    normalize_descriptors,
)


def _rand_desc(rng, n, d=128):
    return rng.standard_normal((n, d)).astype(np.float32)


def test_identical_descriptors_match():
    rng = np.random.default_rng(0)
    d = _rand_desc(rng, 20)
    d1 = normalize_descriptors(d)
    valid = np.ones(20, bool)
    idx = np.asarray(match_pair(d1, d1, valid, valid, cross_check=True))
    np.testing.assert_array_equal(idx, np.arange(20))


def test_permuted_match_and_padding():
    rng = np.random.default_rng(1)
    d = _rand_desc(rng, 16)
    perm = rng.permutation(16)
    d1 = np.asarray(normalize_descriptors(d))
    d2 = d1[perm]
    # Pad image-2 side to 32 with garbage that is masked out.
    pad = np.asarray(normalize_descriptors(_rand_desc(rng, 16)))
    d2p = np.concatenate([d2, pad])
    valid1 = np.ones(16, bool)
    valid2 = np.concatenate([np.ones(16, bool), np.zeros(16, bool)])
    idx = np.asarray(match_pair(d1, d2p, valid1, valid2))
    # keypoint i in image 1 equals row perm^-1 position: d2[j] == d1[perm[j]]
    inv = np.argsort(perm)
    np.testing.assert_array_equal(idx, inv)


def test_ratio_test_rejects_ambiguous():
    # Two equally-distant target descriptors -> ratio ~1 -> rejected.
    rng = np.random.default_rng(2)
    base = _rand_desc(rng, 1)[0]
    d1 = np.asarray(normalize_descriptors(base[None]))
    n1 = 0.3 * rng.standard_normal(128).astype(np.float32)
    n2 = 0.3 * rng.standard_normal(128).astype(np.float32)
    d2 = np.asarray(normalize_descriptors(np.stack([base + n1, base + n2])))
    valid1 = np.ones(1, bool)
    valid2 = np.ones(2, bool)
    idx = np.asarray(match_pair(d1, d2, valid1, valid2, max_ratio=0.8))
    assert idx[0] == -1


def test_max_distance_rejects_far():
    rng = np.random.default_rng(3)
    d1 = np.asarray(normalize_descriptors(_rand_desc(rng, 8)))
    d2 = np.asarray(normalize_descriptors(_rand_desc(rng, 8)))
    valid = np.ones(8, bool)
    idx = np.asarray(match_pair(d1, d2, valid, valid, max_distance=0.05))
    # random 128-D descriptors are nearly orthogonal: angular dist ~ pi/2
    assert (idx == -1).all()


def test_cross_check_mutuality():
    # d2[0] is closest to both d1[0] and d1[1]; only the mutual one survives.
    d1 = np.eye(4, 128, dtype=np.float32)
    d1[1] = 0.9 * d1[0] + 0.1 * np.eye(4, 128)[1]
    d1 = np.asarray(normalize_descriptors(d1))
    d2 = np.eye(4, 128, dtype=np.float32)
    d2 = np.asarray(normalize_descriptors(d2))
    valid = np.ones(4, bool)
    idx = np.asarray(
        match_pair(d1, d2, valid, valid, max_ratio=1.0, max_distance=3.2)
    )
    assert idx[0] == 0
    assert idx[1] == -1  # loses the cross-check to keypoint 0


def test_batched_matches_equal_single():
    rng = np.random.default_rng(4)
    P, N, D = 3, 12, 64
    d1 = np.asarray(normalize_descriptors(rng.standard_normal((P, N, D)).astype(np.float32)))
    d2 = np.asarray(normalize_descriptors(rng.standard_normal((P, N, D)).astype(np.float32)))
    valid = np.ones((P, N), bool)
    batched = np.asarray(match_pairs_batched(d1, d2, valid, valid))
    for p in range(P):
        single = np.asarray(match_pair(d1[p], d2[p], valid[p], valid[p]))
        np.testing.assert_array_equal(batched[p], single)


def test_compact_matches():
    idx = np.array([2, -1, 0, 5, -1], np.int32)
    out = compact_matches(idx, n_valid1=4)
    np.testing.assert_array_equal(out, [[0, 2], [2, 0], [3, 5]])
    assert out.dtype == np.uint32


def test_compact_matches_device_matches_host():
    from vit_colmap_tpu.ops.matching import compact_matches_device, unpack_matches

    rng = np.random.default_rng(7)
    P, N = 4, 256
    idx = np.where(
        rng.random((P, N)) < 0.3,
        rng.integers(0, N, (P, N)),
        -1,
    ).astype(np.int32)
    counts, packed = compact_matches_device(idx)
    counts, packed = np.asarray(counts), np.asarray(packed)
    for p in range(P):
        host = compact_matches(idx[p], n_valid1=N)
        dev = unpack_matches(packed[p], int(counts[p]))
        assert counts[p] == len(host)
        np.testing.assert_array_equal(dev, host)


def test_compact_matches_device_empty_and_full():
    from vit_colmap_tpu.ops.matching import compact_matches_device, unpack_matches

    N = 128
    empty = np.full((1, N), -1, np.int32)
    full = np.arange(N, dtype=np.int32)[None]
    for idx in (empty, full):
        counts, packed = compact_matches_device(idx)
        host = compact_matches(idx[0], n_valid1=N)
        dev = unpack_matches(np.asarray(packed)[0], int(np.asarray(counts)[0]))
        np.testing.assert_array_equal(dev, host)
