"""Exhaustive matching + geometric verification driver.

TPU-native replacement for ``pycolmap.match_exhaustive`` (reference call site
``pipeline/run_pipeline.py:356-363``).  Dataflow:

1. read all keypoints/descriptors from the database ONCE, pad ragged counts
   to a static ``(num_images, N_max, D)`` tensor + validity masks,
2. normalize descriptors on device once,
3. stream pair batches through one jitted gather+matmul+filter program
   (`ops.matching`); pair batches are sharded over the mesh's data axis,
4. compact matches on host, write the ``matches`` table,
5. batch verified pairs through the vectorized RANSAC
   (`ops.ransac.estimate_two_view_batched`) and write
   ``two_view_geometries`` (config enum + F/E/H + relative pose).

Two-view geometries are written only for pairs reaching
``min_num_inliers`` (so ``verified_pairs <= matched_pairs`` like COLMAP).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.database import ColmapDatabase, TWO_VIEW_CONFIG
from vit_colmap_tpu.ops.matching import (
    compact_matches_device,
    get_pair_matcher,
    normalize_descriptors,
    resolve_use_pallas,
    unpack_matches,
)
from vit_colmap_tpu.ops.ransac import estimate_two_view_batched_packed
from vit_colmap_tpu.utils.config import MatchingConfig

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("signed",))
def _decode_normalize_u8(desc_u8, valid, signed: bool):
    """Device-side uint8 decode (+ signed mapping) + masking + L2 norm."""
    d = desc_u8.astype(jnp.float32)
    if signed:
        d = d / 127.5 - 1.0
    d = jnp.where(valid[..., None], d, 0.0)
    return normalize_descriptors(d)


def _next_pow2(n: int, minimum: int = 128) -> int:
    m = minimum
    while m < n:
        m *= 2
    return m


def camera_matrix(cam: dict) -> np.ndarray:
    """COLMAP camera dict -> 3x3 K (distortion ignored for verification)."""
    p = cam["params"]
    model = cam["model"]
    if model == "PINHOLE":
        fx, fy, cx, cy = p[:4]
    elif model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
        fx = fy = p[0]
        cx, cy = p[1], p[2]
    else:
        fx = fy = p[0]
        cx, cy = cam["width"] / 2.0, cam["height"] / 2.0
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)


@partial(jax.jit, static_argnames=("cross_check", "use_pallas"))
def _match_pair_batch(
    desc: jax.Array,  # (num_images, N, D) normalized
    valid: jax.Array,  # (num_images, N)
    idx1: jax.Array,  # (P,)
    idx2: jax.Array,  # (P,)
    max_ratio: float,
    max_distance: float,
    cross_check: bool,
    use_pallas: bool,
) -> jax.Array:
    d1 = jnp.take(desc, idx1, axis=0)
    d2 = jnp.take(desc, idx2, axis=0)
    v1 = jnp.take(valid, idx1, axis=0)
    v2 = jnp.take(valid, idx2, axis=0)
    matcher = get_pair_matcher(use_pallas)
    return matcher(d1, d2, v1, v2, max_ratio, max_distance, cross_check)


def _build_sharded_pallas_matcher(mesh, cross_check: bool):
    """Pallas matcher wrapped in shard_map: each device gathers and matches
    its own slice of the pair batch; descriptors stay replicated."""
    from jax.sharding import PartitionSpec as PS

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from vit_colmap_tpu.ops.matching import get_pair_matcher

    matcher = get_pair_matcher(True)

    def body(desc, valid, idx1, idx2, max_ratio, max_distance):
        d1 = jnp.take(desc, idx1, axis=0)
        d2 = jnp.take(desc, idx2, axis=0)
        v1 = jnp.take(valid, idx1, axis=0)
        v2 = jnp.take(valid, idx2, axis=0)
        return matcher(d1, d2, v1, v2, max_ratio, max_distance, cross_check)

    kw = dict(
        mesh=mesh,
        in_specs=(PS(), PS(), PS("data"), PS("data"), PS(), PS()),
        out_specs=PS("data"),
    )
    try:  # pallas_call can't express varying-mesh-axes metadata; disable
        return jax.jit(shard_map(body, check_vma=False, **kw))
    except TypeError:  # older jax spells it check_rep
        return jax.jit(shard_map(body, check_rep=False, **kw))


def _build_desc_sharded_matcher(mesh, cross_check: bool, use_pallas: bool):
    """Matcher for descriptor tensors SHARDED over the data axis.

    Scale-out memory mode (``MatchingConfig.shard_descriptors``): each chip
    persistently holds only ``n_img / n_devices`` descriptor rows; per pair
    batch it ``all_gather``s the full set over ICI (transient), gathers its
    pair slice, and matches.  The XLA collective rides the mesh's ICI links
    — the scaling-book recipe — so capacity grows linearly with chips while
    the per-batch gather stays off the host.
    """
    from jax.sharding import PartitionSpec as PS

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from vit_colmap_tpu.parallel.mesh import DATA_AXIS

    matcher = get_pair_matcher(use_pallas)

    def body(desc, valid, idx1, idx2, max_ratio, max_distance):
        desc_full = jax.lax.all_gather(desc, DATA_AXIS, axis=0, tiled=True)
        valid_full = jax.lax.all_gather(valid, DATA_AXIS, axis=0, tiled=True)
        d1 = jnp.take(desc_full, idx1, axis=0)
        d2 = jnp.take(desc_full, idx2, axis=0)
        v1 = jnp.take(valid_full, idx1, axis=0)
        v2 = jnp.take(valid_full, idx2, axis=0)
        return matcher(d1, d2, v1, v2, max_ratio, max_distance, cross_check)

    kw = dict(
        mesh=mesh,
        in_specs=(
            PS("data"), PS("data"), PS("data"), PS("data"), PS(), PS(),
        ),
        out_specs=PS("data"),
    )
    try:
        return jax.jit(shard_map(body, check_vma=False, **kw))
    except TypeError:
        return jax.jit(shard_map(body, check_rep=False, **kw))


@dataclass
class MatchStats:
    num_pairs: int = 0
    matched_pairs: int = 0
    verified_pairs: int = 0
    total_matches: int = 0
    total_inliers: int = 0
    match_seconds: float = 0.0
    verify_seconds: float = 0.0


def match_exhaustive(
    db_path,
    config: Optional[MatchingConfig] = None,
    seed: int = 0,
    device_descriptors: Optional[dict] = None,
) -> MatchStats:
    """Run exhaustive matching (+ optional geometric verification) over all
    images in the database, writing matches and two_view_geometries.

    ``device_descriptors`` (optional): ``{image_name: (desc_dev (N, D)
    uint8, count)}`` produced by an extractor's ``device_cache`` — when it
    covers every image, descriptors are consumed directly on device instead
    of the DB-read -> host-decode -> re-upload round trip (the D2H/H2D
    relay in this environment costs ~0.5 s per 8 full-keypoint images).
    """
    config = config or MatchingConfig()
    stats = MatchStats()

    db = ColmapDatabase(db_path)
    images = db.read_images()
    cameras = db.read_cameras()
    image_ids = sorted(images.keys())
    n_img = len(image_ids)
    if n_img < 2:
        logger.warning("Fewer than 2 images; nothing to match")
        db.close()
        return stats

    # ---------------------------------------------------------- load + pad
    # Device handoff: when the extractor's device_cache covers every image
    # (same descriptor width), matching consumes descriptors already on
    # device and skips the DB-read -> host-decode -> re-upload round trip.
    names = {iid: images[iid]["name"] for iid in image_ids}
    use_dev = device_descriptors is not None and all(
        n in device_descriptors for n in names.values()
    )
    if use_dev:
        dims = {device_descriptors[n][0].shape[-1] for n in names.values()}
        use_dev = len(dims) == 1

    kpts_list, desc_list, counts = [], [], []
    for iid in image_ids:
        k = db.read_keypoints(iid)
        if k is None or len(k) == 0:
            k = np.zeros((0, 2), np.float32)
        from vit_colmap_tpu.sfm.geometry import undistort_points

        cam = cameras[images[iid]["camera_id"]]
        kpts_list.append(
            undistort_points(k[:, :2].astype(np.float32), cam)
        )
        if use_dev:
            d_dev, cnt = device_descriptors[names[iid]]
            desc_list.append(d_dev)
            counts.append(min(cnt, len(k)))
        else:
            d = db.read_descriptors(iid)
            if d is None or len(k) == 0:
                d = np.zeros((0, 128), np.uint8)
            desc_list.append(d)
            counts.append(len(k))
    n_max = _next_pow2(max(counts))

    t0 = time.perf_counter()
    if use_dev:
        dim = next(iter(dims))
        valid = np.zeros((n_img, n_max), bool)
        for i, c in enumerate(counts):
            valid[i, :c] = True
        parts = []
        for d_dev in desc_list:
            rows = d_dev.shape[0]
            if rows < n_max:
                d_dev = jnp.pad(d_dev, ((0, n_max - rows), (0, 0)))
            parts.append(d_dev[:n_max])
        desc_dev = _decode_normalize_u8(
            jnp.stack(parts),
            jnp.asarray(valid),
            signed=config.descriptor_encoding == "signed",
        )
    else:
        dim = max(d.shape[1] for d in desc_list)
        desc_pad = np.zeros((n_img, n_max, dim), np.float32)
        valid = np.zeros((n_img, n_max), bool)
        for i, d in enumerate(desc_list):
            desc_pad[i, : len(d), : d.shape[1]] = d
            valid[i, : len(d)] = True
        if config.descriptor_encoding == "signed":
            desc_pad = desc_pad / 127.5 - 1.0
            # Padded rows stay zero so they remain invalid after
            # normalization.
            desc_pad[~valid] = 0.0
        desc_dev = normalize_descriptors(jnp.asarray(desc_pad))

    # Multi-chip: shard pair batches over the data axis — each chip matches
    # its slice of pairs (SURVEY.md §2.4 design).  Descriptors are either
    # replicated (default, fastest) or, in the scale-out memory mode
    # (``shard_descriptors``), sharded over the image dim with a per-batch
    # ICI all_gather inside the matcher.
    mesh = None
    pair_sharding = None
    desc_sharded = False
    valid_dev = jnp.asarray(valid)
    if jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vit_colmap_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
        if config.shard_descriptors:
            ndev = mesh.shape["data"]
            pad_img = (-n_img) % ndev
            if pad_img:
                desc_dev = jnp.pad(
                    desc_dev, ((0, pad_img), (0, 0), (0, 0))
                )
                valid_dev = jnp.pad(valid_dev, ((0, pad_img), (0, 0)))
            desc_sharded = True
        pair_sharding = NamedSharding(mesh, P("data"))
        image_sharding = NamedSharding(
            mesh, P("data") if desc_sharded else P()
        )
        desc_dev = jax.device_put(desc_dev, image_sharding)
        valid_dev = jax.device_put(valid_dev, image_sharding)

    # ------------------------------------------------------------- pairs
    pairs = [(i, j) for i in range(n_img) for j in range(i + 1, n_img)]
    stats.num_pairs = len(pairs)
    P = config.pair_batch
    use_pallas = resolve_use_pallas(config.use_pallas) and dim % 128 == 0
    sharded_matcher = None
    if mesh is not None:
        # Round the pair batch up to a multiple of the data-axis size.
        ndev = mesh.shape["data"]
        P = ((P + ndev - 1) // ndev) * ndev
        if desc_sharded:
            # Scale-out memory mode: per-batch ICI all_gather of the
            # sharded descriptor set inside shard_map.
            sharded_matcher = _build_desc_sharded_matcher(
                mesh, config.cross_check, use_pallas
            )
        elif use_pallas:
            # pallas_call is opaque to the SPMD partitioner, so the kernel
            # rides shard_map: descriptors replicated, pair indices sharded
            # over the data axis, each chip matching its pair slice
            # (VERDICT r1: multi-chip matching must not lose the 2.2x
            # single-chip kernel win).
            sharded_matcher = _build_sharded_pallas_matcher(
                mesh, config.cross_check
            )
    all_matches: dict[tuple[int, int], np.ndarray] = {}

    # Dispatch all pair batches first (jax is async), then sync — device
    # compute overlaps host-side match compaction.
    pending = []
    for start in range(0, len(pairs), P):
        chunk = pairs[start : start + P]
        pad = P - len(chunk)
        i1 = np.array([c[0] for c in chunk] + [0] * pad, np.int32)
        i2 = np.array([c[1] for c in chunk] + [0] * pad, np.int32)
        i1_dev, i2_dev = jnp.asarray(i1), jnp.asarray(i2)
        if pair_sharding is not None:
            i1_dev = jax.device_put(i1_dev, pair_sharding)
            i2_dev = jax.device_put(i2_dev, pair_sharding)
        if sharded_matcher is not None:
            out = sharded_matcher(
                desc_dev, valid_dev, i1_dev, i2_dev,
                config.max_ratio, config.max_distance,
            )
        else:
            out = _match_pair_batch(
                desc_dev,
                valid_dev,
                i1_dev,
                i2_dev,
                config.max_ratio,
                config.max_distance,
                config.cross_check,
                use_pallas and mesh is None,
            )
        # Compact on device: sort matches to the row fronts so the host
        # reads back counts + a short prefix instead of the full (P, N)
        # array (the device->host link here is a ~8 MB/s relay).
        pending.append((chunk, compact_matches_device(out)))
    for chunk, (m_counts, packed) in pending:
        m_counts = np.asarray(m_counts)
        # Padded batch rows are (0, 0) self-pairs whose near-total match
        # count must not widen the readback prefix.
        k_max = int(m_counts[: len(chunk)].max(initial=0))
        if k_max == 0:
            continue
        # pow2-bucketed prefix slice: a handful of tiny slice programs
        # instead of one per distinct count.
        k2 = min(_next_pow2(k_max), packed.shape[-1])
        prefix = np.asarray(jax.lax.slice_in_dim(packed, 0, k2, axis=-1))
        for b, (i, j) in enumerate(chunk):
            m = unpack_matches(prefix[b], int(m_counts[b]))
            # COLMAP SiftMatchingOptions.max_num_matches cap (rarely binds:
            # per-pair matches <= padded keypoint count << 32768 default).
            if len(m) > config.max_num_matches:
                m = m[: config.max_num_matches]
            if len(m) > 0:
                all_matches[(i, j)] = m

    # Bulk writes go through the native C++ writer when built
    # (native/db_writer.cc); the Python layer is the fallback.
    db.close()
    writer = db
    try:
        from vit_colmap_tpu.database.native import NativeDatabaseWriter

        writer = NativeDatabaseWriter(db_path)
    except Exception:
        writer = ColmapDatabase(db_path)

    for (i, j), m in all_matches.items():
        writer.add_matches(image_ids[i], image_ids[j], m)
        stats.total_matches += len(m)
    stats.matched_pairs = len(all_matches)
    stats.match_seconds = time.perf_counter() - t0
    writer.commit()
    logger.info(
        "Matched %d/%d pairs (%d matches) in %.2fs",
        stats.matched_pairs,
        stats.num_pairs,
        stats.total_matches,
        stats.match_seconds,
    )

    # ------------------------------------------------------- verification
    if config.do_verification and all_matches:
        t1 = time.perf_counter()
        verif_pairs = [
            (i, j) for (i, j), m in all_matches.items() if len(m) >= 8
        ]
        # Batch pairs by difficulty proxy (raw match count): the batched
        # RANSAC's while_loops run in lane LOCKSTEP under vmap, so one
        # low-inlier-ratio pair drags its 15 batchmates through its full
        # hypothesis budget.  Grouping likely-hard (few-match) pairs
        # together confines that cost to few batches instead of smearing
        # it over all of them.
        verif_pairs.sort(key=lambda p: len(all_matches[p]))
        if verif_pairs:
            k_max = _next_pow2(max(len(all_matches[p]) for p in verif_pairs))
            if jax.default_backend() not in ("cpu", "gpu"):
                # Align with the prewarmed K-buckets (run_pipeline warms
                # {<=1024, 512} and EXECUTES them once): the first dispatch
                # of a not-yet-run program pays a 76-105 s relay tax, far
                # more than padding a small scene's correspondences to 512.
                k_max = max(k_max, 512)
            VB = getattr(config, "verify_pair_batch", None) or config.pair_batch
            starts = list(range(0, len(verif_pairs), VB))
            # Derive every batch's PRNG keys on the host CPU backend in one
            # pass: eager fold_in/split on the relay device is a ~26 ms
            # dispatch round trip per op, paid twice per batch.
            with jax.default_device(jax.devices("cpu")[0]):
                key = jax.random.key(seed)
                batch_keys = [
                    jax.random.split(jax.random.fold_in(key, s), VB)
                    for s in starts
                ]
            # Packed-transfer flat bucket: ONLY valid correspondences cross
            # the wire (~80% of the padded (VB, k_max) buffers is padding at
            # DTU scale); one pow4 bucket over the largest batch keeps every
            # batch in a single program (see estimate_two_view_batched_packed).
            batch_tot = [
                sum(len(all_matches[p]) for p in verif_pairs[s : s + VB])
                for s in starts
            ]
            l_bucket = 4096
            while l_bucket < max(batch_tot):
                l_bucket *= 4
            # Software pipeline: dispatch every batch asynchronously first
            # (host assembly of batch k+1 and the DB writes overlap batch
            # k's device compute — the serial assemble->dispatch->readback
            # loop cost 82 s clean / 375 s under host contention at DTU-50),
            # then read back in order.
            pending = []
            t_dispatch0 = time.perf_counter()
            for bi, start in enumerate(starts):
                chunk = verif_pairs[start : start + VB]
                bsz = len(chunk)
                flat1 = np.zeros((l_bucket, 2), np.float32)
                flat2 = np.zeros((l_bucket, 2), np.float32)
                # Flat-buffer padding scatters out of range -> dropped.
                dest = np.full(l_bucket, VB * k_max, np.int32)
                K1 = np.tile(np.eye(3, dtype=np.float32), (VB, 1, 1))
                K2 = np.tile(np.eye(3, dtype=np.float32), (VB, 1, 1))
                calibrated = np.zeros(VB, bool)
                off = 0
                for b, (i, j) in enumerate(chunk):
                    m = all_matches[(i, j)]
                    flat1[off : off + len(m)] = kpts_list[i][m[:, 0]]
                    flat2[off : off + len(m)] = kpts_list[j][m[:, 1]]
                    dest[off : off + len(m)] = b * k_max + np.arange(
                        len(m), dtype=np.int32
                    )
                    off += len(m)
                    cam1 = cameras[images[image_ids[i]]["camera_id"]]
                    cam2 = cameras[images[image_ids[j]]["camera_id"]]
                    K1[b] = camera_matrix(cam1)
                    K2[b] = camera_matrix(cam2)
                    # COLMAP: a pair is calibrated only when BOTH cameras
                    # carry a prior focal length; otherwise verification
                    # goes through F and the pair is UNCALIBRATED
                    # (reference reads this enum back in metrics.py:120-132).
                    calibrated[b] = bool(cam1["prior_focal_length"]) and bool(
                        cam2["prior_focal_length"]
                    )
                res = estimate_two_view_batched_packed(
                    jnp.asarray(flat1),
                    jnp.asarray(flat2),
                    jnp.asarray(dest),
                    jnp.asarray(K1),
                    jnp.asarray(K2),
                    jnp.asarray(calibrated),
                    batch_keys[bi],
                    n_pairs=VB,
                    k_max=k_max,
                    iters=config.ransac_iters,
                    max_error_px=config.ransac_max_error_px,
                    min_num_inliers=config.min_num_inliers,
                    confidence=config.ransac_confidence,
                    five_point=config.essential_solver == "5pt",
                    five_point_chunk=getattr(config, "five_point_chunk", 16),
                )
                # Start D2H copies now; they drain while later batches run.
                for a in res:
                    if hasattr(a, "copy_to_host_async"):
                        a.copy_to_host_async()
                pending.append((chunk, bsz, res))
            t_dispatch = time.perf_counter() - t_dispatch0
            t_read = 0.0
            t_db0 = time.perf_counter()
            for chunk, bsz, res in pending:
                tr0 = time.perf_counter()
                configs = np.asarray(res.config)
                inl_masks = np.asarray(res.inlier_mask)
                n_inl = np.asarray(res.num_inliers)
                Fs = np.asarray(res.F, np.float64)
                Es = np.asarray(res.E, np.float64)
                Hs = np.asarray(res.H, np.float64)
                qs = np.asarray(res.qvec, np.float64)
                ts = np.asarray(res.tvec, np.float64)
                t_read += time.perf_counter() - tr0
                for b, (i, j) in enumerate(chunk):
                    if b >= bsz or n_inl[b] < config.min_num_inliers:
                        continue
                    m = all_matches[(i, j)]
                    inliers = m[inl_masks[b, : len(m)]]
                    if configs[b] == TWO_VIEW_CONFIG["DEGENERATE"]:
                        continue
                    writer.add_two_view_geometry(
                        image_ids[i],
                        image_ids[j],
                        inliers,
                        config=int(configs[b]),
                        F=Fs[b],
                        E=Es[b],
                        H=Hs[b],
                        qvec=qs[b],
                        tvec=ts[b],
                    )
                    stats.verified_pairs += 1
                    stats.total_inliers += len(inliers)
        writer.commit()
        stats.verify_seconds = time.perf_counter() - t1
        logger.info(
            "Verified %d pairs (%d inliers) in %.2fs",
            stats.verified_pairs,
            stats.total_inliers,
            stats.verify_seconds,
        )
        if verif_pairs:
            # Phase split: dispatch = host assembly + async H2D + program
            # launches; readback = blocking D2H of results (absorbs any
            # device backlog); db = host-side inlier packing + DB writes.
            logger.info(
                "Verify phases: dispatch %.2fs, readback %.2fs, db %.2fs",
                t_dispatch,
                t_read,
                time.perf_counter() - t_db0 - t_read,
            )

    writer.close()
    return stats
