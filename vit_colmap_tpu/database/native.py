"""ctypes binding for the native batched DB writer (native/db_writer.cc).

Drop-in fast path for the write surface of
:class:`vit_colmap_tpu.database.ColmapDatabase`: the matching/verification
drivers stream large blob batches through the C++ writer inside one
transaction, keeping the Python interpreter out of the hot host loop.
Falls back transparently (``load_native() is None``) when the shared
library has not been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libvc_db_writer.so"
_lib = None


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        logger.warning("Failed to load native writer: %s", e)
        return None
    lib.vc_open.restype = ctypes.c_void_p
    lib.vc_open.argtypes = [ctypes.c_char_p]
    lib.vc_close.argtypes = [ctypes.c_void_p]
    lib.vc_last_error.restype = ctypes.c_char_p
    lib.vc_last_error.argtypes = [ctypes.c_void_p]
    lib.vc_begin.argtypes = [ctypes.c_void_p]
    lib.vc_commit.argtypes = [ctypes.c_void_p]
    lib.vc_add_camera.restype = ctypes.c_int64
    lib.vc_add_camera.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
    ]
    lib.vc_add_image.restype = ctypes.c_int64
    lib.vc_add_image.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.vc_write_keypoints.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vc_write_descriptors.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vc_write_matches.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.vc_write_two_view_geometry.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
    ] + [ctypes.POINTER(ctypes.c_double)] * 5
    _lib = lib
    return lib


def _ptr(arr: np.ndarray, ctype):
    return np.ascontiguousarray(arr).ctypes.data_as(ctypes.POINTER(ctype))


class NativeDatabaseWriter:
    """Same write API as ColmapDatabase, backed by the C++ writer."""

    def __init__(self, db_path: str | Path):
        lib = load_native()
        if lib is None:
            raise RuntimeError(
                "native writer not built; run native/build.sh"
            )
        self.lib = lib
        self.handle = lib.vc_open(str(db_path).encode())
        if not self.handle:
            raise RuntimeError(f"vc_open failed for {db_path}")
        self.lib.vc_begin(self.handle)

    def _check(self, rc: int, op: str) -> None:
        if rc != 0:
            err = self.lib.vc_last_error(self.handle).decode()
            raise RuntimeError(f"{op} failed: {err}")

    def add_camera(self, model_id: int, width: int, height: int,
                   params, prior_focal_length: bool = False) -> int:
        p = np.ascontiguousarray(params, np.float64)
        cid = self.lib.vc_add_camera(
            self.handle, int(model_id), int(width), int(height),
            _ptr(p, ctypes.c_double), len(p), int(prior_focal_length),
        )
        if cid < 0:
            self._check(-1, "add_camera")
        return int(cid)

    def add_image(self, name: str, camera_id: int) -> int:
        iid = self.lib.vc_add_image(self.handle, name.encode(), camera_id)
        if iid < 0:
            self._check(-1, "add_image")
        return int(iid)

    def add_keypoints(self, image_id: int, kpts: np.ndarray) -> None:
        k = np.ascontiguousarray(kpts, np.float32)
        self._check(
            self.lib.vc_write_keypoints(
                self.handle, image_id, k.shape[0], k.shape[1],
                _ptr(k, ctypes.c_float),
            ),
            "write_keypoints",
        )

    def add_descriptors(self, image_id: int, desc: np.ndarray) -> None:
        d = np.ascontiguousarray(desc, np.uint8)
        self._check(
            self.lib.vc_write_descriptors(
                self.handle, image_id, d.shape[0], d.shape[1],
                _ptr(d, ctypes.c_uint8),
            ),
            "write_descriptors",
        )

    def add_matches(self, id1: int, id2: int, pairs: np.ndarray) -> None:
        m = np.ascontiguousarray(pairs, np.uint32).reshape(-1, 2)
        self._check(
            self.lib.vc_write_matches(
                self.handle, id1, id2, m.shape[0], _ptr(m, ctypes.c_uint32)
            ),
            "write_matches",
        )

    def add_two_view_geometry(
        self, id1: int, id2: int, inliers: np.ndarray, config: int = 2,
        F=None, E=None, H=None, qvec=None, tvec=None,
    ) -> None:
        m = np.ascontiguousarray(inliers, np.uint32).reshape(-1, 2)

        def mat(x, default):
            return np.ascontiguousarray(
                x if x is not None else default, np.float64
            )

        F = mat(F, np.eye(3))
        E = mat(E, np.eye(3))
        H = mat(H, np.eye(3))
        qvec = mat(qvec, np.array([1.0, 0, 0, 0]))
        tvec = mat(tvec, np.zeros(3))
        self._check(
            self.lib.vc_write_two_view_geometry(
                self.handle, id1, id2, m.shape[0], _ptr(m, ctypes.c_uint32),
                int(config), _ptr(F, ctypes.c_double), _ptr(E, ctypes.c_double),
                _ptr(H, ctypes.c_double), _ptr(qvec, ctypes.c_double),
                _ptr(tvec, ctypes.c_double),
            ),
            "write_two_view_geometry",
        )

    def commit(self) -> None:
        self.lib.vc_commit(self.handle)
        self.lib.vc_begin(self.handle)

    def close(self) -> None:
        if self.handle:
            self.lib.vc_commit(self.handle)
            self.lib.vc_close(self.handle)
            self.handle = None
