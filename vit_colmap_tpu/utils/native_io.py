"""ctypes binding for the native image decoder (native/image_io.cc).

JPEG/PNG decode straight to I420 planes at the patch-aligned target size —
the byte layout the YUV420 transfer path ships to the device
(:mod:`vit_colmap_tpu.ops.transfer`).  The JPEG path keeps libjpeg's
full-range JFIF YCbCr end to end (no RGB roundtrip); pair it with
``unpack_yuv420(..., full_range=True)`` on device.

Falls back transparently (``load_native() is None``) when the shared
library has not been built (``native/build.sh``) — callers keep the cv2
path.  Reference equivalent: PIL/torchvision image loading inside
``features/vit_extractor.py:700-727``.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libvc_image_io.so"
_lib = None
_lib_failed = False


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed or not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        logger.warning("Failed to load native image decoder: %s", e)
        _lib_failed = True
        return None
    lib.vc_probe.restype = ctypes.c_int
    lib.vc_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vc_decode_i420.restype = ctypes.c_int
    lib.vc_decode_i420.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vc_decode_batch_i420.restype = ctypes.c_int
    lib.vc_decode_batch_i420.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def probe_size(path: Path | str) -> Optional[tuple[int, int]]:
    """(width, height) from the image header, or None on failure."""
    lib = load_native()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.vc_probe(str(path).encode(), ctypes.byref(w), ctypes.byref(h)):
        return None
    return int(w.value), int(h.value)


def decode_batch_i420(
    paths: Sequence[Path | str],
    target_w: int,
    target_h: int,
    pad_to: Optional[int] = None,
    n_threads: int = 2,
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Decode + resize a batch straight into packed I420.

    Returns ``(packed (B, th*3/2, tw) uint8, ok (B,) bool)`` where B =
    ``pad_to or len(paths)`` (extra rows zero), or None when the native
    library is unavailable.  Failed images have ``ok=False`` and zero
    planes.
    """
    lib = load_native()
    if lib is None:
        return None
    n = len(paths)
    B = pad_to or n
    out = np.zeros((B, target_h * 3 // 2, target_w), np.uint8)
    if n == 0:
        return out, np.zeros(B, bool)
    status = np.zeros(n, np.int32)
    enc = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*enc)
    lib.vc_decode_batch_i420(
        arr,
        n,
        target_w,
        target_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    ok = np.zeros(B, bool)
    ok[:n] = status == 0
    return out, ok
