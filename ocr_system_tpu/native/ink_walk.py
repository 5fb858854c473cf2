"""ctypes binding for the batch ink-expansion native op (ink_walk.cpp)."""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from ocr_system_tpu.native.build import build_library

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def _get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        with _lock:
            if _lib is None:
                path = build_library()
                lib = ctypes.CDLL(str(path))
                lib.ink_expand_batch.restype = None
                lib.ink_expand_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int32,
                    ctypes.c_float,
                ]
                _lib = lib
    return _lib


def ink_expand_batch(
    gray: np.ndarray, quads: np.ndarray, max_walk_ratio: float = 1.2
) -> np.ndarray:
    """Expand-only ink walk for a page's axis-aligned quads in ONE GIL-free
    native call (semantics of detector._ink_snap(expand_only=True)).

    gray: (H, W) uint8. quads: (N, 4, 2) float32, modified IN PLACE
    (also returned). Quads must be axis-aligned; the caller filters."""
    if quads.size == 0:
        return quads
    g = np.ascontiguousarray(gray, dtype=np.uint8)
    q = np.ascontiguousarray(quads, dtype=np.float32)
    lib = _get_lib()
    lib.ink_expand_batch(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(g.shape[0]),
        ctypes.c_int32(g.shape[1]),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(q.shape[0]),
        ctypes.c_float(max_walk_ratio),
    )
    if q is not quads:
        quads[...] = q
    return quads
