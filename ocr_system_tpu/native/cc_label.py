"""ctypes binding for the connected-components native op (cc_label.cpp)."""

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
                lib.cc_label_u8.restype = ctypes.c_int32
                lib.cc_label_u8.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.cc_stats.restype = None
                lib.cc_stats.argtypes = [
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.cc_analyze_u8.restype = ctypes.c_int32
                lib.cc_analyze_u8.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_double),
                ]
                _lib = lib
    return _lib


def label(binary: np.ndarray) -> tuple[np.ndarray, int]:
    """8-connectivity labeling. binary: (H, W) any int/bool. Returns
    (labels int32 (H, W), n_components)."""
    img = np.ascontiguousarray(binary != 0, dtype=np.uint8)
    h, w = img.shape
    out = np.empty((h, w), dtype=np.int32)
    lib = _get_lib()
    n = lib.cc_label_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        raise ValueError("cc_label_u8 failed")
    return out, int(n)


def stats(
    labels: np.ndarray, prob: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-component (count, prob_sum, bbox) in one native pass.
    Returns (counts (n+1,), sums (n+1,), bboxes (n+1, 4) x0,y0,x1,y1)."""
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    prob = np.ascontiguousarray(prob, dtype=np.float32)
    h, w = labels.shape
    counts = np.empty(n + 1, dtype=np.int64)
    sums = np.empty(n + 1, dtype=np.float64)
    bboxes = np.empty((n + 1, 4), dtype=np.int32)
    _get_lib().cc_stats(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        w,
        n,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sums.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return counts, sums, bboxes


def analyze(
    binary: np.ndarray,
    prob: np.ndarray,
    stride: int = 1,
    cap: int = 4096,
) -> tuple[np.ndarray, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fused 8-connectivity labeling + per-component statistics in ONE
    GIL-free native call (cc_analyze_u8).

    binary: (H, W) 0/1. prob: (ph, pw) float32 sampled at
    (y // stride, x // stride) — pass the full-res probability map with
    stride=1, or the pooled score map with its stride.

    Returns (labels int32 (H, W), n, counts (n+1,) int64,
    score_sums (n+1,) float64, bboxes (n+1, 4) int32 x0,y0,x1,y1,
    moments (n+1, 5) float64 sum_x,sum_y,sum_xx,sum_yy,sum_xy).
    """
    img = np.ascontiguousarray(binary != 0, dtype=np.uint8)
    probf = np.ascontiguousarray(prob, dtype=np.float32)
    h, w = img.shape
    ph, pw = probf.shape
    lib = _get_lib()
    labels = np.empty((h, w), dtype=np.int32)
    while True:
        counts = np.empty(cap + 1, dtype=np.int64)
        sums = np.empty(cap + 1, dtype=np.float64)
        bboxes = np.empty((cap + 1, 4), dtype=np.int32)
        moments = np.empty((cap + 1, 5), dtype=np.float64)
        n = lib.cc_analyze_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h,
            w,
            probf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ph,
            pw,
            stride,
            cap,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sums.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            moments.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if n == -2:  # more components than cap — grow and retry
            cap *= 4
            continue
        if n < 0:
            raise ValueError("cc_analyze_u8 failed")
        n = int(n)
        return (
            labels,
            n,
            counts[: n + 1],
            sums[: n + 1],
            bboxes[: n + 1],
            moments[: n + 1],
        )
