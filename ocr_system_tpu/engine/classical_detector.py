"""Classical (non-neural) text detection: threshold + morphology + CC.

The framework's third engine variant (the reference ships three
interchangeable OCR engines behind one seam — ocr_service.py + two backup
files; SURVEY §2.1 #9-11). This one pairs classical CV word detection with
the neural recognizer:

  grayscale -> adaptive threshold (ink mask) -> horizontal dilation merges
  characters into word blobs -> connected components (native C++ op) ->
  min-area rects -> size/aspect filtering

Runs entirely on host (cv2/numpy + native/cc_label) — no trained weights
needed, which makes it the deployment fallback when no DBNet checkpoint is
available, and the accuracy reference the trained detector must beat.
"""

from __future__ import annotations

import numpy as np

from ocr_system_tpu.core.config import Settings, get_settings
from ocr_system_tpu.engine.detector import (
    DetResult,
    MAX_DESKEW_DEG,
    MIN_DESKEW_DEG,
    _rotate_host,
)
from ocr_system_tpu.ops.boxes import DetectedBox


class ClassicalDetector:
    """Same detect_batch contract as engine.detector.Detector."""

    def __init__(self, settings: Settings | None = None):
        self.settings = settings or get_settings()

    def detect_batch(self, pages: list[np.ndarray]) -> list[DetResult]:
        return [self._detect_one(p) for p in pages]

    def _detect_one(self, page: np.ndarray) -> DetResult:
        angle = 0.0
        if self.settings.enable_deskew:
            est = _estimate_skew_host(page)
            if MIN_DESKEW_DEG <= abs(est) <= MAX_DESKEW_DEG:
                page = _rotate_host(page, est)
                angle = est
        mask = _ink_mask(page)
        # adapt the glyph-merging kernel to the page's actual char height:
        # inter-letter gaps scale with font size, not page width
        char_h = _estimate_char_height(mask)
        mask = _dilate_horizontal(mask, k=max(int(char_h * 0.6), 3))
        boxes = _components_to_boxes(
            mask,
            min_h=6,
            max_h=page.shape[0] // 3,
            max_boxes=self.settings.max_boxes_per_page,
        )
        return DetResult(boxes=boxes, skew_angle=angle, page=page)


def _ink_mask(page: np.ndarray) -> np.ndarray:
    gray = (
        0.299 * page[..., 0] + 0.587 * page[..., 1] + 0.114 * page[..., 2]
    ).astype(np.uint8)
    try:
        import cv2

        thresh = cv2.adaptiveThreshold(
            gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
            cv2.THRESH_BINARY_INV, 31, 15,
        )
        return (thresh > 0).astype(np.uint8)
    except ImportError:
        # numpy fallback: global Otsu-ish split
        t = gray.mean() - gray.std()
        return (gray < t).astype(np.uint8)


def _estimate_char_height(mask: np.ndarray) -> float:
    """Median connected-component height of glyph-sized blobs."""
    try:
        from ocr_system_tpu.native import cc_label

        labels, n = cc_label.label(mask)
        if n == 0:
            return 12.0
        _, _, bboxes = cc_label.stats(labels, mask.astype(np.float32), n)
        heights = (bboxes[1:, 3] - bboxes[1:, 1] + 1).astype(np.float32)
    except Exception:
        from scipy import ndimage

        labels, n = ndimage.label(mask, structure=np.ones((3, 3), int))
        if n == 0:
            return 12.0
        sl = ndimage.find_objects(labels)
        heights = np.array(
            [s[0].stop - s[0].start for s in sl if s is not None], np.float32
        )
    # glyphs: taller than speckle, shorter than rules/images
    glyph = heights[(heights >= 5) & (heights <= mask.shape[0] / 4)]
    return float(np.median(glyph)) if len(glyph) else 12.0


def _dilate_horizontal(mask: np.ndarray, k: int) -> np.ndarray:
    """Merge adjacent glyphs into word blobs with a (1, k) dilation."""
    try:
        import cv2

        kernel = np.ones((1, k), np.uint8)
        return cv2.dilate(mask, kernel, iterations=1)
    except ImportError:
        out = mask.copy()
        for s in range(1, k // 2 + 1):
            out[:, s:] |= mask[:, :-s]
            out[:, :-s] |= mask[:, s:]
        return out


def _components_to_boxes(
    mask: np.ndarray, min_h: int, max_h: int, max_boxes: int
) -> list[DetectedBox]:
    try:
        from ocr_system_tpu.native import cc_label

        labels, n = cc_label.label(mask)
        counts, _, bboxes = cc_label.stats(
            labels, mask.astype(np.float32), n
        )
    except Exception:
        from scipy import ndimage

        labels, n = ndimage.label(mask, structure=np.ones((3, 3), int))
        counts = np.bincount(labels.reshape(-1), minlength=n + 1)
        bboxes = np.zeros((n + 1, 4), np.int32)
        for comp in range(1, n + 1):
            ys, xs = np.nonzero(labels == comp)
            bboxes[comp] = [xs.min(), ys.min(), xs.max(), ys.max()]

    boxes: list[DetectedBox] = []
    for comp in range(1, n + 1):
        x0, y0, x1, y1 = bboxes[comp]
        w, h = x1 - x0 + 1, y1 - y0 + 1
        if h < min_h or h > max_h or w < 3:
            continue
        if counts[comp] < 0.15 * w * h:  # too sparse: ruling lines/noise
            continue
        pad = max(h // 6, 1)
        quad = np.array(
            [
                [x0 - pad, y0 - pad], [x1 + pad, y0 - pad],
                [x1 + pad, y1 + pad], [x0 - pad, y1 + pad],
            ],
            np.float32,
        )
        quad[:, 0] = np.clip(quad[:, 0], 0, mask.shape[1] - 1)
        quad[:, 1] = np.clip(quad[:, 1], 0, mask.shape[0] - 1)
        score = min(counts[comp] / (w * h) + 0.4, 0.95)
        boxes.append(DetectedBox(quad=quad, score=float(score)))
    boxes.sort(key=lambda b: -b.score)
    return boxes[:max_boxes]


def _estimate_skew_host(page: np.ndarray) -> float:
    """Host-side skew estimate via the same FFT shear projection as the
    device path (ops/image_ops.estimate_skew_angle), in numpy."""
    gray = (
        0.299 * page[..., 0] + 0.587 * page[..., 1] + 0.114 * page[..., 2]
    )
    n = 256
    try:
        import cv2

        small = cv2.resize(gray, (n, n))
    except ImportError:
        sy = max(gray.shape[0] // n, 1)
        sx = max(gray.shape[1] // n, 1)
        small = gray[::sy, ::sx][:n, :n]
        if small.shape != (n, n):
            return 0.0
    ink = (small < small.mean()).astype(np.float32)
    f = np.fft.fft(ink, axis=0)
    angles = np.linspace(-15, 15, 31)
    k = np.fft.fftfreq(n) * n
    x = np.arange(n) - (n - 1) / 2.0
    best, best_score = 0.0, -1.0
    for a in angles:
        phi = (-2.0 * np.pi / n) * np.tan(np.deg2rad(a)) * np.outer(k, x)
        g = (f * np.exp(1j * phi)).sum(axis=1)
        power = np.abs(g) ** 2
        score = power[1:].sum()
        if score > best_score:
            best, best_score = a, score
    return -best
