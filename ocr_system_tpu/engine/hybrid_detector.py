"""Hybrid detection: neural DBNet ∪ classical CV, IoU-deduplicated.

The framework's third real engine variant (reference seam: three
interchangeable OCR engines, ocr_service.py + two backup files — SURVEY
§2.1 #9-11; the third reference engine is the Chandra VLM backup,
ocr_service_chandra_backup.py). The TPU-native third variant is an
ENSEMBLE: DBNet proposes boxes, the classical CV detector proposes boxes,
and the union (neural box wins any overlap ≥ IOU_DEDUP) goes to the shared
neural recognizer.

Why an ensemble instead of a third model: the two detectors fail
differently — DBNet misses text styles outside its training distribution,
classical CC merging misses low-contrast ink and over-merges tight columns.
Their union trades a little precision (recognition rejects junk crops
anyway: empty decodes score 0) for recall, which is the metric that loses
fields. `OCR_ENGINE=hybrid` selects it.
"""

from __future__ import annotations

import numpy as np

from ocr_system_tpu.core.config import Settings, get_settings
from ocr_system_tpu.engine.classical_detector import ClassicalDetector
from ocr_system_tpu.engine.detector import Detector, DetResult
from ocr_system_tpu.ops.boxes import DetectedBox

IOU_DEDUP = 0.5  # containment above this: keep the neural box only
# (same-word containment measures 0.8-1.0; different-word neighbors <0.3)


def _aabb(quad: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(quad[:, 0].min()), float(quad[:, 1].min()),
        float(quad[:, 0].max()), float(quad[:, 1].max()),
    )


def _iou(a, b) -> float:
    """Intersection over MIN area (containment), not classic IoU: the two
    detectors pad asymmetrically (neural 0.65h vs classical h/6), so the
    same word's boxes can score IoU < 0.4 while the classical box is
    almost fully inside the neural one — classic IoU let duplicates
    through and the double-recognized text inflated page CER 10x
    (measured: hybrid plain CER 0.56 vs classical-alone 0.057)."""
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    ix = max(min(ax1, bx1) - max(ax0, bx0), 0.0)
    iy = max(min(ay1, by1) - max(ay0, by0), 0.0)
    inter = ix * iy
    if inter <= 0:
        return 0.0
    area_a = (ax1 - ax0) * (ay1 - ay0)
    area_b = (bx1 - bx0) * (by1 - by0)
    return inter / max(min(area_a, area_b), 1e-6)


def merge_boxes(
    neural: list[DetectedBox], classical: list[DetectedBox],
    iou_thresh: float = IOU_DEDUP, max_boxes: int = 512,
) -> list[DetectedBox]:
    """Union with neural-wins dedup. Classical boxes survive only where the
    neural detector found nothing overlapping — exactly the recall holes the
    ensemble exists to fill."""
    out = list(neural)
    n_aabbs = [_aabb(b.quad) for b in neural]
    for cb in classical:
        ca = _aabb(cb.quad)
        if all(_iou(ca, na) < iou_thresh for na in n_aabbs):
            # mark provenance through a score ceiling: classical scores are
            # heuristic fill-ins, never outrank confident neural boxes
            out.append(DetectedBox(quad=cb.quad, score=min(cb.score, 0.6)))
    out.sort(key=lambda b: -b.score)
    return out[:max_boxes]


class HybridDetector:
    """Same detect_batch contract as engine.detector.Detector."""

    def __init__(self, settings: Settings | None = None):
        self.settings = settings or get_settings()
        self.neural = Detector(self.settings)
        self.classical = ClassicalDetector(self.settings)

    def detect_batch(self, pages: list[np.ndarray]) -> list[DetResult]:
        neural = self.neural.detect_batch(pages)
        # classical runs on the DESKEWED page the neural pass produced, so
        # both box sets live in the same coordinate frame
        classical = self.classical.detect_batch(
            [
                d.page if d.page is not None else p
                for d, p in zip(neural, pages)
            ]
        )
        out: list[DetResult] = []
        for nd, cd in zip(neural, classical):
            boxes = merge_boxes(
                nd.boxes, cd.boxes, max_boxes=self.settings.max_boxes_per_page
            )
            out.append(
                DetResult(
                    boxes=boxes,
                    skew_angle=nd.skew_angle,
                    page=nd.page,
                    prob_map=nd.prob_map,
                    canvas_stack=nd.canvas_stack,
                    canvas_row=nd.canvas_row,
                    canvas_scale=nd.canvas_scale,
                    gray=nd.gray,
                    cc=nd.cc,
                )
            )
        return out
