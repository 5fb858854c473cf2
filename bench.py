"""Benchmark: OCR page throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "pages_per_sec_per_chip", "value": N, "unit": "pages/s",
   "vs_baseline": R}

The measured path is the full per-page device pipeline at 300-DPI-class
resolution: on-device preprocessing (deskew estimate + enhancement +
normalization) -> DBNet detection forward -> box extraction (host) ->
on-device crop+rectify of 64 text regions -> SVTR recognition + CTC decode.
That is everything the engine does per page except file codec I/O.

Baseline: the reference's only local-engine figure — PaddleOCR-VL at
2-3 s/page on GPU (ocr_service_paddleocr_backup.py:119) -> 0.4 pages/s
midpoint. vs_baseline = ours / 0.4.
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_PAGES_PER_SEC = 0.4  # PaddleOCR-VL GPU midpoint (2.5 s/page)


def make_page(size: int = 960, seed: int = 0) -> np.ndarray:
    """Synthetic 300-DPI-class form page with text-like bars."""
    rng = np.random.default_rng(seed)
    img = np.full((size, size, 3), 245, np.uint8)
    for y in range(40, size - 40, 36):
        w = int(rng.integers(size // 4, size - 80))
        x = int(rng.integers(20, 60))
        img[y : y + 14, x : x + w] = rng.integers(0, 60)
    return img


def main() -> None:
    import jax

    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.engine.detector import Detector
    from ocr_system_tpu.engine.recognizer import Recognizer

    size = 960
    batch = 8
    n_crops = 64

    settings = Settings(
        det_image_buckets=(size,),
        rec_width_buckets=(160,),
        rec_batch_size=n_crops,
        enable_deskew=True,
        enable_contrast_enhancement=True,
        storage_root="storage",
    )
    det = Detector(settings)
    rec = Recognizer(settings)

    pages = [make_page(size, seed=i) for i in range(batch)]
    quads = np.zeros((n_crops, 4, 2), np.float32)
    rng = np.random.default_rng(0)
    for i in range(n_crops):
        x0 = float(rng.integers(20, size - 300))
        y0 = float(rng.integers(20, size - 60))
        w, h = float(rng.integers(80, 280)), 20.0
        quads[i] = [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]

    quads_list = [quads] * batch

    # warmup (compile)
    det.detect_batch(pages)
    rec.recognize_pages(pages, quads_list)

    # timed runs
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        det.detect_batch(pages)
        rec.recognize_pages(pages, quads_list)
    elapsed = time.perf_counter() - t0
    total_pages = n_iters * batch
    pages_per_sec = total_pages / elapsed

    n_chips = max(len(jax.devices()), 1)
    value = pages_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "pages_per_sec_per_chip",
                "value": round(value, 3),
                "unit": "pages/s",
                "vs_baseline": round(value / BASELINE_PAGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
