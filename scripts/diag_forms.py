#!/usr/bin/env python
"""Diagnose forms e2e loss: per-page truth rows vs engine output, with
per-row best-match CER so det misses vs rec errors are attributable.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_forms.py \
    [--engine hybrid] [--pages 5] [--seed 5555]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--engine", default="hybrid")
    p.add_argument("--pages", type=int, default=5)
    p.add_argument("--seed", type=int, default=5555)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--rec-checkpoint", default="checkpoints/rec_latin")
    p.add_argument("--det-checkpoint", default="checkpoints/det")
    args = p.parse_args()

    import numpy as np

    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.engine.pipeline import JaxOCREngine
    from ocr_system_tpu.engine.preprocess import PageImage
    from ocr_system_tpu.engine.recognizer import Recognizer
    from ocr_system_tpu.models.charsets import get_charset
    from ocr_system_tpu.training import synth_forms as SF
    from ocr_system_tpu.training.evaluate import _cluster_rows, cer, infix_cer

    charset = get_charset("latin")
    settings = Settings(
        rec_checkpoint=args.rec_checkpoint,
        det_checkpoint=args.det_checkpoint,
        rec_width_buckets=(80, 160, 320, 640),
        det_image_buckets=(960,),
        storage_root="storage",
    )
    if args.engine == "classical":
        from ocr_system_tpu.engine.classical_detector import ClassicalDetector

        engine = JaxOCREngine(
            settings, detector=ClassicalDetector(settings),
            recognizer=Recognizer(settings, charset=charset),
        )
    elif args.engine == "hybrid":
        from ocr_system_tpu.engine.hybrid_detector import HybridDetector

        engine = JaxOCREngine(
            settings, detector=HybridDetector(settings),
            recognizer=Recognizer(settings, charset=charset),
        )
    else:
        engine = JaxOCREngine(
            settings, recognizer=Recognizer(settings, charset=charset),
        )

    form_gen = SF.FormGenerator(seed=args.seed + 1)
    for i in range(args.pages):
        page = SF.render_spec(form_gen.generate(args.size), augment=False)
        out = engine.process_pages(
            [PageImage((page.image * 255).astype(np.uint8), 1)]
        )[0]
        texts = [charset.decode(charset.encode(t)) for t in page.texts]
        truth_rows = _cluster_rows(page.quads, texts)
        got_lines = out.markdown.splitlines()
        page_cer = cer("\n".join(truth_rows), out.markdown)
        print(f"\n=== form page {i}  page_cer={page_cer:.3f} "
              f"truth_rows={len(truth_rows)} got_lines={len(got_lines)}")
        for t in truth_rows:
            best, bg = 9.9, ""
            for g in got_lines:
                c = min(cer(t, g), infix_cer(t, g))
                if c < best:
                    best, bg = c, g
            flag = "MISS" if best >= 0.3 else ("ok  " if best < 0.05 else "err ")
            print(f"  [{flag} {best:4.2f}] T: {t[:76]!r}")
            if best >= 0.05:
                print(f"             G: {bg[:76]!r}")
        extra = [
            g for g in got_lines
            if all(min(cer(t, g), infix_cer(t, g)) >= 0.5 for t in truth_rows)
        ]
        for g in extra:
            print(f"  [HALLUC   ] G: {g[:76]!r}")


if __name__ == "__main__":
    main()
