#!/usr/bin/env python
"""Line-level Hindi e2e diagnosis: worst rows of the e2e_hindi sweep metric.

Mirrors evaluate_end_to_end's hindi configuration but prints every truth
row whose best engine match is poor, so page-CER losses are attributable
(misread / missing / merged / extra).

Usage: python scripts/diag_hindi.py [--pages 20] [--seed 5555]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from ocr_system_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", type=int, default=20)
    p.add_argument("--seed", type=int, default=5555)
    p.add_argument("--deva-ckpt", default="checkpoints/rec_devanagari")
    args = p.parse_args()

    import numpy as np

    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.engine.hybrid_detector import HybridDetector
    from ocr_system_tpu.engine.pipeline import JaxOCREngine
    from ocr_system_tpu.engine.preprocess import PageImage
    from ocr_system_tpu.engine.reading_order import canonicalize_leaders
    from ocr_system_tpu.engine.recognizer import Recognizer
    from ocr_system_tpu.models.charsets import get_charset
    from ocr_system_tpu.training.evaluate import (
        _cluster_rows,
        _truth_charset,
        cer,
        infix_cer,
    )
    from ocr_system_tpu.training.synth import TextRenderer

    latin = get_charset("latin")
    deva = get_charset("devanagari")
    st = Settings(
        rec_checkpoint="checkpoints/rec_latin",
        rec_checkpoint_devanagari=args.deva_ckpt,
        det_checkpoint="checkpoints/det",
        det_image_buckets=(960,),
        storage_root="storage",
    )
    engine = JaxOCREngine(
        st, detector=HybridDetector(st),
        recognizer=Recognizer(st, charset=latin),
    )
    renderer = TextRenderer(deva, seed=args.seed)
    truth_charset = _truth_charset(engine, deva)

    page_rows = []
    for i in range(args.pages):
        page = renderer.render_page(size=960, augment=False)
        out = engine.process_pages(
            [PageImage((page.image * 255).astype(np.uint8), 1)]
        )[0]
        texts = [
            truth_charset.decode(truth_charset.encode(t)) for t in page.texts
        ]
        truth_rows = [
            canonicalize_leaders(t) for t in _cluster_rows(page.quads, texts)
        ]
        pc = cer("\n".join(truth_rows), out.markdown)
        got = out.markdown.splitlines()
        bad = []
        for t in truth_rows:
            best = min(
                (min(cer(t, g), infix_cer(t, g)), g) for g in got
            ) if got else (1.0, "")
            if best[0] >= 0.15:
                bad.append((round(best[0], 2), t, best[1]))
        page_rows.append((pc, i, bad, len(truth_rows)))

    page_rows.sort(reverse=True)
    total_bad = sum(len(b) for _, _, b, _ in page_rows)
    print(f"mean page CER {np.mean([p for p, *_ in page_rows]):.4f}  "
          f"bad rows {total_bad}")
    for pc, i, bad, n in page_rows[:8]:
        print(f"\npage {i}: CER {pc:.3f} ({len(bad)}/{n} bad rows)")
        for c, t, g in bad[:6]:
            print(f"  [{c}] truth: {t[:70]!r}")
            print(f"        got:  {g[:70]!r}")


if __name__ == "__main__":
    main()
