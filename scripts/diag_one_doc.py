#!/usr/bin/env python
"""Deep-dump ONE doc from diag_extract_pipeline's sequence: truth pairs,
engine word boxes, handwriting boxes + pairing, extractor fields.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_one_doc.py \
    --doc 15 [--seed 4242]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--doc", type=int, required=True)
    p.add_argument("--seed", type=int, default=4242)
    p.add_argument("--save-png", default="")
    args = p.parse_args()

    import numpy as np

    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.engine.handwriting import handwriting_to_fields
    from ocr_system_tpu.engine.hybrid_detector import HybridDetector
    from ocr_system_tpu.engine.pipeline import JaxOCREngine
    from ocr_system_tpu.engine.preprocess import PageImage
    from ocr_system_tpu.engine.recognizer import Recognizer
    from ocr_system_tpu.extract.layout_model import LayoutModelExtractor
    from ocr_system_tpu.models.charsets import get_charset
    from ocr_system_tpu.training import synth_forms as SF

    st = Settings(
        rec_checkpoint="checkpoints/rec_latin",
        det_checkpoint="checkpoints/det",
        det_image_buckets=(960,),
        storage_root="storage",
    )
    engine = JaxOCREngine(
        st, detector=HybridDetector(st),
        recognizer=Recognizer(st, charset=get_charset("latin")),
    )
    lm = LayoutModelExtractor(Settings(
        extract_checkpoint="checkpoints/extract", storage_root="storage"))

    gen = SF.FormGenerator(seed=args.seed)
    spec = None
    for _ in range(args.doc + 1):
        spec = gen.generate(960)
    page = SF.render_spec(spec, augment=False)
    pixels = (page.image * 255).astype(np.uint8)
    if args.save_png:
        from PIL import Image

        Image.fromarray(pixels).save(args.save_png)
    print(f"=== doc {args.doc} form_type={spec.form_type}")
    print("--- truth pairs")
    for k, v, t in spec.pairs:
        print(f"  {k!r}: {v!r}  [{t}]")
    out = engine.process_pages([PageImage(pixels, 1)])[0]
    print("--- engine word boxes (x0,y0,x1,y1 text)")
    words = [b for b in out.layout_boxes if b.get("type") == "word"]
    for b in sorted(words, key=lambda b: (min(b["polygon"][1::2]) // 14,
                                          min(b["polygon"][0::2]))):
        x = b["polygon"][0::2]
        y = b["polygon"][1::2]
        print(f"  ({min(x):4.0f},{min(y):4.0f},{max(x):4.0f},{max(y):4.0f}) "
              f"c={b['confidence']:.2f} {b['content']!r}")
    hand = [b for b in out.layout_boxes if b.get("type") == "handwriting"]
    print("--- handwriting boxes")
    for b in hand:
        x = b["polygon"][0::2]
        y = b["polygon"][1::2]
        print(f"  ({min(x):4.0f},{min(y):4.0f},{max(x):4.0f},{max(y):4.0f})")
    print("--- handwriting_to_fields")
    for sf in handwriting_to_fields(hand, out.layout_boxes):
        print(f"  {sf['field_key']!r} -> {sf['field_value']!r} "
              f"kw={sf.get('keyword_label')} gap={sf.get('label_gap')}")
    result = lm.extract_from_layout(words, (960, 960), ocr_text=out.markdown)
    print("--- extractor fields")
    for f in result.fields:
        print(f"  {f.field_key!r}: {f.field_value!r} "
              f"({f.field_type}, {f.confidence:.2f})")
    print("--- markdown")
    print(out.markdown)


if __name__ == "__main__":
    main()
