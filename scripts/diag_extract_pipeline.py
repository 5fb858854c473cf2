#!/usr/bin/env python
"""Diagnose pipeline-extraction losses (forms_e2e exact 0.58 / relaxed 0.76).

Mirrors training/evaluate.evaluate_form_extraction_e2e but prints every
non-exact pair with a category, so the exact->relaxed->box-fed losses are
attributable:

  KEY_NOISE   key near-match (cer<=0.25) but not exact -> rec noise on key
  VAL_NOISE   key exact, value near but not exact      -> rec noise on value
  PAIR_NOISE  both near, neither exact
  MISSING     truth pair with no near got-pair          -> det/extract loss
  SPURIOUS    got pair with no near truth-pair          -> merge/hallucination

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
    scripts/diag_extract_pipeline.py [--docs 10] [--seed 4242]
"""
from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=10)
    p.add_argument("--seed", type=int, default=4242)
    p.add_argument("--wire-bits", type=int, default=4,
                   help="det canvas wire depth (8 = no quantization); "
                        "A/B how much residual noise the 4-bit serving "
                        "wire contributes")
    args = p.parse_args()

    import numpy as np

    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.engine.handwriting import (
        handwriting_to_fields,
        squiggle_overrides,
    )
    from ocr_system_tpu.engine.hybrid_detector import HybridDetector
    from ocr_system_tpu.engine.pipeline import JaxOCREngine
    from ocr_system_tpu.engine.preprocess import PageImage
    from ocr_system_tpu.engine.recognizer import Recognizer
    from ocr_system_tpu.extract.layout_model import LayoutModelExtractor
    from ocr_system_tpu.models.charsets import get_charset
    from ocr_system_tpu.training import synth_forms as SF
    from ocr_system_tpu.training.evaluate import _norm_key, _norm_val, cer

    st = Settings(
        rec_checkpoint="checkpoints/rec_latin",
        det_checkpoint="checkpoints/det",
        det_image_buckets=(960,),
        storage_root="storage",
        det_wire_bits=args.wire_bits,
    )
    engine = JaxOCREngine(
        st, detector=HybridDetector(st),
        recognizer=Recognizer(st, charset=get_charset("latin")),
    )
    lm = LayoutModelExtractor(Settings(
        extract_checkpoint="checkpoints/extract", storage_root="storage"))

    gen = SF.FormGenerator(seed=args.seed)
    cats: Counter = Counter()
    for di in range(args.docs):
        spec = gen.generate(960)
        page = SF.render_spec(spec, augment=False)
        pixels = (page.image * 255).astype(np.uint8)
        out = engine.process_pages([PageImage(pixels, 1)])[0]
        words = [b for b in out.layout_boxes if b.get("type") == "word"]
        result = lm.extract_from_layout(
            words, (960, 960), ocr_text=out.markdown)
        got = {
            _norm_key(f.field_key): _norm_val(f.field_value)
            for f in result.fields
            if f.field_key.strip() and f.field_value.strip()
        }
        hand = [b for b in out.layout_boxes if b.get("type") == "handwriting"]
        for sf in handwriting_to_fields(hand, out.layout_boxes):
            k = _norm_key(sf["field_key"])
            if squiggle_overrides(sf, got.get(k), other_keys=set(got)):
                got[k] = _norm_val(sf["field_value"])
        truth = {
            _norm_key(k): _norm_val(v)
            for i, (k, v, _) in enumerate(spec.pairs)
            if v.strip() and i not in spec.dropped_pair_ids
        }

        matched_g = set()
        print(f"--- doc {di} ({spec.form_type}) "
              f"truth={len(truth)} got={len(got)}")
        for k, v in truth.items():
            if got.get(k) == v:
                matched_g.add(k)
                cats["EXACT"] += 1
                continue
            hit = None
            for gk, gv in got.items():
                if gk in matched_g:
                    continue
                if cer(k, gk) <= 0.25 and cer(v, gv) <= 0.25:
                    hit = gk
                    break
            if hit is None:
                cats["MISSING"] += 1
                print(f"  MISSING    {k!r}: {v!r}")
                continue
            matched_g.add(hit)
            gv = got[hit]
            if hit != k and gv != v:
                cats["PAIR_NOISE"] += 1
                print(f"  PAIR_NOISE {k!r}->{hit!r} | {v!r}->{gv!r}")
            elif hit != k:
                cats["KEY_NOISE"] += 1
                print(f"  KEY_NOISE  {k!r}->{hit!r} (val ok: {v!r})")
            else:
                cats["VAL_NOISE"] += 1
                print(f"  VAL_NOISE  {k!r}: {v!r}->{gv!r}")
        for gk, gv in got.items():
            if gk not in matched_g:
                cats["SPURIOUS"] += 1
                print(f"  SPURIOUS   {gk!r}: {gv!r}")

    total_truth = cats["EXACT"] + cats["MISSING"] + cats["KEY_NOISE"] + \
        cats["VAL_NOISE"] + cats["PAIR_NOISE"]
    print("\n=== categories ===")
    for c, n in cats.most_common():
        print(f"  {c:10s} {n:4d}  ({n / max(total_truth, 1):.2%} of truth)")


if __name__ == "__main__":
    main()
