#!/usr/bin/env python
"""Canonical quality sweep: reproduces EVERY README quality-table row in one
process (shared compile cache) at serving defaults + committed checkpoints.

Usage:
  python scripts/sweep_quality.py                 # full table (~10 min warm)
  python scripts/sweep_quality.py --rows e2e,rec  # subset

Exists because hand-built eval Settings kept silently diverging from
serving defaults (an empty checkpoint path serves deterministic RANDOM
weights — that alone produced three garbage sweeps: det inside hybrid,
then the layout extractor twice). Every row here names its checkpoint
explicitly and fails loudly if one is missing.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from ocr_system_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

CKPTS = {
    "det": "checkpoints/det",
    "rec_latin": "checkpoints/rec_latin",
    "rec_devanagari": "checkpoints/rec_devanagari",
    "extract": "checkpoints/extract",
}


def _require(*names: str) -> None:
    missing = [n for n in names if not Path(CKPTS[n]).is_dir()]
    if missing:
        raise SystemExit(f"missing checkpoints: {missing} — train or fetch "
                         "them before sweeping (random init would lie)")


def _engine(detector: str, charset, rec_ckpt: str):
    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.engine.pipeline import JaxOCREngine
    from ocr_system_tpu.engine.recognizer import Recognizer

    st = Settings(
        rec_checkpoint=rec_ckpt,
        det_checkpoint=CKPTS["det"],
        det_image_buckets=(960,),
        storage_root="storage",
    )
    rec = Recognizer(st, charset=charset)
    if detector == "classical":
        from ocr_system_tpu.engine.classical_detector import ClassicalDetector

        return JaxOCREngine(st, detector=ClassicalDetector(st), recognizer=rec)
    if detector == "hybrid":
        from ocr_system_tpu.engine.hybrid_detector import HybridDetector

        return JaxOCREngine(st, detector=HybridDetector(st), recognizer=rec)
    return JaxOCREngine(st, recognizer=rec)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", default="rec,e2e,classical,hindi,extract,"
                                     "forms_e2e,signatures")
    p.add_argument("--pages", type=int, default=10)
    p.add_argument("--forms", type=int, default=25)
    p.add_argument("--forms-e2e", type=int, default=10)
    p.add_argument("--signatures", type=int, default=10)
    args = p.parse_args()
    rows = set(args.rows.split(","))

    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.models.charsets import get_charset
    from ocr_system_tpu.training import evaluate as E

    latin = get_charset("latin")
    deva = get_charset("devanagari")
    report: dict = {}

    def emit(key: str, value) -> None:
        report[key] = value
        print("ROW", key, json.dumps(value), flush=True)

    if "rec" in rows:
        _require("rec_latin", "rec_devanagari")
        from ocr_system_tpu.engine.recognizer import Recognizer

        for name, cs in (("rec_latin", latin), ("rec_devanagari", deva)):
            st = Settings(rec_checkpoint=CKPTS[name], storage_root="storage")
            r = E.evaluate_recognizer(Recognizer(st, charset=cs), cs)
            emit(name, {"cer": round(r.mean_cer, 4),
                        "exact": round(r.exact_match_rate, 4)})

    hybrid = None
    if rows & {"e2e", "hindi", "forms_e2e", "signatures"}:
        _require("det", "rec_latin", "rec_devanagari")
        hybrid = _engine("hybrid", latin, CKPTS["rec_latin"])

    if "e2e" in rows:
        r = E.evaluate_end_to_end(hybrid, latin, n_pages=args.pages)
        emit("e2e_hybrid", {
            "forms_cer": round(r.forms_page_cer, 4),
            "plain_cer": round(r.plain_page_cer, 4),
            "content_cer": round(r.content_page_cer, 4),
            "recall": round(r.line_recall, 4),
        })

    if "classical" in rows:
        _require("rec_latin")
        eng = _engine("classical", latin, CKPTS["rec_latin"])
        r = E.evaluate_end_to_end(eng, latin, n_pages=args.pages)
        emit("e2e_classical", {
            "forms_cer": round(r.forms_page_cer, 4),
            "plain_cer": round(r.plain_page_cer, 4),
            "recall": round(r.line_recall, 4),
        })

    if "hindi" in rows:
        # SERVING path: the latin-primary engine script-routes per crop —
        # one endpoint reads both scripts (Azure parity). Hindi pages carry
        # ASCII value lines, so a deva-primary engine is NOT the product.
        _require("det", "rec_latin", "rec_devanagari")
        r = E.evaluate_end_to_end(hybrid, deva, n_pages=args.pages)
        emit("e2e_hindi", {
            "page_cer": round(r.mean_page_cer, 4),
            "recall": round(r.line_recall, 4),
        })

    lm = None
    if rows & {"extract", "forms_e2e"}:
        _require("extract")
        from ocr_system_tpu.extract.layout_model import LayoutModelExtractor

        lm = LayoutModelExtractor(Settings(
            extract_checkpoint=CKPTS["extract"], storage_root="storage"))

    if "extract" in rows:
        from ocr_system_tpu.training.synth_forms_heldout import (
            HeldoutFormGenerator,
        )

        r = E.evaluate_form_extraction(lm, n_docs=args.forms)
        emit("extract_infamily", {
            "f1": round(r.f1, 4), "precision": round(r.precision, 4),
            "recall": round(r.recall, 4),
            "type_acc": round(r.form_type_accuracy, 4),
        })
        r = E.evaluate_form_extraction(
            lm, n_docs=args.forms, generator=HeldoutFormGenerator(seed=101))
        emit("extract_heldout", {
            "f1": round(r.f1, 4), "precision": round(r.precision, 4),
            "recall": round(r.recall, 4),
        })

    if "forms_e2e" in rows:
        emit("forms_e2e", E.evaluate_form_extraction_e2e(
            hybrid, lm, n_docs=args.forms_e2e))

    if "signatures" in rows:
        emit("signatures", E.evaluate_signature_detection(
            hybrid, n_docs=args.signatures))

    print("SWEEP", json.dumps(report))


if __name__ == "__main__":
    main()
