#!/usr/bin/env python
"""Evaluate OCR + extraction quality. Prints a JSON report.

Usage:
  python scripts/evaluate.py --rec-checkpoint checkpoints/rec_latin
  python scripts/evaluate.py --charset devanagari ...
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from ocr_system_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main() -> None:
    def _default_ckpt(path: str) -> str:
        # empty -> deterministic RANDOM init (core/checkpoint.init_or_load),
        # which silently produced garbage e2e sweeps once; default to the
        # committed checkpoints when they exist
        return path if Path(path).is_dir() else ""

    p = argparse.ArgumentParser()
    p.add_argument("--rec-checkpoint", default="")
    p.add_argument(
        "--det-checkpoint", default=_default_ckpt("checkpoints/det")
    )
    p.add_argument("--charset", default="latin")
    p.add_argument("--lines", type=int, default=100)
    p.add_argument("--docs", type=int, default=20)
    p.add_argument(
        "--e2e", default="",
        help="run full-pipeline eval: 'jax', 'classical', or 'hybrid'",
    )
    p.add_argument("--pages", type=int, default=10)
    p.add_argument(
        "--forms", type=int, default=0,
        help="compare rules vs layout model on N noisy synthetic forms",
    )
    p.add_argument("--form-noise", type=float, default=0.03)
    p.add_argument(
        "--forms-heldout", type=int, default=0,
        help="also eval on N out-of-family forms (disjoint layout family)",
    )
    p.add_argument(
        "--signatures", type=int, default=0,
        help="e2e signature-detection eval on N squiggle forms "
             "(requires --e2e engine)",
    )
    p.add_argument(
        "--forms-e2e", type=int, default=0,
        help="field-extraction F1 through the REAL OCR pipeline on N "
             "forms (requires --e2e engine)",
    )
    p.add_argument("--extract-checkpoint", default="checkpoints/extract")
    args = p.parse_args()
    if not args.rec_checkpoint:
        args.rec_checkpoint = _default_ckpt(f"checkpoints/rec_{args.charset}")

    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.engine.recognizer import Recognizer
    from ocr_system_tpu.extract.rules import RuleExtractor
    from ocr_system_tpu.models.charsets import get_charset
    from ocr_system_tpu.training.evaluate import (
        evaluate_field_extraction,
        evaluate_recognizer,
    )

    settings = Settings(
        rec_checkpoint=args.rec_checkpoint,
        det_checkpoint=args.det_checkpoint,
        rec_width_buckets=(320,),
        storage_root="storage",
    )
    charset = get_charset(args.charset)
    rec = Recognizer(settings, charset=charset)
    rec_result = evaluate_recognizer(rec, charset, n_lines=args.lines)
    field_result = evaluate_field_extraction(RuleExtractor(), n_docs=args.docs)

    forms_report = None
    if args.forms:
        from ocr_system_tpu.training.evaluate import evaluate_form_extraction

        def _report(res):
            return {
                "precision": round(res.precision, 4),
                "recall": round(res.recall, 4),
                "f1": round(res.f1, 4),
                "form_type_accuracy": round(res.form_type_accuracy, 4),
            }

        forms_report = {
            "n_docs": args.forms,
            "noise_rate": args.form_noise,
            "rules": _report(
                evaluate_form_extraction(
                    RuleExtractor(), n_docs=args.forms,
                    noise_rate=args.form_noise,
                )
            ),
        }
        if Path(args.extract_checkpoint).is_dir():
            from ocr_system_tpu.extract.layout_model import LayoutModelExtractor

            lm = LayoutModelExtractor(
                Settings(
                    extract_checkpoint=args.extract_checkpoint,
                    storage_root="storage",
                )
            )
            forms_report["layout_model"] = _report(
                evaluate_form_extraction(
                    lm, n_docs=args.forms, noise_rate=args.form_noise
                )
            )

    heldout_report = None
    if args.forms_heldout:
        from ocr_system_tpu.training.evaluate import evaluate_form_extraction
        from ocr_system_tpu.training.synth_forms_heldout import (
            HeldoutFormGenerator,
        )

        def _ho(extractor, seed):
            res = evaluate_form_extraction(
                extractor, n_docs=args.forms_heldout,
                noise_rate=args.form_noise,
                generator=HeldoutFormGenerator(seed=seed),
            )
            # form types here are outside the trained label set by design;
            # form_type accuracy is not meaningful for this family
            return {
                "precision": round(res.precision, 4),
                "recall": round(res.recall, 4),
                "f1": round(res.f1, 4),
            }

        heldout_report = {
            "n_docs": args.forms_heldout,
            "noise_rate": args.form_noise,
            "rules": _ho(RuleExtractor(), 101),
        }
        if Path(args.extract_checkpoint).is_dir():
            from ocr_system_tpu.extract.layout_model import LayoutModelExtractor

            lm2 = LayoutModelExtractor(
                Settings(
                    extract_checkpoint=args.extract_checkpoint,
                    storage_root="storage",
                )
            )
            heldout_report["layout_model"] = _ho(lm2, 101)

    e2e_report = None
    if args.e2e:
        from ocr_system_tpu.engine.pipeline import JaxOCREngine
        from ocr_system_tpu.training.evaluate import evaluate_end_to_end

        e2e_settings = Settings(
            rec_checkpoint=args.rec_checkpoint,
            det_checkpoint=args.det_checkpoint,
            rec_width_buckets=(80, 160, 320, 640),
            det_image_buckets=(960,),
            storage_root="storage",
        )
        if args.e2e == "classical":
            from ocr_system_tpu.engine.classical_detector import ClassicalDetector

            engine = JaxOCREngine(
                e2e_settings, detector=ClassicalDetector(e2e_settings),
                recognizer=Recognizer(e2e_settings, charset=charset),
            )
        elif args.e2e == "hybrid":
            from ocr_system_tpu.engine.hybrid_detector import HybridDetector

            engine = JaxOCREngine(
                e2e_settings, detector=HybridDetector(e2e_settings),
                recognizer=Recognizer(e2e_settings, charset=charset),
            )
        else:
            engine = JaxOCREngine(
                e2e_settings,
                recognizer=Recognizer(e2e_settings, charset=charset),
            )
        r = evaluate_end_to_end(engine, charset, n_pages=args.pages)
        e2e_report = {
            "engine": args.e2e,
            "n_pages": r.n_pages,
            "mean_page_cer": round(r.mean_page_cer, 4),
            "line_recall": round(r.line_recall, 4),
            "forms_page_cer": round(r.forms_page_cer, 4),
            "plain_page_cer": round(r.plain_page_cer, 4),
        }
        if args.signatures:
            from ocr_system_tpu.training.evaluate import (
                evaluate_signature_detection,
            )

            e2e_report["signatures"] = evaluate_signature_detection(
                engine, n_docs=args.signatures
            )
        if args.forms_e2e:
            from ocr_system_tpu.extract.layout_model import (
                LayoutModelExtractor,
            )
            from ocr_system_tpu.training.evaluate import (
                evaluate_form_extraction_e2e,
            )

            lm_e2e = LayoutModelExtractor(
                Settings(
                    extract_checkpoint=args.extract_checkpoint,
                    storage_root="storage",
                )
            )
            e2e_report["form_extraction_e2e"] = evaluate_form_extraction_e2e(
                engine, lm_e2e, n_docs=args.forms_e2e
            )

    print(
        json.dumps(
            {
                "recognizer": {
                    "checkpoint": args.rec_checkpoint or "(random init)",
                    "charset": args.charset,
                    "n_lines": rec_result.n_lines,
                    "mean_cer": round(rec_result.mean_cer, 4),
                    "exact_match_rate": round(rec_result.exact_match_rate, 4),
                    "samples": rec_result.samples,
                },
                "field_extraction": {
                    "precision": round(field_result.precision, 4),
                    "recall": round(field_result.recall, 4),
                    "f1": round(field_result.f1, 4),
                    "n_docs": field_result.n_docs,
                },
                "form_extraction": forms_report,
                "form_extraction_heldout_family": heldout_report,
                "end_to_end": e2e_report,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
