"""Long-document serving proof (VERDICT r4 #8 / SURVEY §5.7).

A 20+ page PDF goes through the REAL engine (first-party PDF rasterizer ->
scheduler -> det -> rec) and the chunked extraction map-reduce merge must
agree with the single-pass extraction."""

import numpy as np
import pytest

from ocr_system_tpu.engine.preprocess import load_document

N_PAGES = 24


def _long_pdf(n_pages: int = N_PAGES) -> bytes:
    from ocr_system_tpu.utils.pdf import PDFDocument

    doc = PDFDocument()
    for p in range(n_pages):
        pg = doc.add_page(612, 792)
        pg.text(72, 740, f"Page {p + 1} of {n_pages}", size=12)
        pg.text(72, 700, f"Invoice Number: INV-{p:04d}", size=14)
        pg.text(72, 670, f"Total Amount: {100 + p}.50", size=14)
        pg.text(72, 640, "Vendor: Acme Corp", size=14)
    return doc.to_bytes()


def test_pdf_rasterizes_all_pages():
    pages = load_document(_long_pdf(), "long.pdf", dpi=60)
    assert len(pages) == N_PAGES
    assert pages[0].pixels.ndim == 3
    assert [p.page_number for p in pages] == list(range(1, N_PAGES + 1))


@pytest.mark.slow
def test_24_page_pdf_through_real_engine(settings):
    """The serving contract holds at 24 pages: every page succeeds, pages
    keep their order/number, per-stage timings accumulate over waves."""
    from ocr_system_tpu.engine.classical_detector import ClassicalDetector
    from ocr_system_tpu.engine.pipeline import JaxOCREngine

    s = settings.model_copy(
        update={"det_batch_size": 8, "enable_handwriting_detection": False}
    )
    eng = JaxOCREngine(s, detector=ClassicalDetector(s))
    res = eng.process_document(_long_pdf(), "long.pdf")
    assert res.success
    assert res.total_pages == N_PAGES
    assert [p.page_number for p in res.pages] == list(range(1, N_PAGES + 1))
    assert all(p.success for p in res.pages)
    # the classical detector must find the printed rows on every page
    assert all(
        any(b["type"] == "word" for b in p.layout_boxes) for p in res.pages
    )
    assert res.stage_times_ms  # scheduler stage observability


@pytest.mark.slow
def test_chunked_merge_equals_single_pass(settings):
    """The SAME 24-page word-box stream extracted (a) with natural
    per-page windows and (b) through aggressively small chunked windows
    (max_len forced to 192, several chunks per page) must yield the same
    field set — the map-reduce merge loses nothing at boundaries and
    fabricates nothing from the overlap. Uses the committed extractor
    checkpoint (deterministic forward)."""
    import os

    if not os.path.isdir("checkpoints/extract"):
        pytest.skip("no committed extractor checkpoint")
    from ocr_system_tpu.core.config import Settings
    from ocr_system_tpu.extract.layout_model import LayoutModelExtractor

    s = Settings(
        storage_root=settings.storage_root,
        extract_checkpoint="checkpoints/extract",
    )
    word_boxes = []
    rng = np.random.default_rng(7)
    for p in range(1, N_PAGES + 1):
        rows = [
            (f"Invoice Number: INV-{p:04d}", 40),
            (f"Total Amount: {100 + p}.50", 80),
            ("Vendor: Acme Corp", 120),
        ]
        for text, y in rows:
            x = 40
            for w in text.split():
                wpx = 9 * len(w)
                word_boxes.append(
                    {
                        "type": "word",
                        "content": w,
                        "confidence": 0.98,
                        "polygon": [x, y, x + wpx, y, x + wpx, y + 16, x, y + 16],
                        "page_number": p,
                    }
                )
                x += wpx + 6
    lm = LayoutModelExtractor(s)
    single = lm.extract_from_layout(word_boxes, (612, 792))
    assert single.success

    lm_chunked = LayoutModelExtractor(s, params=lm.variables)
    lm_chunked.max_len = 192  # force the chunked map-reduce path
    chunked = lm_chunked.extract_from_layout(word_boxes, (612, 792))
    assert chunked.success

    def pairs(res):
        return {
            (f.field_key.lower(), f.field_value)
            for f in res.fields
            if f.field_key and f.field_value
        }

    sp, cp = pairs(single), pairs(chunked)
    # merged == single-pass: nothing lost at chunk boundaries, nothing
    # fabricated by the overlap dedup
    assert sp == cp, f"single-pass-only={sp - cp}  chunked-only={cp - sp}"
