"""Selection-mark (checkbox) detection tests (Azure parity:
reference ocr_service.py:314-321 selection_marks with selected/unselected
state feeding the checkbox validator)."""

import numpy as np
import pytest
from PIL import Image, ImageDraw

from ocr_system_tpu.engine.selection_marks import (
    detect_selection_marks,
    filter_marks_against_words,
    marks_to_fields,
)


def render_checkbox_page(checked=(True, False), size=(500, 300)):
    """White page with one checkbox per entry at y=60, 120, ... plus a text
    label to the right of each."""
    img = Image.new("RGB", size, "white")
    d = ImageDraw.Draw(img)
    boxes = []
    for i, is_checked in enumerate(checked):
        x0, y0 = 40, 50 + i * 60
        x1, y1 = x0 + 22, y0 + 22
        d.rectangle([x0, y0, x1, y1], outline="black", width=2)
        if is_checked:
            d.line([x0 + 4, y0 + 4, x1 - 4, y1 - 4], fill="black", width=3)
            d.line([x0 + 4, y1 - 4, x1 - 4, y0 + 4], fill="black", width=3)
        d.text((x1 + 14, y0 + 2), f"Option{i}", fill="black")
        boxes.append((x0, y0, x1, y1))
    return np.asarray(img, np.uint8), boxes


class TestDetect:
    def test_finds_checked_and_unchecked(self):
        page, truth = render_checkbox_page((True, False))
        marks = detect_selection_marks(page, page_number=3)
        assert len(marks) == 2
        marks.sort(key=lambda m: m["polygon"][1])
        assert marks[0]["state"] == "selected"
        assert marks[1]["state"] == "unselected"
        for m, (x0, y0, x1, y1) in zip(marks, truth):
            assert m["type"] == "selection_mark"
            assert m["page_number"] == 3
            assert abs(m["polygon"][0] - x0) <= 3
            assert abs(m["polygon"][1] - y0) <= 3
            assert 0.5 <= m["confidence"] <= 1.0

    def test_ignores_text_and_lines(self):
        img = Image.new("RGB", (400, 200), "white")
        d = ImageDraw.Draw(img)
        d.text((30, 40), "Ordinary text with OO and DD glyphs", fill="black")
        d.line([20, 120, 380, 120], fill="black", width=2)  # ruling line
        d.rectangle([10, 10, 390, 190], outline="black", width=1)  # frame
        marks = detect_selection_marks(np.asarray(img, np.uint8))
        assert marks == []

    def test_solid_bullet_rejected(self):
        img = Image.new("RGB", (200, 100), "white")
        d = ImageDraw.Draw(img)
        d.rectangle([40, 40, 58, 58], fill="black")  # solid square bullet
        marks = detect_selection_marks(np.asarray(img, np.uint8))
        assert marks == []

    def test_grayscale_input(self):
        page, _ = render_checkbox_page((True,))
        gray = np.asarray(Image.fromarray(page).convert("L"), np.uint8)
        marks = detect_selection_marks(gray)
        assert len(marks) == 1 and marks[0]["state"] == "selected"


class TestFilter:
    def test_marks_inside_text_words_dropped(self):
        mark = {
            "type": "selection_mark", "state": "selected", "content": "",
            "confidence": 0.9, "page_number": 1,
            "polygon": [100.0, 50.0, 120.0, 50.0, 120.0, 70.0, 100.0, 70.0],
        }
        covering_word = {
            "type": "word", "content": "DOOR", "confidence": 0.9,
            "polygon": [90.0, 45.0, 180.0, 45.0, 180.0, 75.0, 90.0, 75.0],
            "page_number": 1,
        }
        assert filter_marks_against_words([mark], [covering_word]) == []
        far_word = dict(covering_word, polygon=[300.0, 45.0, 380.0, 45.0,
                                                380.0, 75.0, 300.0, 75.0])
        assert filter_marks_against_words([mark], [far_word]) == [mark]


class TestFields:
    def _word(self, text, x0, y0, x1, y1):
        return {
            "type": "word", "content": text, "confidence": 0.95,
            "polygon": [float(x0), float(y0), float(x1), float(y0),
                        float(x1), float(y1), float(x0), float(y1)],
            "page_number": 1,
        }

    def test_right_label_pairing(self):
        mark = {
            "type": "selection_mark", "state": "selected", "content": "",
            "confidence": 0.9, "page_number": 1,
            "polygon": [40.0, 50.0, 62.0, 50.0, 62.0, 72.0, 40.0, 72.0],
        }
        words = [
            self._word("Married", 75, 52, 140, 70),
            self._word("Unrelated", 75, 150, 160, 168),
        ]
        fields = marks_to_fields([mark], words)
        assert len(fields) == 1
        assert fields[0]["field_key"] == "Married"
        assert fields[0]["field_value"] == "yes"
        assert fields[0]["field_type"] == "checkbox"

    def test_unselected_is_no_and_multiword_label(self):
        mark = {
            "type": "selection_mark", "state": "unselected", "content": "",
            "confidence": 0.9, "page_number": 1,
            "polygon": [40.0, 50.0, 62.0, 50.0, 62.0, 72.0, 40.0, 72.0],
        }
        words = [
            self._word("Home", 75, 52, 120, 70),
            self._word("Owner:", 128, 52, 180, 70),
        ]
        fields = marks_to_fields([mark], words)
        assert fields[0]["field_key"] == "Home Owner"
        assert fields[0]["field_value"] == "no"

    def test_unlabeled_mark_skipped(self):
        mark = {
            "type": "selection_mark", "state": "selected", "content": "",
            "confidence": 0.9, "page_number": 1,
            "polygon": [40.0, 50.0, 62.0, 50.0, 62.0, 72.0, 40.0, 72.0],
        }
        assert marks_to_fields([mark], []) == []


class TestOrchestratorMerge:
    def test_checked_box_becomes_checkbox_field(self, tmp_path, settings,
                                                form_png):
        """E2E (service level): a selection_mark in the OCR layout surfaces
        as a validated checkbox field in the saved extraction."""
        from ocr_system_tpu.db.connection import Database
        from ocr_system_tpu.engine.pipeline import FakeOCREngine
        from ocr_system_tpu.extract.rules import RuleExtractor
        from ocr_system_tpu.service.orchestrator import ExtractionOrchestrator

        class MarkedFakeEngine(FakeOCREngine):
            def process_document(self, data, filename):
                res = super().process_document(data, filename)
                for page in res.pages:
                    page.layout_boxes.append(
                        {
                            "type": "selection_mark", "state": "selected",
                            "content": "", "confidence": 0.91,
                            "polygon": [320.0, 8.0, 340.0, 8.0,
                                        340.0, 28.0, 320.0, 28.0],
                            "page_number": page.page_number,
                        }
                    )
                    # the fake engine's words sit at y=10..30 — same row
                return res

        db = Database(tmp_path / "cb.db")
        o = ExtractionOrchestrator(
            settings=settings, db=db,
            engine=MarkedFakeEngine(settings, text="Subscribed"),
            extractor=RuleExtractor(),
        )
        path = tmp_path / "form.png"
        path.write_bytes(form_png)
        doc = o.repos.documents.create(
            filename="doc_cb.png", original_filename="form.png",
            file_path=str(path), file_size=len(form_png), file_type="png",
        )
        ext = o.extract_document(doc["id"])
        fields = o.repos.fields.list_for_extraction(ext["id"])
        cb = [f for f in fields if f["field_type"] == "checkbox"]
        assert cb, f"no checkbox field in {[f['field_key'] for f in fields]}"
        assert cb[0]["field_key"] == "Subscribed"
        assert cb[0]["field_value"] == "yes"
        db.close()
