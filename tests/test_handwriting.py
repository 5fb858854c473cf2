"""Handwriting/signature detection tests (BASELINE config 4: the reference
extracts signature presence via Gemini's view of the page pixels;
the rebuild detects it geometrically — engine/handwriting.py)."""

import numpy as np
import pytest

from ocr_system_tpu.engine.handwriting import (
    detect_handwriting,
    handwriting_to_fields,
    squiggle_overrides,
)
from ocr_system_tpu.training import synth_forms as SF


def make_signature_spec(size=640):
    """Minimal spec: a 'Signature' key and a squiggle value on one row,
    plus a normal text pair above."""
    elements = [
        SF.Element("Name: John Smith", 40.0, 80.0, 240.0, 102.0, "kv",
                   "name", 0, 18),
        SF.Element("Signature", 40.0, 200.0, 150.0, 222.0, "key",
                   "signature", 1, 18),
        SF.Element("signed", 170.0, 196.0, 380.0, 226.0, "value",
                   "signature", 1, 18),
    ]
    return SF.FormSpec(
        size=size, elements=elements, form_type="Application Form",
        pairs=[("Name", "John Smith", "name"),
               ("Signature", "signed", "signature")],
    )


@pytest.fixture(scope="module")
def rendered():
    spec = make_signature_spec()
    page = SF.render_spec(spec, augment=False)
    pixels = (page.image * 255).astype(np.uint8)
    return spec, page, pixels


class TestRender:
    def test_squiggle_drawn_not_text(self, rendered):
        spec, page, pixels = rendered
        # squiggle excluded from det truth quads/texts
        assert "signed" not in page.texts
        # but ink exists in the squiggle region
        e = spec.elements[2]
        region = pixels[int(e.y0): int(e.y1) + 1,
                        int(e.x0): int(e.x1) + 1]
        assert (region < 128).sum() > 50

    def test_ocr_text_omits_squiggle(self):
        spec = make_signature_spec()
        text = SF.spec_ocr_text(spec)
        assert "signed" not in text
        assert "Signature" in text

    def test_word_boxes_carry_handwriting_box(self):
        spec = make_signature_spec()
        boxes = SF.spec_to_word_boxes(spec)
        hw = [b for b in boxes if b["type"] == "handwriting"]
        assert len(hw) == 1
        assert hw[0]["content"] == ""


class TestDetect:
    def test_squiggle_found(self, rendered):
        spec, page, pixels = rendered
        word_boxes = [
            b for b in SF.spec_to_word_boxes(spec) if b["type"] == "word"
        ]
        marks = detect_handwriting(pixels, word_boxes)
        assert marks, "squiggle not detected"
        e = spec.elements[2]
        mx = marks[0]["polygon"][0::2]
        my = marks[0]["polygon"][1::2]
        # overlaps the drawn squiggle region
        assert min(mx) < e.x1 and max(mx) > e.x0
        assert min(my) < e.y1 and max(my) > e.y0

    def test_plain_text_page_clean(self):
        from PIL import Image, ImageDraw, ImageFont

        img = Image.new("RGB", (640, 480), "white")
        d = ImageDraw.Draw(img)
        f = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 20
        )
        words = []
        for i, line in enumerate(
            ["Invoice Number 12345", "Total Amount $99.50",
             "Date 15/01/2024"]
        ):
            y = 60 + i * 60
            bbox = d.textbbox((40, y), line, font=f)
            d.text((40, y), line, fill="black", font=f)
            words.append(
                {"type": "word", "content": line, "confidence": 0.95,
                 "polygon": [float(bbox[0]), float(bbox[1]),
                             float(bbox[2]), float(bbox[1]),
                             float(bbox[2]), float(bbox[3]),
                             float(bbox[0]), float(bbox[3])],
                 "page_number": 1}
            )
        marks = detect_handwriting(np.asarray(img, np.uint8), words)
        assert marks == []

    def test_table_grid_rejected(self):
        from PIL import Image, ImageDraw

        img = Image.new("RGB", (640, 480), "white")
        d = ImageDraw.Draw(img)
        for r in range(4):
            d.line([(50, 100 + r * 40), (550, 100 + r * 40)],
                   fill="black", width=1)
        for c in range(5):
            d.line([(50 + c * 125, 100), (50 + c * 125, 220)],
                   fill="black", width=1)
        marks = detect_handwriting(np.asarray(img, np.uint8), [])
        assert marks == []


class TestFields:
    def test_signature_label_pairs(self, rendered):
        spec, page, pixels = rendered
        all_boxes = SF.spec_to_word_boxes(spec)
        hand = [b for b in all_boxes if b["type"] == "handwriting"]
        fields = handwriting_to_fields(hand, all_boxes)
        assert len(fields) == 1
        assert fields[0]["field_key"] == "Signature"
        assert fields[0]["field_value"] == "signed"
        assert fields[0]["field_type"] == "signature"

    def test_no_keyword_pairs_nearest_label(self):
        """A pixel-verified squiggle with no keyword label pairs with its
        nearest label word run at reduced confidence (reference parity:
        Gemini pairs squiggles by layout, not by a keyword list — real
        forms label signature lines with arbitrary keys)."""
        hand = [{
            "type": "handwriting", "content": "", "confidence": 0.8,
            "polygon": [100.0, 100.0, 300.0, 100.0,
                        300.0, 140.0, 100.0, 140.0],
            "page_number": 1,
        }]
        words = [{
            "type": "word", "content": "Comments", "confidence": 0.9,
            "polygon": [20.0, 105.0, 90.0, 105.0, 90.0, 130.0, 20.0, 130.0],
            "page_number": 1,
        }]
        fields = handwriting_to_fields(hand, words)
        assert len(fields) == 1
        assert fields[0]["field_key"] == "Comments"
        assert fields[0]["field_value"] == "signed"
        assert fields[0]["confidence"] < 0.8  # keyword-less: discounted

    def test_far_squiggle_stays_unpaired(self):
        """The nearest-label fallback still requires proximity — a
        handwriting box nowhere near any word run yields no field."""
        hand = [{
            "type": "handwriting", "content": "", "confidence": 0.8,
            "polygon": [700.0, 700.0, 900.0, 700.0,
                        900.0, 740.0, 700.0, 740.0],
            "page_number": 1,
        }]
        words = [{
            "type": "word", "content": "Comments", "confidence": 0.9,
            "polygon": [20.0, 105.0, 90.0, 105.0, 90.0, 130.0, 20.0, 130.0],
            "page_number": 1,
        }]
        assert handwriting_to_fields(hand, words) == []

    def test_validator_accepts_signed(self):
        from ocr_system_tpu.service.validation import ValidationService

        r = ValidationService().validate_field("signed", "signature", 0.8)
        assert r.is_valid

    def test_nearest_label_carries_gap(self):
        hand = [{
            "type": "handwriting", "content": "", "confidence": 0.8,
            "polygon": [100.0, 100.0, 300.0, 100.0,
                        300.0, 140.0, 100.0, 140.0],
            "page_number": 1,
        }]
        words = [{
            "type": "word", "content": "Comments", "confidence": 0.9,
            "polygon": [20.0, 105.0, 90.0, 105.0, 90.0, 130.0, 20.0, 130.0],
            "page_number": 1,
        }]
        f = handwriting_to_fields(hand, words)[0]
        # gap 10 px / label height 25 px = 0.4 label heights
        assert f["label_gap"] == pytest.approx(0.4, abs=0.05)


class TestSquiggleOverrides:
    """The ONE merge policy shared by serving and both eval paths."""

    def test_fills_missing(self):
        assert squiggle_overrides({"keyword_label": False}, None)
        assert squiggle_overrides({"keyword_label": True}, "  ")

    def test_keyword_overrides_soup_keeps_clean(self):
        kw = {"keyword_label": True}
        assert squiggle_overrides(kw, "xq#@!z", 0.3)   # soup: override
        assert not squiggle_overrides(kw, "John Smith", 0.95)  # clean: keep

    def test_adjacent_guess_overrides_stolen_key(self):
        # squiggle glued to its label AND the existing value is a fragment
        # of another extracted key: the extractor stole the next label's
        # words (diag r4 'window: Tizolu' family)
        sf = {"keyword_label": False, "label_gap": 0.4, "field_key": "window"}
        keys = {"window", "tizolu owner lerbaler"}
        assert squiggle_overrides(sf, "Tizolu", 0.9, other_keys=keys)

    def test_adjacent_guess_keeps_genuine_value(self):
        # adjacency alone is NOT enough: handwriting detection can
        # false-positive next to a label whose true printed value sits
        # farther right (diag r4 doc 9 '314540')
        sf = {"keyword_label": False, "label_gap": 0.4, "field_key": "ref"}
        assert not squiggle_overrides(
            sf, "314540", 0.9, other_keys={"ref", "other key"}
        )

    def test_adjacent_guess_overrides_soup(self):
        sf = {"keyword_label": False, "label_gap": 0.4, "field_key": "k"}
        assert squiggle_overrides(sf, "xq#@!z", 0.3, other_keys={"k"})

    def test_distant_guess_only_fills(self):
        sf = {"keyword_label": False, "label_gap": 3.2}
        assert not squiggle_overrides(sf, "Real Printed Value", 0.9)
        # and a guess with no gap info behaves like the old fill-only rule
        assert not squiggle_overrides({"keyword_label": False}, "x y z", 0.9)


class TestEvalIntegration:
    def test_form_eval_counts_signature_pairs(self):
        """evaluate_form_extraction merges the pixel path: signature pairs
        are recoverable even though no token extractor can see them."""
        from ocr_system_tpu.extract.rules import RuleExtractor
        from ocr_system_tpu.training.evaluate import evaluate_form_extraction

        res = evaluate_form_extraction(
            RuleExtractor(), n_docs=12, noise_rate=0.0
        )
        assert res.f1 > 0.3  # sanity: the merge didn't break the eval


class TestLabelFallbackSkipsCompleteFields:
    def test_inline_value_run_is_not_a_label(self):
        """The nearest-label fallback must skip a word run that already
        carries an inline value ('Date: 2009-04-15' is a COMPLETE field):
        pairing the squiggle to it fabricates a field and orphans the true
        label farther away."""
        hand = [{
            "type": "handwriting", "content": "", "confidence": 0.8,
            "polygon": [200.0, 100.0, 400.0, 100.0,
                        400.0, 140.0, 200.0, 140.0],
            "page_number": 1,
        }]
        words = [
            {  # nearer, but a complete inline field
                "type": "word", "content": "Date: 2009-04-15",
                "confidence": 0.9,
                "polygon": [60.0, 105.0, 190.0, 105.0,
                            190.0, 130.0, 60.0, 130.0],
                "page_number": 1,
            },
            {  # farther, the true label
                "type": "word", "content": "Approver",
                "confidence": 0.9,
                "polygon": [20.0, 60.0, 100.0, 60.0,
                            100.0, 85.0, 20.0, 85.0],
                "page_number": 1,
            },
        ]
        fields = handwriting_to_fields(hand, words)
        assert len(fields) == 1
        assert fields[0]["field_key"] == "Approver"

    def test_trailing_colon_run_still_labels(self):
        """A 'Key:' run (no inline value) is a label awaiting content."""
        hand = [{
            "type": "handwriting", "content": "", "confidence": 0.8,
            "polygon": [200.0, 100.0, 400.0, 100.0,
                        400.0, 140.0, 200.0, 140.0],
            "page_number": 1,
        }]
        words = [{
            "type": "word", "content": "Margin class:", "confidence": 0.9,
            "polygon": [60.0, 105.0, 190.0, 105.0,
                        190.0, 130.0, 60.0, 130.0],
            "page_number": 1,
        }]
        fields = handwriting_to_fields(hand, words)
        assert len(fields) == 1
        assert fields[0]["field_key"] == "Margin class"
