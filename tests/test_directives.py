"""custom_prompt / FormTemplate steering of the NEURAL extractor
(extract/directives.py). Reference behavior being matched: the template and
custom prompt actually change what gets extracted
(gemini_service.py:511-549)."""

import numpy as np

from ocr_system_tpu.extract.directives import (
    Directives,
    apply_directives,
    key_tag_bias,
    parse_directives,
)
from ocr_system_tpu.extract.types import ExtractedField


def F(k, v, t="text", c=0.9):
    return ExtractedField(field_key=k, field_value=v, field_type=t, confidence=c)


class TestParse:
    def test_template_expected_fields(self):
        d = parse_directives(None, {
            "expected_fields": [
                {"name": "Invoice Number", "field_type": "number"},
                "Vendor",
            ]
        })
        assert d.expected == [("Invoice Number", "number"), ("Vendor", "text")]
        assert not d.only_expected

    def test_prompt_only_extract(self):
        d = parse_directives("Extract only: Total Amount, Due Date", None)
        assert d.only_expected
        assert ("Total Amount", "text") in d.expected
        assert ("Due Date", "text") in d.expected

    def test_prompt_type_hint(self):
        d = parse_directives("Due Date is a date. Amount is a currency.", None)
        assert ("Due Date", "date") in d.expected
        assert ("Amount", "currency") in d.expected

    def test_prompt_type_hint_overrides_template(self):
        d = parse_directives(
            "Invoice Date is a date",
            {"expected_fields": [{"name": "Invoice Date"}]},
        )
        assert d.expected == [("Invoice Date", "date")]

    def test_prompt_ignore(self):
        d = parse_directives("Ignore Comments and Notes", None)
        assert d.exclude == ["Comments", "Notes"]

    def test_nothing_actionable_returns_none(self):
        assert parse_directives(None, None) is None
        assert parse_directives("please be thorough", None) is None
        assert parse_directives(None, {"expected_fields": []}) is None


class TestApply:
    def test_snaps_noisy_key_to_expected(self):
        d = Directives(expected=[("Invoice Number", "text")])
        out = apply_directives([F("lnvoice Numbor", "123")], d)
        assert out[0].field_key == "Invoice Number"

    def test_only_expected_filters(self):
        d = Directives(expected=[("Vendor", "text")], only_expected=True)
        out = apply_directives([F("Vendor", "Acme"), F("Junk", "x")], d)
        assert [f.field_key for f in out] == ["Vendor"]

    def test_exclusion_drops(self):
        d = Directives(exclude=["Comments"])
        out = apply_directives([F("Comments", "hi"), F("Vendor", "Acme")], d)
        assert [f.field_key for f in out] == ["Vendor"]

    def test_type_hint_coerces_and_repairs(self):
        # 'O' -> '0' digit-context repair only happens under a typed value
        d = Directives(expected=[("Amount", "number")])
        out = apply_directives([F("Amount", "1O0", "text")], d)
        assert out[0].field_type == "number"
        assert out[0].field_value == "100"

    def test_missing_expected_emitted_empty(self):
        d = Directives(expected=[("Due Date", "date")])
        out = apply_directives([F("Vendor", "Acme")], d)
        missing = [f for f in out if f.field_key == "Due Date"]
        assert len(missing) == 1
        assert missing[0].field_value == "" and missing[0].confidence == 0.0

    def test_two_templates_extract_differently(self):
        # the VERDICT r4 acceptance shape: same decoded fields, two
        # templates -> different extraction results
        fields = [F("Vendor", "Acme"), F("Total", "99")]
        a = apply_directives(
            list(fields),
            Directives(expected=[("Vendor", "text")], only_expected=True),
        )
        b = apply_directives(
            list(fields),
            Directives(expected=[("Total", "number")], only_expected=True),
        )
        assert [f.field_key for f in a] == ["Vendor"]
        assert [f.field_key for f in b] == ["Total"]


class TestKeyTagBias:
    def test_bias_flips_ambiguous_span(self):
        from ocr_system_tpu.extract.layout_model import _I_BK, _I_IK, _I_O

        text = "po number 12"
        n = len(text)
        # mildly O-leaning logits everywhere
        logp = np.full((n, 5), -3.0, np.float32)
        logp[:, _I_O] = -1.0
        d = Directives(expected=[("PO Number", "text")])
        key_tag_bias(logp, text, d)
        # the 'po number' span must now argmax to a KEY tag; '12' stays O
        span = np.argmax(logp[:9], -1)
        assert set(span.tolist()) <= {_I_BK, _I_IK}
        assert int(np.argmax(logp[10])) == _I_O


import os

import pytest


@pytest.mark.slow
class TestDirectivesEndToEnd:
    """VERDICT r4 #5 acceptance: the SAME page extracts differently under
    two templates, through the REAL trained extractor (the deterministic
    analog of gemini_service.py:511-549 prompt injection)."""

    def _extract(self, custom_prompt=None, template=None):
        from ocr_system_tpu.core.config import Settings
        from ocr_system_tpu.extract.layout_model import LayoutModelExtractor

        s = Settings(
            storage_root="/tmp/dirstore",
            extract_checkpoint="checkpoints/extract",
        )
        lm = LayoutModelExtractor(s)
        word_boxes = []
        x = 40
        rows = [
            ("Vendor:", "Acme Corp", 40),
            ("Total Amount:", "99.50", 80),
            ("Notes:", "rush order", 120),
        ]
        for key, val, y in rows:
            x = 40
            for w in (key + " " + val).split():
                wpx = 9 * len(w)
                word_boxes.append({
                    "type": "word", "content": w, "confidence": 0.98,
                    "polygon": [x, y, x + wpx, y, x + wpx, y + 16, x, y + 16],
                    "page_number": 1,
                })
                x += wpx + 6
        return lm.extract_from_layout(
            word_boxes, (612, 400),
            custom_prompt=custom_prompt, template=template,
        )

    def test_same_page_two_templates_differ(self):
        if not os.path.isdir("checkpoints/extract"):
            pytest.skip("no committed extractor checkpoint")
        base = self._extract()
        only_vendor = self._extract(
            custom_prompt="Extract only: Vendor",
        )
        keys_base = {f.field_key.lower() for f in base.fields if f.field_key}
        keys_v = {
            f.field_key.lower() for f in only_vendor.fields if f.field_key
        }
        assert keys_v == {"vendor"}
        assert keys_base != keys_v

    def test_template_adds_missing_expected_field(self):
        if not os.path.isdir("checkpoints/extract"):
            pytest.skip("no committed extractor checkpoint")
        res = self._extract(template={
            "expected_fields": [{"name": "PO Number", "field_type": "number"}]
        })
        missing = [f for f in res.fields if f.field_key == "PO Number"]
        assert len(missing) == 1 and missing[0].confidence == 0.0
