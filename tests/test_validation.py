"""Validation service tests (parity: backend/services/validation_service.py)."""

import pytest

from ocr_system_tpu.core.config import Settings
from ocr_system_tpu.service.validation import (
    FieldType,
    ValidationService,
    confidence_level,
)

S = Settings()
svc = ValidationService(S)


def v(value, ftype, conf=0.9):
    return svc.validate_field(value, ftype, conf)


class TestEmail:
    def test_valid(self):
        assert v("john@example.com", "email").is_valid

    def test_empty_is_error(self):
        r = v("", "email")
        assert not r.is_valid and r.severity == "error"

    def test_space_correction(self):
        r = v("john @example.com", "email")
        assert not r.is_valid
        assert r.corrected_value == "john@example.com"

    def test_invalid(self):
        assert not v("not-an-email", "email").is_valid


class TestPhone:
    def test_us_format(self):
        assert v("(555) 123-4567", "phone").is_valid

    def test_india_format(self):
        assert v("+91 9876543210", "phone").is_valid

    def test_digit_count_fallback_flags_review(self):
        r = v("call 5551234567 now", "phone", conf=0.7)
        # not a pattern match; digit-count path under high threshold -> review
        assert r.is_valid and r.needs_review

    def test_too_few_digits(self):
        assert not v("12345", "phone").is_valid


class TestDate:
    def test_iso_passthrough(self):
        r = v("2024-01-15", "date")
        assert r.is_valid and r.corrected_value is None

    def test_ambiguous_formats_corrected_to_iso(self):
        r = v("15/01/2024", "date")
        assert r.is_valid and r.corrected_value == "2024-01-15"

    def test_month_name(self):
        r = v("January 15, 2024", "date")
        assert r.is_valid and r.corrected_value == "2024-01-15"

    def test_date_like_needs_review(self):
        r = v("99/99/9999", "date")
        assert not r.is_valid and r.needs_review and r.severity == "warning"

    def test_garbage(self):
        r = v("tomorrow", "date")
        assert not r.is_valid and r.severity == "error"


class TestNumberCurrency:
    def test_number_with_commas(self):
        assert v("1,234,567", "number").is_valid

    def test_negative_decimal(self):
        assert v("-12.5", "number").is_valid

    def test_mostly_numeric_warns(self):
        r = v("123O45678", "number")  # letter O typo, >80% digits
        assert not r.is_valid and r.needs_review

    def test_currency_symbol(self):
        assert v("$1,234.56", "currency").is_valid

    def test_currency_extraction(self):
        r = v("USD 1,234.56 only", "currency")
        assert r.is_valid and r.corrected_value == "1,234.56"

    def test_currency_garbage(self):
        assert not v("lots of money", "currency").is_valid


class TestCheckboxNameAddress:
    @pytest.mark.parametrize("val", ["yes", "No", "✓", "X", "1", "off", ""])
    def test_checkbox_values(self, val):
        assert v(val, "checkbox").is_valid

    def test_checkbox_unknown(self):
        r = v("maybe", "checkbox")
        assert not r.is_valid and r.needs_review

    def test_name_valid(self):
        assert v("Mary-Jane O'Brien Jr.", "name").is_valid

    def test_name_with_digits_flagged(self):
        r = v("John 42", "name")
        assert not r.is_valid and r.needs_review

    def test_name_too_short(self):
        assert not v("J", "name").is_valid

    def test_international_name_valid_with_review(self):
        r = v("José García", "name", conf=0.7)
        assert r.is_valid and r.needs_review

    def test_address_too_short(self):
        r = v("Main St", "address")
        assert not r.is_valid and r.needs_review

    def test_address_ok(self):
        assert v("123 Main Street, Springfield, IL 62704", "address").is_valid


class TestTextSignatureTableUnknown:
    def test_empty_text_is_valid(self):
        assert v("", "text").is_valid

    def test_signature_missing(self):
        r = v("", "signature")
        assert not r.is_valid and r.needs_review

    def test_table_always_review(self):
        assert v("a|b|c", "table").needs_review

    def test_unknown_type_review(self):
        r = v("whatever", "not-a-type")
        assert r.is_valid and r.needs_review


class TestConfidenceGating:
    def test_levels(self):
        assert confidence_level(0.9, S) == "high"
        assert confidence_level(0.7, S) == "medium"
        assert confidence_level(0.3, S) == "low"

    def test_low_confidence_forces_review(self):
        r = v("john@example.com", "email", conf=0.3)
        assert r.is_valid and r.needs_review


class TestBatchAndFinalization:
    FIELDS = [
        {"key": "Email", "value": "a@b.com", "field_type": "email", "confidence": 0.9},
        {"key": "Phone", "value": "xyz", "field_type": "phone", "confidence": 0.9},
        {"key": "Notes", "value": "hi", "field_type": "text", "confidence": 0.9},
    ]

    def test_batch_counts(self):
        rep = svc.validate_fields(self.FIELDS)
        assert rep.total_fields == 3
        assert rep.valid_fields == 2
        assert rep.invalid_fields == 1
        assert not rep.is_valid

    def test_finalization_gate_blocks_on_errors(self):
        ok, problems = svc.validate_before_finalization(self.FIELDS)
        assert not ok and any("Phone" in p for p in problems)

    def test_finalization_passes_clean(self):
        ok, problems = svc.validate_before_finalization(self.FIELDS[:1])
        assert ok and problems == []


def test_field_type_enum_complete():
    # parity with reference models.py:58-71
    assert {ft.value for ft in FieldType} == {
        "text", "number", "date", "email", "phone", "checkbox", "table",
        "signature", "address", "name", "currency", "unknown",
    }
