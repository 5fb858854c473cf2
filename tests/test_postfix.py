"""Typed value autocorrect + key snapping (extract/postfix.py — the local
analog of reference validation corrections and template expected_fields,
validation_service.py + extraction_service.py template prompt)."""

from ocr_system_tpu.extract.postfix import (
    FORM_KEY_LEXICON,
    autocorrect_value,
    snap_key,
)


class TestAutocorrectValue:
    def test_digit_confusions_in_phone(self):
        assert autocorrect_value("697-481-915O7", "phone") == "697-481-91507"
        assert autocorrect_value("(9l9) 214-5410", "phone") == "(919) 214-5410"

    def test_date_confusions(self):
        assert autocorrect_value("2O13-09-11", "date") == "2013-09-11"
        assert autocorrect_value("1993 07-1M4", "date") == "1993 07-1M4"  # M not mapped

    def test_letters_in_words_untouched(self):
        # 'O' inside a word with no digit neighbor stays a letter
        assert autocorrect_value("Oak Avenue 12", "number") == "Oak Avenue 12"
        assert autocorrect_value("Carlos Olsen", "name") == "Carlos Olsen"

    def test_currency_code_untouched(self):
        assert (
            autocorrect_value("17,502.12 EUR", "currency") == "17,502.12 EUR"
        )
        assert autocorrect_value("S5O0.25", "currency") == "5500.25"

    def test_email_space_removed(self):
        assert (
            autocorrect_value("john@acme. com", "email") == "john@acme.com"
        )
        # emails detected by content even when typed otherwise
        assert (
            autocorrect_value("a b@c.org", "text") == "ab@c.org"
        )

    def test_not_digit_dominant_untouched(self):
        assert autocorrect_value("BlOS", "number") == "BlOS"  # 0 digits
        assert autocorrect_value("", "phone") == ""


class TestSnapKey:
    LEX = FORM_KEY_LEXICON["Contract"]

    def test_near_match_snaps(self):
        assert snap_key("monthily fee", self.LEX) == "Monthly Fee"
        assert snap_key("Efective Date", self.LEX) == "Effective Date"

    def test_exact_stays(self):
        assert snap_key("Monthly Fee", self.LEX) == "Monthly Fee"

    def test_far_key_untouched(self):
        assert snap_key("shifx garsenve", self.LEX) == "shifx garsenve"

    def test_ambiguous_untouched(self):
        # equally near two lexicon entries -> keep the OCR reading
        lex = ["Date A", "Date B"]
        assert snap_key("Date C", lex) == "Date C"

    def test_empty(self):
        assert snap_key("", self.LEX) == ""
        assert snap_key("x", []) == "x"

    def test_lexicons_match_known_families(self):
        # lexicons must track the synth generator's pools (they define the
        # eval's in-family keys); drift would turn snapping into damage
        from ocr_system_tpu.training.synth_forms import _FORM_CONTENT

        for fam, lex in FORM_KEY_LEXICON.items():
            pool_keys = [k for k, _ in _FORM_CONTENT[fam][1]]
            assert sorted(lex) == sorted(pool_keys), fam
