"""Typed value autocorrect + key snapping (extract/postfix.py — the local
analog of reference validation corrections and template expected_fields,
validation_service.py + extraction_service.py template prompt)."""

from ocr_system_tpu.extract.postfix import (
    FORM_KEY_LEXICON,
    autocorrect_value,
    clean_key,
    infer_family_from_keys,
    repair_alpha,
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

    def test_untyped_at_prose_not_mangled(self):
        # ADVICE r4 medium: a text value that merely contains '@' and '.'
        # must NOT get its spaces stripped — only a result that is actually
        # email-shaped commits the rewrite
        assert (
            autocorrect_value("meet @ the cafe. thanks", "text")
            == "meet @ the cafe. thanks"
        )

    def test_email_local_part_case_preserved(self):
        # local parts are case-sensitive: no stray-capital lowering there
        assert (
            autocorrect_value("JohnDoe@acme.com", "email")
            == "JohnDoe@acme.com"
        )

    def test_not_digit_dominant_untouched(self):
        assert autocorrect_value("BlOS", "number") == "BlOS"  # 0 digits
        assert autocorrect_value("", "phone") == ""


class TestRepairAlpha:
    """Letter-context repairs — every case below is a failure class measured
    on diag_extract_pipeline seeds 5251/6260 (or its safety counterpart)."""

    def test_zero_between_letters(self):
        assert clean_key("0rigin") == "origin"
        assert repair_alpha("c0de") == "code"

    def test_state_code_zero(self):
        assert (autocorrect_value("9846 Park Road, Fairview, 0H 15987",
                                  "address")
                == "9846 Park Road, Fairview, OH 15987")

    def test_midword_capital_i(self):
        assert autocorrect_value("AIice Chen", "name") == "Alice Chen"

    def test_word_initial_l_before_consonant(self):
        assert clean_key("sasuga tier lndex") == "sasuga tier Index"
        # short units stay ('5 lbs'), l+vowel words stay ('license')
        assert autocorrect_value("5 lbs", "text") == "5 lbs"
        assert clean_key("license level") == "license level"

    def test_stray_midword_capital_keys_only(self):
        # key mode (case-insensitive snap downstream): lowering is free
        assert repair_alpha("ImPortant SupPort", lower_zero=True) == (
            "Important Support")
        # VALUE mode never lowers: proper nouns are open vocabulary
        assert autocorrect_value("BlueKeel Lines", "carrier") == (
            "BlueKeel Lines")
        assert autocorrect_value("ImPortant", "text") == "ImPortant"
        # Mc/Mac name prefixes and ALL-CAPS tokens are preserved
        assert repair_alpha("McDonald Plaza", lower_zero=True) == (
            "McDonald Plaza")
        assert autocorrect_value("286.90 USD", "currency") == "286.90 USD"

    def test_month_names_survive_digit_pass(self):
        # digit-dominant date, but 'Jul' is a word: letter-adjacent chars
        # must not convert across the space ('Jul 27' != 'Ju1 27')
        assert (autocorrect_value("Jul 27, 2026", "date")
                == "Jul 27, 2026")
        assert autocorrect_value("NO 12345", "number") == "NO 12345"
        # real in-number confusions still repair
        assert autocorrect_value("2O13-01-11", "date") == "2013-01-11"
        assert autocorrect_value("851 O31 8095", "phone") == "851 031 8095"

    def test_email_domain_separators(self):
        assert (autocorrect_value("omar@example:com", "email")
                == "omar@example.com")
        assert (autocorrect_value("carlos.chen@mailiorg", "email")
                == "carlos.chen@mail.org")
        assert (autocorrect_value("ahmed.siIva@example.com", "email")
                == "ahmed.silva@example.com")
        assert (autocorrect_value("jane.novak@corp.net", "email")
                == "jane.novak@corp.net")

    def test_phone_commas_stripped(self):
        assert (autocorrect_value("+42 7,714 157132", "phone")
                == "+42 7714 157132")
        assert autocorrect_value("851.,231.8095", "phone") == "851.231.8095"
        # currency commas are real and survive
        assert (autocorrect_value("USD 70,264.53", "currency")
                == "USD 70,264.53")

    def test_number_id_dot_dash(self):
        assert (autocorrect_value("INV.-2020-7215", "number")
                == "INV-2020-7215")
        assert autocorrect_value("KL-123-45", "number") == "KL-123-45"

    def test_state_code_before_zip(self):
        # 'Ml' could be MI or ML; only MI is a real state code
        assert (autocorrect_value(
            "5367 Oak Avenue, Jackson, Ml 63629", "address")
            == "5367 Oak Avenue, Jackson, MI 63629")
        assert (autocorrect_value("Mobile, Al 35758", "address")
                == "Mobile, AL 35758")
        assert (autocorrect_value("Tampa, F1 33601", "address")
                == "Tampa, FL 33601")
        # no zip anchor -> untouched ('Ml' mid-prose stays)
        assert autocorrect_value("Ml grade steel", "text") == (
            "Ml grade steel")

    def test_split_zip_rejoined(self):
        assert (autocorrect_value(
            "6413 Hill Crescent, Madison, WA 5971 3", "address")
            == "6413 Hill Crescent, Madison, WA 59713")
        # halves that don't make 5 digits stay split
        assert (autocorrect_value("Suite WA 123 456", "address")
                == "Suite WA 123 456")

    def test_email_at_misread_as_q(self):
        assert (autocorrect_value("tomqmail.org", "email")
                == "tom@mail.org")
        # value already containing '@' or several 'q's is left alone
        assert (autocorrect_value("quinn@quarry.net", "email")
                == "quinn@quarry.net")
        assert (autocorrect_value("quentinqx.org", "email")
                == "quentinqx.org")

    def test_pure_digit_tokens_untouched(self):
        assert repair_alpha("890548") == "890548"
        assert autocorrect_value("2013-01-11", "date") == "2013-01-11"

    def test_devanagari_untouched(self):
        assert clean_key("खादी मूल्य") == "खादी मूल्य"


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


class TestInferFamilyFromKeys:
    def test_rescues_missed_prediction(self):
        # noisy Medical Form keys predicted Unknown by the head: two keys
        # near-match the Medical lexicon -> vote rescues the family
        keys = ["aliergies", "blood type", "batch grade"]
        assert infer_family_from_keys(keys, "Unknown") == "Medical Form"

    def test_random_keys_stay_unknown(self):
        keys = ["neki per license", "kufort code", "getesi of entry"]
        assert infer_family_from_keys(keys, "Unknown") == "Unknown"

    def test_single_vote_insufficient(self):
        assert infer_family_from_keys(["allergies"], "Unknown") == "Unknown"

    def test_keeps_correct_prediction(self):
        keys = ["patient name", "allergies", "blood type"]
        assert (infer_family_from_keys(keys, "Medical Form")
                == "Medical Form")

    def test_tie_keeps_predicted(self):
        # 'date'+'signature' match several families; no strict winner
        keys = ["date", "signature"]
        assert infer_family_from_keys(keys, "Unknown") == "Unknown"

    def test_empty(self):
        assert infer_family_from_keys([], "Invoice") == "Invoice"
