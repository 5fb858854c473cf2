"""Evaluation metric tests."""

import pytest

from ocr_system_tpu.extract.rules import RuleExtractor
from ocr_system_tpu.training.evaluate import (
    cer,
    edit_distance,
    evaluate_field_extraction,
)


class TestEditDistance:
    @pytest.mark.parametrize(
        "a,b,d",
        [
            ("", "", 0),
            ("abc", "abc", 0),
            ("abc", "abd", 1),
            ("abc", "ab", 1),
            ("abc", "xabc", 1),
            ("kitten", "sitting", 3),
            ("", "abc", 3),
        ],
    )
    def test_distance(self, a, b, d):
        assert edit_distance(a, b) == d

    def test_cer(self):
        assert cer("hello", "hello") == 0.0
        assert cer("hello", "hallo") == pytest.approx(0.2)
        assert cer("", "") == 0.0
        assert cer("", "x") == 1.0


def test_rule_extractor_f1_high_on_clean_text():
    # clean synthetic KV docs: the rule tier must score near-perfect F1
    result = evaluate_field_extraction(RuleExtractor(), n_docs=10)
    assert result.f1 > 0.95, (result.precision, result.recall)
