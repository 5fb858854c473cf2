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


class TestTruthCharset:
    """Eval truth must be normalized by what the ENGINE can emit: a
    script-routing engine reads Hindi form pages correctly, so filtering
    truth through the latin eval charset scored that correct output as
    pure insertion (3.5 page CER on a well-read page)."""

    class _Eng:
        def __init__(self, **kw):
            from ocr_system_tpu.core.config import Settings

            self.settings = Settings(**kw)

    def test_routing_engine_scores_against_union(self, tmp_path):
        from ocr_system_tpu.training.evaluate import _truth_charset
        from ocr_system_tpu.models.charsets import get_charset

        latin = get_charset("latin")
        deva_dir = tmp_path / "rec_devanagari"
        deva_dir.mkdir()
        eng = self._Eng(
            rec_charset="auto", checkpoint_dir=str(tmp_path),
            storage_root=str(tmp_path / "s"),
        )
        tc = _truth_charset(eng, latin)
        assert tc.name == "multilingual"
        # the union keeps Devanagari truth instead of deleting it
        assert tc.decode(tc.encode("नाम: Smith")) == "नाम: Smith"

    def test_no_deva_checkpoint_keeps_eval_charset(self, tmp_path):
        from ocr_system_tpu.training.evaluate import _truth_charset
        from ocr_system_tpu.models.charsets import get_charset

        latin = get_charset("latin")
        eng = self._Eng(
            rec_charset="auto", checkpoint_dir=str(tmp_path / "none"),
            storage_root=str(tmp_path / "s"),
        )
        assert _truth_charset(eng, latin) is latin

    def test_pinned_charset_engine_keeps_eval_charset(self, tmp_path):
        from ocr_system_tpu.training.evaluate import _truth_charset
        from ocr_system_tpu.models.charsets import get_charset

        latin = get_charset("latin")
        (tmp_path / "rec_devanagari").mkdir()
        eng = self._Eng(
            rec_charset="latin", checkpoint_dir=str(tmp_path),
            storage_root=str(tmp_path / "s"),
        )
        assert _truth_charset(eng, latin) is latin
