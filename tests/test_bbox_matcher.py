"""BBox matcher tests (parity: backend/utils/bbox_matcher.py)."""

from ocr_system_tpu.service.bbox_matcher import BoundingBoxMatcher, normalize

matcher = BoundingBoxMatcher()


def _word(content, x0, y0, w=40, h=12, page=1):
    return {
        "type": "word",
        "content": content,
        "confidence": 0.95,
        "polygon": [x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h],
        "page_number": page,
    }


def _line(content, x0, y0, w=200, h=12, page=1):
    d = _word(content, x0, y0, w, h, page)
    d["type"] = "line"
    return d


BOXES = [
    _line("Name: John Smith", 10, 10),
    _line("Total Amount Due", 10, 40),
    _word("Name:", 10, 10),
    _word("John", 60, 10),
    _word("Smith", 105, 10),
    _word("Total", 10, 40),
    _word("Amount", 55, 40),
    _word("Due", 105, 40),
]


def test_normalize():
    assert normalize("  Hello   WORLD. ") == "hello world"
    assert normalize("*Name:*") == "name"


def test_exact_line_match_conf_1():
    m = matcher.find_match("Name: John Smith", BOXES)
    assert m is not None and m["confidence"] == 1.0
    assert m["matched_text"] == "Name: John Smith"


def test_fuzzy_line_match():
    m = matcher.find_match("Name: Jon Smith", BOXES)  # typo
    assert m is not None and 0.85 <= m["confidence"] < 1.0


def test_containment_boost():
    m = matcher.find_match("Amount Due", BOXES)
    assert m is not None and m["confidence"] >= 0.9


def test_containment_matches_line_first():
    # "John Smith" is contained in the line -> strategy 2 wins (reference
    # order: lines before word-union)
    m = matcher.find_match("John Smith", BOXES)
    assert m is not None and m["confidence"] >= 0.9
    assert m["matched_text"] == "Name: John Smith"


def test_word_union_multiword():
    # reversed order defeats line matching -> word-union path
    m = matcher.find_match("Smith John", BOXES)
    assert m is not None
    xs = m["polygon"][0::2]
    assert min(xs) == 60 and max(xs) == 145
    assert m["confidence"] >= 0.9


def test_word_union_partial_below_half_fails():
    m = matcher.find_match("Zebra Quantum Flux Unrelated", BOXES)
    assert m is None


def test_no_match_returns_none():
    assert matcher.find_match("zzzzz", BOXES) is None
    assert matcher.find_match("", BOXES) is None


def test_key_value_pair():
    k, v = matcher.find_key_value_pair("Name:", "John Smith", BOXES)
    assert k is not None and v is not None
    assert "Name" in k["matched_text"]


def test_match_dict_shape():
    m = matcher.find_match("Name: John Smith", BOXES)
    assert set(m) == {"polygon", "matched_text", "confidence", "page"}
    assert len(m["polygon"]) == 8
