"""Reading-order tests (reference algorithm: backend/utils/ocr_postprocessor.py)."""

import numpy as np

from ocr_system_tpu.engine.reading_order import (
    TextBlock,
    extract_text_ordered,
    group_into_lines,
    order_blocks,
    to_markdown,
)


def _block(x0, y0, w, h, text, conf=0.9):
    quad = np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]], np.float32
    )
    return TextBlock(quad=quad, text=text, confidence=conf)


def test_same_line_sorted_by_x():
    blocks = [_block(100, 10, 40, 12, "world"), _block(10, 11, 40, 12, "hello")]
    lines = order_blocks(blocks)
    assert len(lines) == 1
    assert lines[0].text == "hello world"


def test_lines_sorted_by_y():
    blocks = [
        _block(10, 100, 40, 12, "second"),
        _block(10, 10, 40, 12, "first"),
        _block(10, 200, 40, 12, "third"),
    ]
    assert extract_text_ordered(blocks) == "first\nsecond\nthird"


def test_y_tolerance_groups_slightly_offset_words():
    # offsets within 0.5 * avg height stay on one line
    blocks = [_block(10, 10, 40, 12, "a"), _block(60, 14, 40, 12, "b")]
    assert len(group_into_lines(blocks)) == 1


def test_y_gap_splits_lines():
    blocks = [_block(10, 10, 40, 12, "a"), _block(60, 40, 40, 12, "b")]
    assert len(group_into_lines(blocks)) == 2


def test_confidence_averaged():
    blocks = [_block(10, 10, 40, 12, "a", 0.8), _block(60, 10, 40, 12, "b", 0.6)]
    lines = order_blocks(blocks)
    assert abs(lines[0].confidence - 0.7) < 1e-6


def test_empty_input():
    assert order_blocks([]) == []
    assert to_markdown([]) == ""


def test_line_quad_is_union():
    blocks = [_block(10, 10, 40, 12, "a"), _block(100, 10, 40, 12, "b")]
    line = order_blocks(blocks)[0]
    assert line.quad[0].tolist() == [10, 10]
    assert line.quad[2].tolist() == [140, 22]


class TestLeaderCanonicalization:
    """Dot-leader runs collapse to '...' at markdown emission: the dot
    COUNT is presentation, not content, and its squeeze-drift dominated
    plain-page e2e CER (round-3 diagnosis)."""

    def test_long_run_collapses(self):
        from ocr_system_tpu.engine.reading_order import canonicalize_leaders

        assert canonicalize_leaders("Key ........... value") == "Key ... value"
        assert canonicalize_leaders("a " + "." * 80) == "a ..."

    def test_spaced_run_collapses(self):
        from ocr_system_tpu.engine.reading_order import canonicalize_leaders

        assert canonicalize_leaders("Key . . . . value") == "Key ... value"

    def test_short_dots_untouched(self):
        from ocr_system_tpu.engine.reading_order import canonicalize_leaders

        assert canonicalize_leaders("e.g. v1.2") == "e.g. v1.2"
        assert canonicalize_leaders("end.") == "end."
        assert canonicalize_leaders("a..b") == "a..b"

    def test_markdown_applies_canonicalization(self):
        blocks = [
            _block(10, 10, 40, 12, "Total"),
            _block(60, 10, 80, 12, "......."),
            _block(150, 10, 40, 12, "$5"),
        ]
        assert to_markdown(order_blocks(blocks)) == "Total ... $5"
