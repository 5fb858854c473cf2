"""Lexicon-guided glued-box re-segmentation (engine/glue_split.py).

The round-4 forms_e2e loss family: det row-merges gluing a VALUE to the
NEXT column's LABEL ('mary novakbiood:type'). The splitter must find the
label in the tail (fuzzy, colon-noise tolerant), demand a real ink gap,
and split the quad there."""

import numpy as np

from ocr_system_tpu.engine.glue_split import (
    find_glued_label,
    find_ink_gap,
    plan_splits,
    split_quad,
)
from ocr_system_tpu.ops.boxes import DetectedBox


class TestFindGluedLabel:
    def test_canonical_glue_with_ocr_noise(self):
        # 'blood' misread as 'biood', colon displaced into the label
        m = find_glued_label("mary novakbiood:type")
        assert m is not None and m.label == "Blood Type"
        assert m.char_start == 10

    def test_clean_glue(self):
        m = find_glued_label("john doePatient Name:")
        assert m is not None and m.label == "Patient Name"
        assert m.char_start == 8

    def test_numeric_value_prefix(self):
        m = find_glued_label("42,000gross income:")
        assert m is not None and m.label == "Gross Income"

    def test_inline_pair_not_matched(self):
        # ordinary 'Key: value' boxes are NOT glue — label is at the START
        assert find_glued_label("Phone: 555-0142") is None
        assert find_glued_label("Total Amount: 99.50") is None

    def test_label_only_box_not_matched(self):
        assert find_glued_label("Blood Type:") is None

    def test_prose_with_colon_not_matched(self):
        assert find_glued_label("meet @ the cafe: thanks") is None
        assert (
            find_glued_label("comments: would recommend to others") is None
        )

    def test_no_colon_no_match(self):
        # colon evidence is required: a value that merely ENDS with words
        # resembling a label must not split
        assert find_glued_label("mary novak blood type") is None


class TestInkGap:
    def _page(self):
        gray = np.full((40, 200), 255, np.uint8)
        gray[10:30, 10:80] = 0  # left ink block
        gray[10:30, 120:190] = 0  # right ink block (gap 80..120)
        return gray

    def test_snaps_to_gap(self):
        quad = np.array(
            [[5, 5], [195, 5], [195, 35], [5, 35]], np.float32
        )
        frac = find_ink_gap(self._page(), quad, frac=0.5)
        # gap center ~100 px -> frac ~0.5 within the 190 px box
        assert frac is not None
        assert abs(frac * 190 + 5 - 100) < 8

    def test_no_gap_returns_none(self):
        gray = np.full((40, 200), 255, np.uint8)
        gray[10:30, 10:190] = 0  # continuous ink
        quad = np.array(
            [[5, 5], [195, 5], [195, 35], [5, 35]], np.float32
        )
        assert find_ink_gap(gray, quad, frac=0.5) is None

    def test_blank_box_returns_none(self):
        gray = np.full((40, 200), 255, np.uint8)
        quad = np.array(
            [[5, 5], [195, 5], [195, 35], [5, 35]], np.float32
        )
        assert find_ink_gap(gray, quad, frac=0.5) is None


class TestSplitQuad:
    def test_axis_aligned_split(self):
        quad = np.array(
            [[0, 0], [100, 0], [100, 20], [0, 20]], np.float32
        )
        left, right = split_quad(quad, 0.3)
        assert abs(left[1][0] - 30) < 1e-4 and abs(right[0][0] - 30) < 1e-4
        assert left[0][0] == 0 and right[1][0] == 100


class TestPlanSplits:
    def test_plans_only_verified_splits(self):
        gray = np.full((40, 200), 255, np.uint8)
        gray[10:30, 10:80] = 0
        gray[10:30, 120:190] = 0
        boxes = [
            DetectedBox(
                quad=np.array(
                    [[5, 5], [195, 5], [195, 35], [5, 35]], np.float32
                ),
                score=0.9,
            ),
            DetectedBox(
                quad=np.array(
                    [[5, 5], [195, 5], [195, 35], [5, 35]], np.float32
                ),
                score=0.9,
            ),
        ]
        texts = ["mary novakbiood:type", "Phone: 555-0142"]
        plan = plan_splits(gray, boxes, texts)
        assert len(plan) == 1
        i, left, right, label = plan[0]
        assert i == 0 and label == "Blood Type"
        # split in the ink gap
        assert 80 < left[1][0] < 120
