"""Classical CV detector tests (host-only, no model weights)."""

import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from ocr_system_tpu.core.config import Settings
from ocr_system_tpu.engine.classical_detector import ClassicalDetector

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def render(lines, size=(800, 400), font_size=28):
    img = Image.new("RGB", size, "white")
    d = ImageDraw.Draw(img)
    f = ImageFont.truetype(FONT, font_size)
    for i, text in enumerate(lines):
        d.text((40, 40 + i * 70), text, fill="black", font=f)
    return np.asarray(img)


@pytest.fixture(scope="module")
def det(tmp_path_factory):
    root = tmp_path_factory.mktemp("cls")
    return ClassicalDetector(Settings(storage_root=str(root)))


class TestClassicalDetector:
    def test_word_level_boxes(self, det):
        page = render(["INVOICE 12345", "Name: John Smith"])
        res = det.detect_batch([page])[0]
        # 2 + 3 words
        assert len(res.boxes) == 5
        for b in res.boxes:
            assert b.quad.shape == (4, 2)
            assert 0 < b.score <= 1.0

    def test_boxes_cover_ink(self, det):
        page = render(["Hello"])
        res = det.detect_batch([page])[0]
        assert len(res.boxes) == 1
        q = res.boxes[0].quad
        # the text starts at x=40,y=40 with ~28px size
        assert q[0][0] < 45 and q[0][1] < 45
        assert q[2][0] > 80 and q[2][1] > 55

    def test_blank_page(self, det):
        page = np.full((200, 300, 3), 255, np.uint8)
        res = det.detect_batch([page])[0]
        assert res.boxes == []

    def test_deskews_rotated_page(self, det):
        import cv2

        page = render(["Some skewed text line here", "and another one below it",
                       "plus a third for signal"], size=(600, 300), font_size=20)
        m = cv2.getRotationMatrix2D((300, 150), -4.0, 1.0)
        rot = cv2.warpAffine(page, m, (600, 300), borderValue=(255, 255, 255))
        res = det.detect_batch([rot])[0]
        assert abs(res.skew_angle) > 2.0  # detected + corrected
        assert len(res.boxes) >= 10

    def test_engine_dispatch(self, tmp_path):
        from ocr_system_tpu.engine.pipeline import JaxOCREngine, get_engine

        s = Settings(
            ocr_engine="classical", storage_root=str(tmp_path),
            rec_width_buckets=(80,), det_image_buckets=(256,),
        )
        eng = get_engine(s)
        assert isinstance(eng, JaxOCREngine)
        assert isinstance(eng.detector, ClassicalDetector)


class TestHybridMerge:
    def _box(self, x0, y0, x1, y1, score=0.9):
        from ocr_system_tpu.ops.boxes import DetectedBox

        q = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32
        )
        return DetectedBox(quad=q, score=score)

    def test_union_dedups_overlaps_neural_wins(self):
        from ocr_system_tpu.engine.hybrid_detector import merge_boxes

        neural = [self._box(10, 10, 100, 30, 0.92)]
        classical = [
            self._box(12, 11, 98, 29, 0.8),   # same word -> dropped
            self._box(10, 60, 80, 80, 0.8),   # neural miss -> kept
        ]
        merged = merge_boxes(neural, classical)
        assert len(merged) == 2
        assert merged[0].score == 0.92  # neural first
        assert merged[1].score <= 0.6  # classical fill-in capped

    def test_disjoint_all_kept(self):
        from ocr_system_tpu.engine.hybrid_detector import merge_boxes

        neural = [self._box(0, 0, 50, 20)]
        classical = [self._box(0, 40, 50, 60), self._box(100, 0, 150, 20)]
        assert len(merge_boxes(neural, classical)) == 3

    def test_engine_registry_exposes_hybrid(self, settings):
        from ocr_system_tpu.engine.pipeline import _build_engine
        from ocr_system_tpu.engine.hybrid_detector import HybridDetector

        eng = _build_engine("hybrid", settings)
        assert isinstance(eng.detector, HybridDetector)

    @pytest.mark.slow
    def test_hybrid_detect_batch_contract(self, settings, form_image):
        from ocr_system_tpu.engine.hybrid_detector import HybridDetector

        det = HybridDetector(settings)
        res = det.detect_batch([form_image])[0]
        assert res.page is not None
        assert isinstance(res.boxes, list)
        for b in res.boxes:
            assert b.quad.shape == (4, 2)
