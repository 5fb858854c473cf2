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
