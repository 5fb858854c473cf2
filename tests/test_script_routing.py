"""Script detection + Devanagari re-segmentation + per-page routing tests
(Azure parity: any script on one endpoint, reference ocr_service.py:213-246).
"""

import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from ocr_system_tpu.engine.script import (
    has_headline,
    page_script,
    resegment_devanagari,
)
from ocr_system_tpu.models.charsets import get_charset
from ocr_system_tpu.ops.boxes import DetectedBox
from ocr_system_tpu.training.devanagari_font import ensure_font


@pytest.fixture(scope="module")
def deva_font():
    return ImageFont.truetype(str(ensure_font()), 28)


@pytest.fixture(scope="module")
def latin_font():
    return ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 28
    )


def render_text_page(lines, font, size=(640, 480)):
    """-> (page uint8 RGB, quads (N,4,2) one per line)."""
    img = Image.new("RGB", size, "white")
    d = ImageDraw.Draw(img)
    quads = []
    y = 30
    for text in lines:
        bbox = d.textbbox((30, y), text, font=font)
        d.text((30, y), text, fill="black", font=font)
        x0, y0, x1, y1 = bbox
        quads.append([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
        y = y1 + 25
    return np.asarray(img, np.uint8), np.array(quads, np.float32)


HINDI_LINES = ["नाम राशि कुल", "ग्राहक भुगतान", "चालान संख्या तारीख"]
LATIN_LINES = ["Name Total Amount", "Customer payment", "Invoice number"]


class TestScriptDetection:
    def test_devanagari_page(self, deva_font):
        page, quads = render_text_page(HINDI_LINES, deva_font)
        assert page_script(page, quads) == "devanagari"

    def test_latin_page(self, latin_font):
        page, quads = render_text_page(LATIN_LINES, latin_font)
        assert page_script(page, quads) == "latin"

    def test_latin_bold_caps_still_latin(self):
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 26
        )
        page, quads = render_text_page(
            ["TOTAL DUE NOW", "INVOICE 12345", "HELLO WORLD"], font
        )
        assert page_script(page, quads) == "latin"

    def test_empty_page_defaults_latin(self):
        page = np.full((200, 200, 3), 255, np.uint8)
        assert page_script(page, np.zeros((0, 4, 2), np.float32)) == "latin"

    def test_headline_crop_level(self, deva_font, latin_font):
        page, quads = render_text_page(["हस्ताक्षर विवरण"], deva_font)
        gray = np.asarray(Image.fromarray(page).convert("L"))
        q = quads[0].astype(int)
        crop = gray[q[0, 1]: q[2, 1], q[0, 0]: q[2, 0]]
        assert has_headline(crop)
        page2, quads2 = render_text_page(["ordinary words"], latin_font)
        gray2 = np.asarray(Image.fromarray(page2).convert("L"))
        q2 = quads2[0].astype(int)
        crop2 = gray2[q2[0, 1]: q2[2, 1], q2[0, 0]: q2[2, 0]]
        assert not has_headline(crop2)


class TestResegmentation:
    def test_merged_line_splits_into_words(self, deva_font):
        """One det box spanning a 3-word Hindi line -> one box per word."""
        page, quads = render_text_page(["नाम राशि कुल"], deva_font)
        merged = [DetectedBox(quad=quads[0].copy(), score=0.9)]
        out = resegment_devanagari(page, merged)
        assert len(out) == 3
        # words come out left-to-right, non-overlapping
        xs = sorted(float(b.quad[:, 0].min()) for b in out)
        assert xs == [float(b.quad[:, 0].min()) for b in
                      sorted(out, key=lambda b: b.quad[:, 0].min())]

    def test_midword_split_remerges(self, deva_font):
        """Two det boxes covering halves of ONE word -> merged, one box."""
        page, quads = render_text_page(["हस्ताक्षर"], deva_font)
        q = quads[0]
        xm = (q[0, 0] + q[1, 0]) / 2
        left = q.copy(); left[1, 0] = left[2, 0] = xm + 2
        right = q.copy(); right[0, 0] = right[3, 0] = xm - 2
        out = resegment_devanagari(
            page,
            [DetectedBox(quad=left, score=0.8),
             DetectedBox(quad=right, score=0.8)],
        )
        assert len(out) == 1

    def test_multirow(self, deva_font):
        page, quads = render_text_page(["नाम राशि", "कुल भुगतान"], deva_font)
        boxes = [DetectedBox(quad=q.copy(), score=0.9) for q in quads]
        out = resegment_devanagari(page, boxes)
        assert len(out) == 4

    def test_blank_box_kept(self):
        page = np.full((100, 300, 3), 255, np.uint8)
        q = np.array([[10, 10], [200, 10], [200, 40], [10, 40]], np.float32)
        boxes = [DetectedBox(quad=q, score=0.5)]
        out = resegment_devanagari(page, boxes)
        assert len(out) == 1

    def test_latin_text_would_oversplit_hence_routing(self, latin_font):
        """Sanity: the splitter applied to Latin DOES split at word gaps too
        (that's why it only runs on devanagari-classified pages)."""
        page, quads = render_text_page(["Name Total"], latin_font)
        out = resegment_devanagari(
            page, [DetectedBox(quad=quads[0].copy(), score=0.9)]
        )
        assert len(out) >= 2


class TestEngineRouting:
    def test_route_picks_devanagari_recognizer(self, deva_font, latin_font,
                                               tmp_path):
        """auto charset + available devanagari checkpoint: a Hindi page and
        a Latin page in one wave route to different recognizers."""
        from ocr_system_tpu.core.config import Settings
        from ocr_system_tpu.engine.detector import DetResult
        from ocr_system_tpu.engine.pipeline import JaxOCREngine
        from ocr_system_tpu.engine.preprocess import PageImage

        settings = Settings(
            rec_charset="auto",
            rec_checkpoint_devanagari="",  # default dir probe
            checkpoint_dir="checkpoints",
            det_image_buckets=(320,),
            rec_width_buckets=(80,),
            storage_root=str(tmp_path),
        )
        eng = JaxOCREngine(settings)
        hi_page, hi_quads = render_text_page(HINDI_LINES, deva_font)
        la_page, la_quads = render_text_page(LATIN_LINES, latin_font)
        pages = [PageImage(hi_page, 1), PageImage(la_page, 2)]
        dets = [
            DetResult(
                boxes=[DetectedBox(quad=q.copy(), score=0.9)
                       for q in hi_quads],
                skew_angle=0.0, page=hi_page,
            ),
            DetResult(
                boxes=[DetectedBox(quad=q.copy(), score=0.9)
                       for q in la_quads],
                skew_angle=0.0, page=la_page,
            ),
        ]
        recs = eng._route_and_normalize(pages, dets)
        assert recs[1] is eng.recognizer
        assert recs[0] is not eng.recognizer
        assert recs[0].charset.name == "devanagari"
        # the Hindi page's boxes were re-segmented into words
        assert len(dets[0].boxes) > len(hi_quads)

    def test_no_devanagari_checkpoint_falls_back(self, deva_font, tmp_path):
        from ocr_system_tpu.core.config import Settings
        from ocr_system_tpu.engine.detector import DetResult
        from ocr_system_tpu.engine.pipeline import JaxOCREngine
        from ocr_system_tpu.engine.preprocess import PageImage

        settings = Settings(
            rec_charset="auto",
            checkpoint_dir=str(tmp_path / "nothing"),
            det_image_buckets=(320,),
            rec_width_buckets=(80,),
            storage_root=str(tmp_path),
        )
        eng = JaxOCREngine(settings)
        hi_page, hi_quads = render_text_page(HINDI_LINES, deva_font)
        dets = [
            DetResult(
                boxes=[DetectedBox(quad=q.copy(), score=0.9)
                       for q in hi_quads],
                skew_angle=0.0, page=hi_page,
            )
        ]
        recs = eng._route_and_normalize([PageImage(hi_page, 1)], dets)
        assert recs == [eng.recognizer]
