"""Unit tests for round-3 decode/geometry refinements.

element_vote (extract/layout_model.py): sub-word tag-logit pooling.
_ink_snap(expand_only=True) (engine/detector.py): expand-only ink walk.
Both are pure host functions — no model, no mesh.
"""

import numpy as np

from ocr_system_tpu.engine.detector import _ink_snap
from ocr_system_tpu.extract.layout_model import (
    _I_BK,
    _I_BV,
    _I_IK,
    _I_IV,
    _I_O,
    element_vote,
)


def _logp_for(tags, n_tags=5, hot=0.0, cold=-10.0):
    """Log-prob matrix that argmaxes to `tags`."""
    lp = np.full((len(tags), n_tags), cold, np.float32)
    for i, t in enumerate(tags):
        lp[i, t] = hot
    return lp


class TestElementVote:
    def test_intra_word_churn_pools_to_one_kind(self):
        # one word box 'Organisation ' with churned tags: majority VAL
        text = "Organisation "
        tags = np.array(
            [_I_BK] + [_I_IV] * 3 + [_I_IK] + [_I_IV] * 7 + [_I_O],
            np.int32,
        )
        word_of = [0] * len(text)
        out = element_vote(
            _logp_for(tags), tags, word_of, len(text), text
        )
        kinds = {int(t) for t in out[:12]}  # the non-space chars
        assert kinds == {_I_BV, _I_IV}  # pooled to a single VAL span

    def test_kvkv_row_box_preserves_alternation(self):
        # ONE det box containing two pairs: 'Name: Anna Date: May'
        text = "Name: Anna Date: May "
        k, v, o = _I_IK, _I_IV, _I_O
        tags = np.array(
            [k] * 5 + [o] + [v] * 4 + [o] + [k] * 5 + [o] + [v] * 3 + [o],
            np.int32,
        )
        word_of = [0] * len(text)
        out = element_vote(
            _logp_for(tags), tags, word_of, len(text), text
        )
        # four sub-words, kinds K V K V — whole-box pooling would destroy
        assert out[0] == _I_BK and all(out[1:5] == _I_IK)
        assert out[6] == _I_BV and all(out[7:10] == _I_IV)
        assert out[11] == _I_BK and all(out[12:16] == _I_IK)
        assert out[17] == _I_BV

    def test_same_kind_subwords_merge_across_space(self):
        # 'Anna Rossi' both VAL: separator space takes I-VAL so one span
        text = "Anna Rossi "
        tags = np.array([_I_IV] * 4 + [_I_O] + [_I_IV] * 5 + [_I_O], np.int32)
        word_of = [0] * len(text)
        out = element_vote(
            _logp_for(tags), tags, word_of, len(text), text
        )
        assert out[0] == _I_BV
        assert out[4] == _I_IV  # the space continues the span
        assert all(out[5:10] == _I_IV)


def _page(h=60, w=200, bg=255):
    return np.full((h, w), bg, np.uint8)


class TestInkExpand:
    def test_expands_to_glyph_band(self):
        # ink rows 20..40 (a 20px-tall title with inter-glyph gaps, like
        # real text — a SOLID full-width band would read as a table rule),
        # DB box covers only 26..34
        page = _page()
        for x in range(50, 150, 10):
            page[20:40, x:x + 6] = 0
        quad = np.array(
            [[50, 26], [150, 26], [150, 34], [50, 34]], np.float32
        )
        _ink_snap(page, quad, expand_only=True)
        assert quad[:, 1].min() <= 20
        assert quad[:, 1].max() >= 39

    def test_never_tightens(self):
        # box much taller than the ink: expand-only leaves it alone
        page = _page()
        page[28:32, 50:150] = 0
        quad = np.array(
            [[50, 10], [150, 10], [150, 50], [50, 50]], np.float32
        )
        before = quad.copy()
        _ink_snap(page, quad, expand_only=True)
        assert quad[:, 1].min() <= before[:, 1].min()
        assert quad[:, 1].max() >= before[:, 1].max()

    def test_rule_row_stops_the_walk(self):
        # glyph band 26..34; a full-width table rule at rows 20-21 and a
        # second text row above it must NOT be swallowed
        page = _page()
        page[26:34, 50:150] = 0     # the box's own glyphs
        page[20:22, 0:200] = 0      # horizontal table rule
        page[8:16, 50:150] = 0      # neighbor row above the rule
        quad = np.array(
            [[50, 27], [150, 27], [150, 33], [50, 33]], np.float32
        )
        _ink_snap(page, quad, expand_only=True)
        assert quad[:, 1].min() >= 22  # stopped at the rule
        assert quad[:, 1].max() <= 40

class TestForceInlineSplit:
    """Decode assist for model-unreadable (Devanagari) inline rows."""

    def _run(self, text, tags):
        from ocr_system_tpu.extract.layout_model import force_inline_split

        word_of = [0] * len(text)
        return force_inline_split(
            np.array(tags, np.int32), word_of, text, len(text)
        )

    def test_deva_inline_single_kind_splits_at_colon(self):
        text = "कुल: राखा "
        out = self._run(text, [_I_IK] * len(text))
        p = text.index(":")
        assert out[0] == _I_BK and all(out[1: p + 1] == _I_IK)
        q = p + 2  # skip separator space
        assert out[q] == _I_BV and all(out[q + 1: len(text) - 1] == _I_IV)

    def test_deva_key_ascii_value_splits(self):
        # < 40% deva overall, but the key side is 100% deva — must split
        text = "तोनीह:2009-04-15 "
        out = self._run(text, [_I_IV] * len(text))
        p = text.index(":")
        assert out[0] == _I_BK and out[p] == _I_IK
        assert out[p + 1] == _I_BV
        assert all(out[p + 2: len(text) - 1] == _I_IV)

    def test_latin_inline_untouched(self):
        # the model reads Latin; its (even single-kind) tagging stands
        text = "Total: 99 "
        tags = [_I_IV] * len(text)
        out = self._run(text, tags)
        assert all(out == np.array(tags))

    def test_model_split_box_untouched(self):
        # mixed K/V tags = the model already split; assist must not fire
        text = "कुल: राखा "
        tags = [_I_BK, _I_IK, _I_IK, _I_IK, _I_O] + [_I_IV] * 5
        out = self._run(text, tags)
        assert all(out == np.array(tags, np.int32))

    def test_digit_left_side_not_key_shaped(self):
        # a Devanagari-page time-like value must not split ('12:30' family)
        text = "12:30 "
        out = self._run(text, [_I_IV] * len(text))
        assert all(out == _I_IV)


class TestCropScript:
    def _render(self, text, font_path, size=22):
        from PIL import Image, ImageDraw, ImageFont

        f = ImageFont.truetype(font_path, size)
        img = Image.new("L", (360, 60), 255)
        d = ImageDraw.Draw(img)
        d.text((8, 8), text, fill=0, font=f)
        return np.asarray(img, np.uint8)

    def test_ascii_value_crop_is_latin(self):
        from ocr_system_tpu.engine.script import crop_script

        crop = self._render(
            "51,191.67 USD",
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
        )
        assert crop_script(crop) == "latin"

    def test_deva_word_crop_is_devanagari(self):
        from ocr_system_tpu.engine.script import crop_script
        from ocr_system_tpu.training.devanagari_font import ensure_font

        crop = self._render("ग्राहक रोपी", str(ensure_font()))
        assert crop_script(crop) == "devanagari"

    def test_blank_crop_defaults_latin(self):
        from ocr_system_tpu.engine.script import crop_script

        assert crop_script(np.full((40, 120), 255, np.uint8)) == "latin"


class TestSpanLevelInlineSplit:
    """decode_tags span-level deva colon split: a det row-merge can deliver
    'जेखा:' 'बुमे' 'ताजे' as separate word boxes that all pool to KEY and
    geometric-merge into one key span — the span must split at the inline
    colon instead of swallowing its value and stealing the next field's."""

    def _decode(self, text, tags):
        from ocr_system_tpu.extract.layout_model import decode_tags

        n = len(text)
        types = np.zeros(n, np.int64)
        conf = np.full(n, 0.9)
        # contiguous boxes along one row, ~10px per char
        boxes = np.array(
            [[10 + 10 * i, 10, 20 + 10 * i, 24] for i in range(n)],
            np.float32,
        )
        return decode_tags(np.array(tags), types, conf, text, boxes, n)

    def test_deva_all_key_span_splits_at_colon(self):
        text = "जेखा: बुमे ताजे"
        tags = [1] + [2] * (len(text) - 1)  # one merged KEY span
        fields = self._decode(text, tags)
        got = {f.field_key: f.field_value for f in fields}
        assert got == {"जेखा": "बुमे ताजे"}

    def test_multi_field_merge_splits_every_colon(self):
        # ADVICE r3: a det row-merge spanning TWO inline deva fields must
        # yield both pairs, not leave the second key inside the first value
        text = "जेखा: १२ बुमे: ४५"
        tags = [1] + [2] * (len(text) - 1)
        fields = self._decode(text, tags)
        got = {f.field_key: f.field_value for f in fields}
        assert got == {"जेखा": "१२", "बुमे": "४५"}

    def test_multi_field_merge_latin_value_kept_whole(self):
        # a Latin-digit value between two deva keys must not be eaten
        text = "जेखा: 12 A बुमे: xy"
        tags = [1] + [2] * (len(text) - 1)
        fields = self._decode(text, tags)
        got = {f.field_key: f.field_value for f in fields}
        assert got == {"जेखा": "12 A", "बुमे": "xy"}

    def test_latin_all_key_span_does_not_split(self):
        # the trained model is authoritative on Latin — a Latin key span
        # containing a colon stays one span (deva gate)
        text = "Name: Anna"
        tags = [1] + [2] * (len(text) - 1)
        fields = self._decode(text, tags)
        assert all(f.field_key != "Name" for f in fields)


class TestReadingOrderSort:
    """extract_from_layout must feed tokens in READING order (train/serve
    skew fix): training streams are row-clustered reading order, but the
    engine delivers word boxes in rec-dispatch order. Scrambled order broke
    the decode geometric merge — 'Fuii Name' + 'Signature:' (same row,
    stream running right-to-left -> NEGATIVE gap) glued into one key and
    orphaned the signature value (seed-5251 doc 6)."""

    def test_word_boxes_sorted_before_tokenize(self, settings, monkeypatch):
        from ocr_system_tpu.extract import layout_model as LM

        ex = LM.LayoutModelExtractor(settings)
        seen: list[list[str]] = []

        class _Captured(Exception):
            pass

        def spy(word_boxes, page_wh, charset, max_len):
            seen.append([b["content"] for b in word_boxes])
            raise _Captured  # skip the (slow) forward pass

        monkeypatch.setattr(LM, "tokenize_layout", spy)

        def box(content, x, y):
            return {
                "type": "word", "content": content, "page_number": 1,
                "polygon": [x, y, x + 40, y, x + 40, y + 14, x, y + 14],
            }

        scrambled = [
            box("Mary", 360, 190),       # row 2
            box("Full Name", 340, 155),  # row 1, RIGHT of Signature
            box("Signature:", 50, 153),  # row 1, leftmost
            box("Date:", 50, 230),       # row 3
        ]
        try:
            ex.extract_from_layout(scrambled, (960, 960), ocr_text="")
        except _Captured:
            pass
        assert seen, "tokenize_layout never called"
        assert seen[0] == ["Signature:", "Full Name", "Mary", "Date:"]


class TestDigitGlyphRescue:
    """pipeline._digit_glyph_rescue: low-confidence crops on PURE-Latin
    pages re-decode with the Devanagari recognizer (digit glyphs of the
    deva font face garble under the Latin model); an alt read is accepted
    only at higher confidence with no Devanagari codepoints."""

    def _fake_engine(self, alt_results, charset="auto", conf=0.95):
        class FakeSelf:
            class settings:  # noqa: N801 - attribute bag
                script_rescue_conf = conf
                rec_charset = charset

            recognizer = object()

            def _devanagari_recognizer(self):
                return "deva-rec"

            def _recognize_with(self, rec, pages, dets, masked):
                # one page; return alt results aligned with the mask
                assert rec == "deva-rec"
                k = sum(len(m) for m in masked)
                assert k == len(alt_results)
                return [list(alt_results)]

        return FakeSelf()

    def test_rescues_digit_glyph_garble(self):
        import numpy as np

        from ocr_system_tpu.engine.pipeline import JaxOCREngine
        from ocr_system_tpu.engine.recognizer import RecResult

        out = [[RecResult("?o1?-o2-1]", 0.5), RecResult("clean", 0.99)]]
        quads = [np.zeros((2, 4, 2), np.float32)]
        fake = self._fake_engine([RecResult("2013-02-13", 0.8)])
        JaxOCREngine._digit_glyph_rescue(fake, [None], [None], quads, out)
        assert out[0][0].text == "2013-02-13"
        assert out[0][1].text == "clean"  # above threshold: untouched

    def test_deva_text_never_injected(self):
        import numpy as np

        from ocr_system_tpu.engine.pipeline import JaxOCREngine
        from ocr_system_tpu.engine.recognizer import RecResult

        out = [[RecResult("blurry", 0.5)]]
        quads = [np.zeros((1, 4, 2), np.float32)]
        fake = self._fake_engine([RecResult("राम", 0.99)])
        JaxOCREngine._digit_glyph_rescue(fake, [None], [None], quads, out)
        assert out[0][0].text == "blurry"

    def test_lower_confidence_alt_rejected(self):
        import numpy as np

        from ocr_system_tpu.engine.pipeline import JaxOCREngine
        from ocr_system_tpu.engine.recognizer import RecResult

        out = [[RecResult("9157", 0.9)]]
        quads = [np.zeros((1, 4, 2), np.float32)]
        fake = self._fake_engine([RecResult("9757", 0.6)])
        JaxOCREngine._digit_glyph_rescue(fake, [None], [None], quads, out)
        assert out[0][0].text == "9157"

    def test_disabled_when_routing_off(self):
        import numpy as np

        from ocr_system_tpu.engine.pipeline import JaxOCREngine
        from ocr_system_tpu.engine.recognizer import RecResult

        out = [[RecResult("x", 0.1)]]
        quads = [np.zeros((1, 4, 2), np.float32)]
        fake = self._fake_engine([RecResult("y", 0.99)], charset="latin")
        JaxOCREngine._digit_glyph_rescue(fake, [None], [None], quads, out)
        assert out[0][0].text == "x"
