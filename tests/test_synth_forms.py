"""Structured form generator + layout-extraction decode tests."""

import random

import numpy as np
import pytest

from ocr_system_tpu.models.charsets import get_charset
from ocr_system_tpu.training import synth_forms as SF


@pytest.fixture(scope="module")
def charset():
    return get_charset("multilingual")


@pytest.fixture(scope="module")
def specs():
    gen = SF.FormGenerator(seed=42)
    return [gen.generate(960) for _ in range(30)]


class TestGenerator:
    def test_pair_ids_index_pairs(self, specs):
        for spec in specs:
            for e in spec.elements:
                if e.role in ("key", "value", "kv"):
                    assert 0 <= e.pair_id < len(spec.pairs)
            # every pair has at least one value-bearing element
            for pid, (k, v, t) in enumerate(spec.pairs):
                roles = {e.role for e in spec.elements if e.pair_id == pid}
                assert roles & {"kv", "value"}, (pid, roles)

    def test_form_types_covered(self):
        gen = SF.FormGenerator(seed=7)
        seen = {gen.generate(960).form_type for _ in range(60)}
        assert len(seen) >= 6  # most of the 9 types appear

    def test_value_types_validate_cleanly(self, specs):
        from ocr_system_tpu.service.validation import ValidationService

        vs = ValidationService()
        n = ok = 0
        for spec in specs:
            for k, v, t in spec.pairs:
                if t in ("text", "signature", "checkbox"):
                    continue
                n += 1
                r = vs.validate_field(v, t, confidence=0.95)
                ok += bool(r.is_valid)
        assert n > 20
        assert ok / n > 0.9, f"only {ok}/{n} generated values validate"

    def test_deterministic(self):
        a = SF.FormGenerator(seed=5).generate(960)
        b = SF.FormGenerator(seed=5).generate(960)
        assert [e.text for e in a.elements] == [e.text for e in b.elements]
        assert a.pairs == b.pairs


class TestTokens:
    def test_shapes_and_alignment(self, specs, charset):
        ids, boxes, mask, tags, types, form = SF.spec_to_tokens(
            specs[0], charset, 512
        )
        n = int(mask.sum())
        assert ids.shape == (512,) and boxes.shape == (512, 4)
        assert n > 50
        # B tags start spans; an I tag never follows O of a different span
        for i in range(1, n):
            if tags[i] == 2:  # I-KEY
                assert tags[i - 1] in (1, 2)
            if tags[i] == 4:  # I-VAL
                assert tags[i - 1] in (3, 4)

    def test_value_spans_decode_back(self, specs, charset):
        spec = specs[1]
        ids, boxes, mask, tags, types, form = SF.spec_to_tokens(
            spec, charset, 1024
        )
        n = int(mask.sum())
        text = "".join(charset.id_to_char(int(i)) or " " for i in ids[:n])
        # every ground-truth value that fits appears in the token stream
        found = sum(1 for _, v, _ in spec.pairs if v in text)
        assert found >= len(spec.pairs) - 1

    def test_noise_keeps_tag_alignment(self, specs, charset):
        rng = random.Random(3)
        ids, boxes, mask, tags, types, form = SF.spec_to_tokens(
            specs[2], charset, 512, noise_rate=0.15, rng=rng
        )
        n = int(mask.sum())
        assert n > 50
        for i in range(1, n):
            if tags[i] == 2:
                assert tags[i - 1] in (1, 2)
            if tags[i] == 4:
                assert tags[i - 1] in (3, 4)

    def test_form_label_matches(self, specs, charset):
        from ocr_system_tpu.models.layout_extractor import FORM_TYPES

        for spec in specs[:5]:
            *_, form = SF.spec_to_tokens(spec, charset, 256)
            assert FORM_TYPES[form] == spec.form_type


class TestNoisySpec:
    def test_pairs_rebuilt_from_noisy_text(self, specs):
        rng = random.Random(11)
        noisy = SF.noisy_spec(specs[3], rng, rate=0.2)
        assert len(noisy.pairs) == len(specs[3].pairs)
        # ground truth equals what the noisy page shows
        page_text = " ".join(e.text for e in noisy.elements)
        for k, v, _ in noisy.pairs:
            if v.strip():
                assert v in page_text

    def test_zero_rate_is_identity(self, specs):
        rng = random.Random(1)
        noisy = SF.noisy_spec(specs[4], rng, rate=0.0)
        assert [e.text for e in noisy.elements] == [
            e.text for e in specs[4].elements
        ]
        assert noisy.pairs == specs[4].pairs


class TestWordBoxesAndText:
    def test_word_boxes_shape(self, specs):
        wb = SF.spec_to_word_boxes(specs[5])
        assert wb and all(len(b["polygon"]) == 8 for b in wb)
        # every box carries text except handwriting (squiggles have none)
        assert all(
            b["content"] or b["type"] == "handwriting" for b in wb
        )

    def test_ocr_text_contains_lines(self, specs):
        text = SF.spec_ocr_text(specs[5])
        assert len(text.splitlines()) >= 4


class TestRender:
    def test_render_spec_targets(self):
        spec = SF.FormGenerator(seed=9).generate(512)
        ps = SF.render_spec(spec)
        assert ps.image.shape == (512, 512, 3)
        assert len(ps.quads) == len(ps.texts) > 0
        assert ps.shrink_map.max() == 1.0
        assert 0.0 <= ps.thresh_map.max() <= 1.0

    def test_truth_pairs_are_rendered(self):
        """Every truth pair's key AND value must actually be drawn (or the
        pair flagged in dropped_pair_ids) — eval must never demand text
        that ran off the page. With the wrap-below overflow fix the drop
        rate itself must be rare (<2% of pairs over many forms)."""
        gen = SF.FormGenerator(seed=77)
        total = dropped = 0
        for _ in range(40):
            spec = gen.generate(960)
            SF.render_spec(spec, augment=False)
            drawn_pair_elems = {
                e.pair_id
                for e in spec.elements
                if e.pair_id >= 0 and e.x1 <= 960 and e.y1 <= 960
            }
            for i, (k, v, ft) in enumerate(spec.pairs):
                total += 1
                if i in spec.dropped_pair_ids:
                    dropped += 1
                    continue
                # undropped pairs must have an on-page element
                assert i in drawn_pair_elems, (
                    f"pair {i} ({k!r}: {v!r}) neither drawn nor dropped"
                )
            # dropped ids only refer to real pairs
            assert all(0 <= i < len(spec.pairs)
                       for i in spec.dropped_pair_ids)
        assert total > 100
        assert dropped / total < 0.02, (
            f"{dropped}/{total} pairs dropped — overflow wrap regressed"
        )

    def test_no_cross_pair_collisions(self):
        """KV elements from DIFFERENT pairs must not overlap (a col-1
        value drawn into col-2's label made det read one glued blob —
        'mary novakbiood:type' — killing BOTH fields, diag r4 seed 6260)."""
        for seed in (77, 123, 6260):
            gen = SF.FormGenerator(seed=seed)
            for _ in range(25):
                spec = gen.generate(960)
                kv = [e for e in spec.elements
                      if e.pair_id >= 0 and e.x1 <= 960 and e.y1 <= 960]
                for i, a in enumerate(kv):
                    for b in kv[i + 1:]:
                        if a.pair_id == b.pair_id:
                            continue
                        x_ov = min(a.x1, b.x1) - max(a.x0, b.x0)
                        y_ov = min(a.y1, b.y1) - max(a.y0, b.y0)
                        assert not (x_ov > 2 and y_ov > 2), (
                            f"seed {seed}: {a.text!r} overlaps {b.text!r}"
                        )

    def test_value_never_overlaps_key(self):
        """Tab-stop/leader clamps must not land the value on top of its
        key (overlapping ink poisons det training and makes the pair
        unreadable)."""
        gen = SF.FormGenerator(seed=123)
        for _ in range(40):
            spec = gen.generate(960)
            by_pair: dict[int, dict[str, object]] = {}
            for e in spec.elements:
                if e.pair_id >= 0 and e.role in ("key", "value"):
                    by_pair.setdefault(e.pair_id, {})[e.role] = e
            for pid, kv in by_pair.items():
                if "key" not in kv or "value" not in kv:
                    continue
                k, v = kv["key"], kv["value"]
                same_row = not (k.y1 <= v.y0 or v.y1 <= k.y0)
                if same_row:
                    assert v.x0 >= k.x1 or k.x0 >= v.x1, (
                        f"pair {pid}: value {v.text!r} overlaps key "
                        f"{k.text!r}"
                    )


class TestGeometricPairing:
    def test_two_column_interleave(self):
        """keyA keyB valueA valueB in reading order must pair by geometry,
        not adjacency."""
        from ocr_system_tpu.extract.layout_model import decode_tags

        # token stream: Ax(key col1) By(key col2) 1(val col1) 2(val col2)
        # (2-char keys: decode_tags drops 1-char alphabetic keys as noise)
        text = "AxBy12"
        tags = np.array([1, 2, 1, 2, 3, 3])  # B-K I-K B-K I-K B-V B-V
        types = np.zeros(6, np.int64)
        conf = np.full(6, 0.9)
        boxes = np.array(
            [
                [10, 10, 35, 20],  # key Ax, col 1
                [36, 10, 60, 20],
                [500, 10, 530, 20],  # key By, col 2
                [531, 10, 560, 20],
                [80, 10, 120, 20],  # val 1, right of Ax
                [580, 10, 620, 20],  # val 2, right of By
            ],
            np.float32,
        )
        fields = decode_tags(tags, types, conf, text, boxes, 6)
        got = {f.field_key: f.field_value for f in fields}
        assert got == {"Ax": "1", "By": "2"}

    def test_stacked_pairing(self):
        from ocr_system_tpu.extract.layout_model import decode_tags

        text = "K1V1"
        tags = np.array([1, 2, 3, 4])
        types = np.zeros(4, np.int64)
        conf = np.full(4, 0.9)
        boxes = np.array(
            [
                [100, 100, 160, 115],
                [100, 100, 160, 115],
                [100, 125, 150, 140],  # value directly below
                [100, 125, 150, 140],
            ],
            np.float32,
        )
        fields = decode_tags(tags, types, conf, text, boxes, 4)
        assert fields and fields[0].field_key == "K1"
        assert fields[0].field_value == "V1"

    def test_bio_repair_orphan_i_tags(self):
        """A span whose B token the model missed (I... run with no B) must
        still decode — conlleval-style repair promotes the orphan I to B."""
        from ocr_system_tpu.extract.layout_model import decode_tags

        text = "KeyVal"
        # 'Key' all I-KEY (no B), 'Val' all I-VAL (no B)
        tags = np.array([2, 2, 2, 4, 4, 4])
        types = np.zeros(6, np.int64)
        conf = np.full(6, 0.9)
        boxes = np.array(
            [[10, 10, 40, 20]] * 3 + [[60, 10, 90, 20]] * 3, np.float32
        )
        fields = decode_tags(tags, types, conf, text, boxes, 6)
        assert len(fields) == 1
        assert fields[0].field_key == "Key"
        assert fields[0].field_value == "Val"


class TestFormEvalHarness:
    def test_rules_baseline_runs(self):
        from ocr_system_tpu.extract.rules import RuleExtractor
        from ocr_system_tpu.training.evaluate import evaluate_form_extraction

        res = evaluate_form_extraction(
            RuleExtractor(), n_docs=8, noise_rate=0.0
        )
        # rules catch the inline-colon cases but miss geometry-only pairs
        assert 0.05 < res.f1 < 0.95
        assert res.form_type_accuracy > 0.3
