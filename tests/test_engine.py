"""Engine-level tests: contract shape, fake engine, tiny jax engine e2e."""

import numpy as np
import pytest

from ocr_system_tpu.engine.pipeline import (
    FakeOCREngine,
    JaxOCREngine,
    combine_markdown,
)
from ocr_system_tpu.engine.preprocess import (
    PageImage,
    compress_to_limit,
    decode_image,
    encode_jpeg,
    load_document,
    pick_bucket,
)


class TestPreprocessHost:
    def test_decode_roundtrip(self, form_image):
        data = encode_jpeg(form_image, quality=95)
        out = decode_image(data)
        assert out.shape == form_image.shape

    def test_compress_to_limit(self, form_image):
        data = compress_to_limit(form_image, max_bytes=50_000)
        assert len(data) <= 50_000

    def test_load_document_image(self, form_png):
        pages = load_document(form_png, "form.png")
        assert len(pages) == 1
        assert pages[0].page_number == 1
        assert pages[0].pixels.shape == (400, 600, 3)

    def test_load_document_bad_data(self):
        with pytest.raises(Exception):
            load_document(b"not an image", "x.png")

    def test_pick_bucket(self):
        assert pick_bucket(500, (640, 960)) == 640
        assert pick_bucket(700, (640, 960)) == 960
        assert pick_bucket(2000, (640, 960)) == 960


def test_combine_markdown_single_page_passthrough():
    assert combine_markdown(["hello"]) == "hello"


def test_combine_markdown_multi_page_separators():
    out = combine_markdown(["a", "b"])
    assert "## Page 1" in out and "## Page 2" in out


class TestFakeEngine:
    def test_contract_shape(self, settings, form_png):
        eng = FakeOCREngine(settings, text="NAME John")
        res = eng.process_document(form_png, "form.png")
        assert res.success
        assert res.total_pages == 1
        assert res.combined_markdown == "NAME John"
        boxes = res.combined_layout_boxes
        assert all(
            set(b) == {"type", "content", "confidence", "polygon", "page_number"}
            for b in boxes
        )
        assert all(len(b["polygon"]) == 8 for b in boxes)

    def test_decode_failure_is_structured(self, settings):
        res = FakeOCREngine(settings).process_document(b"garbage", "x.png")
        assert not res.success
        assert res.error


@pytest.mark.slow
class TestJaxEngineE2E:
    def test_detects_synthetic_text_bars(self, settings, form_image):
        eng = JaxOCREngine(settings)
        out = eng.process_page(PageImage(form_image, 1))
        assert out.success
        assert out.page_width == 600
        # untrained det finds *something* or nothing — the contract holds
        for b in out.layout_boxes:
            assert len(b["polygon"]) == 8
            poly = np.array(b["polygon"]).reshape(4, 2)
            assert (poly[:, 0] <= 600).all() and (poly[:, 1] <= 400).all()

    def test_status(self, settings):
        eng = JaxOCREngine(settings)
        st = eng.get_status()
        assert st["available"] and st["engine"] == "jax"

    def test_canvas_reuse_matches_host_path(self, settings, form_image):
        """The det->rec device-canvas handoff (one page upload per wave) must
        decode identically to the host re-upload path."""
        eng = JaxOCREngine(settings)
        pages = [
            PageImage(form_image[:256, :256].copy(), 1),
            PageImage(255 - form_image[:256, :256].copy(), 2),
        ]
        dets = eng.det_stage(pages)
        assert dets[0].canvas_stack is not None
        assert abs(dets[0].canvas_scale - 1.0) < 1e-6
        # fixed quads (don't depend on untrained det finding boxes)
        quads_list = [
            np.array(
                [[[30, 40], [200, 40], [200, 58], [30, 58]],
                 [[30, 80], [150, 80], [150, 98], [30, 98]]],
                np.float32,
            ),
            np.array(
                [[[30, 120], [220, 120], [220, 138], [30, 138]]], np.float32
            ),
        ]
        dev = eng._recognize(pages, dets, quads_list)
        # force the host path and compare
        for d in dets:
            d.canvas_stack = None
        host = eng._recognize(pages, dets, quads_list)
        assert [[r.text for r in row] for row in dev] == [
            [r.text for r in row] for row in host
        ]

    def test_rec_profile_stash_reruns(self, settings, form_image):
        """The profiler's rec-device timing re-runs the wave's stashed
        (compiled fn, device args) dispatches — the re-run must decode to
        exactly what the wave decoded."""
        import jax

        from ocr_system_tpu.ops import ctc

        eng = JaxOCREngine(settings)
        dets = eng.det_stage([PageImage(form_image[:256, :256].copy(), 1)])
        quads = [
            np.array([[[30, 40], [200, 40], [200, 58], [30, 58]]], np.float32)
        ]
        rec = eng.recognizer
        rec._profile_stash = stash = []
        try:
            rows = rec.recognize_on_device_stack(dets[0].canvas_stack, quads)
        finally:
            rec._profile_stash = None
        assert len(stash) == 1
        run, args = stash[0]
        ids, conf, _ = run(*args)
        jax.block_until_ready((ids, conf))
        assert ctc.ids_to_text(ids, rec.charset)[0] == rows[0][0].text

    def test_mixed_alignment_splits_dispatch_paths(self, settings, form_image):
        """A rotated quad must not drag axis-aligned crops off the fast
        separable path: a mixed wave dispatches each subset down its own
        path and decodes identically to path-pure waves."""
        eng = JaxOCREngine(settings)
        dets = eng.det_stage([PageImage(form_image[:256, :256].copy(), 1)])
        aa = np.array(
            [[[30, 40], [200, 40], [200, 58], [30, 58]],
             [[30, 80], [150, 80], [150, 98], [30, 98]]], np.float32
        )
        rot = np.array(
            [[[30, 120], [218, 128], [216, 146], [28, 138]]], np.float32
        )
        rec = eng.recognizer
        rec._profile_stash = stash = []
        try:
            mixed = rec.recognize_on_device_stack(
                dets[0].canvas_stack, [np.concatenate([aa, rot])]
            )
        finally:
            rec._profile_stash = None
        kinds = sorted(k[0] for k in rec._fn_cache)
        assert len(stash) == 2 and kinds == ["maabbrec", "mcroprec"]
        pure_aa = rec.recognize_on_device_stack(dets[0].canvas_stack, [aa])
        pure_rot = rec.recognize_on_device_stack(dets[0].canvas_stack, [rot])
        assert [r.text for r in mixed[0]] == [
            r.text for r in pure_aa[0]
        ] + [r.text for r in pure_rot[0]]

    def test_det_rec_breakdown_smoke(self, settings, form_image):
        """det_rec_breakdown returns wall timings and (when the det finds
        boxes) a device-timed rec figure plus compute-only throughput."""
        from ocr_system_tpu.utils.profiler import det_rec_breakdown

        eng = JaxOCREngine(settings)
        out = det_rec_breakdown(eng, [PageImage(form_image, 1)])
        assert out["wave_pages"] == 1
        assert out["det_wall"] > 0 and out["rec_wall"] > 0
        if "rec_device" in out:
            assert out["rec_device"] > 0
            assert out["compute_pages_per_s"] > 0


@pytest.mark.slow
class TestWire4:
    def test_wire4_detection_close_to_wire8(self, settings, form_image):
        """det_wire_bits=4 halves the page upload; the 16-level quantization
        must not change detection on high-contrast documents."""
        page = form_image[:256, :256].copy()
        e8 = JaxOCREngine(settings)
        s4 = settings.model_copy(update={"det_wire_bits": 4})
        e4 = JaxOCREngine(s4)
        d8 = e8.det_stage([PageImage(page, 1)])[0]
        d4 = e4.det_stage([PageImage(page, 1)])[0]
        assert d4.canvas_stack is not None
        assert d4.canvas_stack.shape == d8.canvas_stack.shape  # unpacked
        # canvases agree within the 4-bit quantization step
        import numpy as _np

        diff = _np.abs(
            _np.asarray(d4.canvas_stack).astype(int)
            - _np.asarray(d8.canvas_stack).astype(int)
        )
        assert diff.max() <= 17
        # box counts in the same ballpark (random-weights det; the contract
        # is that the wire format doesn't perturb the input meaningfully)
        assert abs(len(d4.boxes) - len(d8.boxes)) <= max(2, len(d8.boxes))

    def test_wire1_boxes_match_wire4(self, settings, form_image):
        """det_prob_wire_bits=1 fetches a device-binarized bitpacked mask
        (full geometric fidelity — same bin threshold) + a pooled score
        map. Box GEOMETRY must match the 4-bit wire exactly; only the
        score gate sees pooled values."""
        page = form_image[:256, :256].copy()
        s4 = settings.model_copy(update={"det_prob_wire_bits": 4})
        s1 = settings.model_copy(update={"det_prob_wire_bits": 1})
        d4 = JaxOCREngine(s4).det_stage([PageImage(page, 1)])[0]
        d1 = JaxOCREngine(s1).det_stage([PageImage(page, 1)])[0]
        import numpy as _np

        q4 = sorted(tuple(map(float, b.quad.reshape(-1))) for b in d4.boxes)
        q1 = sorted(tuple(map(float, b.quad.reshape(-1))) for b in d1.boxes)
        # same binarization -> same components; allow the pooled score
        # gate to drop AT MOST a borderline box or two
        matched = sum(
            1 for q in q1
            if any(_np.allclose(q, r, atol=1.0) for r in q4)
        )
        assert matched >= len(q1) - 2
        assert abs(len(q1) - len(q4)) <= 2

    def test_wire0_boxes_match_wire4(self, settings, form_image):
        """det_prob_wire_bits=0 computes component stats ON DEVICE
        (ops/device_boxes) and fetches only a (K, 7) tensor. Box geometry
        must match the 4-bit map path within quantization tolerance (mode 0
        scores are FULL precision, 4-bit quantizes to 1/16 — borderline
        score-gate boxes may differ)."""
        page = form_image[:256, :256].copy()
        s4 = settings.model_copy(update={"det_prob_wire_bits": 4})
        s0 = settings.model_copy(update={"det_prob_wire_bits": 0})
        d4 = JaxOCREngine(s4).det_stage([PageImage(page, 1)])[0]
        d0 = JaxOCREngine(s0).det_stage([PageImage(page, 1)])[0]
        import numpy as _np

        assert d0.canvas_stack is not None  # rec canvas handoff intact
        q4 = sorted(tuple(map(float, b.quad.reshape(-1))) for b in d4.boxes)
        q0 = sorted(tuple(map(float, b.quad.reshape(-1))) for b in d0.boxes)
        matched = sum(
            1 for q in q0
            if any(_np.allclose(q, r, atol=1.0) for r in q4)
        )
        assert matched >= len(q0) - 2
        assert abs(len(q0) - len(q4)) <= 2
