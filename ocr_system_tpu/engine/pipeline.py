"""The OCR engine: page pixels -> markdown + layout boxes.

Implements the exact service contract the reference defines
(ocr_service.py:48-104 `OCROutput`/`DocumentOCRResult` and :695-731
`process_document`) so everything above the engine — orchestration, bbox
matching, persistence, REST, frontend — is engine-agnostic, the same seam the
reference demonstrates with its three interchangeable engine files.

Layout boxes follow the Azure shape captured in azure_debug_output.json:
    {"type": "word|line|paragraph", "content": str, "confidence": float,
     "polygon": [x0,y0,x1,y1,x2,y2,x3,y3], "page_number": int}
with page_dimensions as pixel-scale width/height (the frontend handles this
scale, working_viewer.py:112-114).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

import numpy as np

from ocr_system_tpu.core.config import Settings, get_settings
from ocr_system_tpu.engine import reading_order
from ocr_system_tpu.engine.detector import Detector
from ocr_system_tpu.engine.preprocess import PageImage, load_document
from ocr_system_tpu.engine.recognizer import Recognizer


@dataclass
class OCROutput:
    """Per-page OCR result (reference OCROutput, ocr_service.py:48-79)."""

    success: bool
    markdown: str = ""
    html: str = ""
    json_content: dict = field(default_factory=dict)
    layout_boxes: list[dict] = field(default_factory=list)
    page_number: int = 1
    page_width: float = 0.0
    page_height: float = 0.0
    processing_time_ms: float = 0.0
    error: str | None = None
    processed_image: np.ndarray | None = None  # (H, W, 3) uint8 for overlay UI


@dataclass
class DocumentOCRResult:
    """Whole-document result (reference DocumentOCRResult, ocr_service.py:82-104)."""

    success: bool
    pages: list[OCROutput] = field(default_factory=list)
    combined_markdown: str = ""
    combined_html: str = ""
    total_pages: int = 0
    processing_time_ms: float = 0.0
    error: str | None = None
    # per-stage serving breakdown from the PageScheduler's StageTimer
    # (det_wait / rec / det_rec) — SURVEY §5.1's device-side timing story
    stage_times_ms: dict = field(default_factory=dict)

    @property
    def combined_layout_boxes(self) -> list[dict]:
        return [b for p in self.pages for b in p.layout_boxes]


class JaxOCREngine:
    """The local TPU det+rec engine (replaces Azure, engine='jax')."""

    name = "jax"

    def __init__(
        self,
        settings: Settings | None = None,
        detector: Detector | None = None,
        recognizer: Recognizer | None = None,
    ):
        self.settings = settings or get_settings()
        self.detector = detector or Detector(self.settings)
        self.recognizer = recognizer or Recognizer(self.settings)
        # script routing (rec_charset=auto): per-script recognizers built
        # lazily — the devanagari one only when its checkpoint exists, so a
        # latin-only deployment pays nothing
        self._script_recognizers: dict[str, Recognizer] = {}

    # -- script routing (Azure parity: any script, one endpoint) --

    def _devanagari_recognizer(self) -> Recognizer | None:
        if "devanagari" not in self._script_recognizers:
            import os

            ckpt = self.settings.rec_checkpoint_devanagari
            if not ckpt:
                default = os.path.join(
                    self.settings.checkpoint_dir, "rec_devanagari"
                )
                ckpt = default if os.path.isdir(default) else ""
            if not ckpt and self.settings.rec_charset == "auto":
                self._script_recognizers["devanagari"] = None
            else:
                from ocr_system_tpu.models.charsets import get_charset

                s = self.settings.model_copy(
                    update={"rec_checkpoint": ckpt}
                )
                self._script_recognizers["devanagari"] = Recognizer(
                    s, charset=get_charset("devanagari")
                )
        return self._script_recognizers["devanagari"]

    def _route_and_normalize(self, pages, dets):
        """Per-page recognizer choice + Devanagari box re-segmentation.
        Routing activates under rec_charset=auto when a devanagari
        recognizer is available; otherwise every page uses the primary.

        Returns, per page, either ONE Recognizer (every box) or a list of
        Recognizers aligned with that page's boxes: Hindi forms are
        script-mixed at the box level (Devanagari keys, ASCII values —
        amounts, dates, emails, 'signed'), and the devanagari charset
        cannot even represent ASCII letters, so ASCII crops on a Hindi
        page route back to the primary Latin recognizer (Azure-parity:
        reference ocr_service.py:213-246 reads both scripts per page)."""
        n = len(pages)
        from ocr_system_tpu.engine import script as script_mod

        def _host_view(p, d):
            # the host post passes only need LUMA; detect_batch computed it
            # once (DetResult.gray) — every _to_gray downstream passes a 2D
            # array through unchanged
            if d.gray is not None:
                return d.gray
            return d.page if d.page is not None else p.pixels

        def split_cols(p, d):
            if self.settings.det_split_column_gaps:
                d.boxes = script_mod.split_column_merged(
                    _host_view(p, d), d.boxes
                )

        if self.settings.rec_charset not in ("auto", "devanagari"):
            for p, d in zip(pages, dets):
                split_cols(p, d)
            return [self.recognizer] * n

        deva = (
            self.recognizer
            if self.settings.rec_charset == "devanagari"
            else self._devanagari_recognizer()
        )
        if deva is None:
            for p, d in zip(pages, dets):
                split_cols(p, d)
            return [self.recognizer] * n
        def route_one(p, d):
            pixels = _host_view(p, d)
            quads = np.array(
                [b.quad for b in d.boxes], np.float32
            ).reshape(-1, 4, 2)
            if self.settings.rec_charset == "devanagari":
                sc = "devanagari"
            else:
                sc = script_mod.page_script(pixels, quads)
            if sc == "devanagari":
                d.boxes = script_mod.resegment_devanagari(
                    pixels, d.boxes,
                    pad_ratio=self.settings.deva_reseg_pad_ratio,
                    latin_pad_ratio=self.settings.det_box_pad_ratio,
                )
                if (deva is not self.recognizer
                        and self.settings.deva_percrop_routing):
                    gray = script_mod._to_gray(pixels)
                    return [
                        deva
                        if script_mod.crop_script(
                            script_mod._crop_aabb(gray, b.quad)
                        ) == "devanagari"
                        else self.recognizer
                        for b in d.boxes
                    ]
                return deva
            split_cols(p, d)
            return self.recognizer

        if n <= 1:
            return [route_one(p, d) for p, d in zip(pages, dets)]
        # host-bound per-page work (ink CC voting), GIL-releasing — same
        # rationale as the parallel _finish_page in rec_stage
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, n)) as ex:
            return list(ex.map(lambda pd: route_one(*pd), zip(pages, dets)))

    # -- single page --

    def process_page(self, page: PageImage) -> OCROutput:
        return self.process_pages([page])[0]

    def _finish_page(self, page: PageImage, det, t0: float, recs=None) -> OCROutput:
        # crops and the overlay image come from the DESKEWED page the boxes
        # were detected on (det.page), not the raw upload
        pixels = det.page if det.page is not None else page.pixels
        quads = np.array([b.quad for b in det.boxes], np.float32).reshape(-1, 4, 2)
        if recs is None:
            recs = self.recognizer.recognize_page(pixels, quads)

        blocks = []
        word_boxes: list[dict] = []
        for b, r in zip(det.boxes, recs):
            conf = float(min(b.score, r.confidence) if r.text else b.score * 0.5)
            blocks.append(
                reading_order.TextBlock(quad=b.quad, text=r.text, confidence=conf)
            )
            word_boxes.append(
                {
                    "type": "word",
                    "content": r.text,
                    "confidence": round(conf, 4),
                    "polygon": b.flat_polygon(),
                    "page_number": page.page_number,
                }
            )
        from ocr_system_tpu.extract.tables import find_tables

        table_boxes = [
            t.to_layout_box() for t in find_tables(word_boxes, page.page_number)
        ]
        mark_boxes: list[dict] = []
        cc = getattr(det, "cc", None)
        if cc is None and (self.settings.enable_selection_marks
                           or self.settings.enable_handwriting_detection):
            from ocr_system_tpu.engine.selection_marks import page_components

            # shared mask+CC: one pass per page, on the det stage's luma
            # (normally precomputed in the DET WORKER thread — DetResult.cc
            # — so this runs only for detectors that don't stash it)
            cc = page_components(det.gray if det.gray is not None else pixels)
        if self.settings.enable_selection_marks:
            from ocr_system_tpu.engine.selection_marks import (
                detect_selection_marks,
                filter_marks_against_words,
            )

            mark_boxes = filter_marks_against_words(
                detect_selection_marks(pixels, page.page_number, cc=cc),
                word_boxes,
            )
        if self.settings.enable_handwriting_detection:
            from ocr_system_tpu.engine.handwriting import detect_handwriting

            hand_boxes = detect_handwriting(
                pixels, word_boxes, page.page_number, cc=cc
            )
            mark_boxes += hand_boxes
            if hand_boxes:
                # a det box over a handwriting region decodes to symbol
                # soup ('\\W^M') — the handwriting box is the authoritative
                # artifact for the region, so drop the garbage word from the
                # TEXT (markdown/lines) AND from layout_data: downstream the
                # extractor would otherwise pair the label with the soup
                # (field value '\\/W,') and handwriting_to_fields can even
                # pick the soup word as the nearest label.
                def in_hand(cx: float, cy: float) -> bool:
                    for hb in hand_boxes:
                        hx = hb["polygon"][0::2]
                        hy = hb["polygon"][1::2]
                        if (min(hx) <= cx <= max(hx)
                                and min(hy) <= cy <= max(hy)):
                            return True
                    return False

                blocks = [
                    b for b in blocks
                    if not in_hand(float(b.quad[:, 0].mean()),
                                   float(b.quad[:, 1].mean()))
                ]
                word_boxes = [
                    w for w in word_boxes
                    if not in_hand(
                        sum(w["polygon"][0::2]) / 4.0,
                        sum(w["polygon"][1::2]) / 4.0,
                    )
                ]
        lines = reading_order.order_blocks(blocks)
        line_boxes = [
            {
                "type": "line",
                "content": ln.text,
                "confidence": round(ln.confidence, 4),
                "polygon": [float(v) for v in ln.quad.reshape(-1)],
                "page_number": page.page_number,
            }
            for ln in lines
        ]
        markdown = reading_order.to_markdown(lines)
        elapsed = (time.perf_counter() - t0) * 1000.0
        return OCROutput(
            success=True,
            markdown=markdown,
            html="<br>\n".join(ln.text for ln in lines),
            json_content={"lines": [ln.text for ln in lines]},
            layout_boxes=word_boxes + line_boxes + table_boxes + mark_boxes,
            page_number=page.page_number,
            page_width=float(page.width),
            page_height=float(page.height),
            processing_time_ms=elapsed,
            processed_image=pixels,
        )

    # -- document (the OCRService.process_document contract) --

    def process_document(self, data: bytes, filename: str) -> DocumentOCRResult:
        t0 = time.perf_counter()
        try:
            pages = load_document(data, filename, dpi=self.settings.pdf_raster_dpi)
        except Exception as e:  # decode failure is a structured error, not a crash
            return DocumentOCRResult(success=False, error=f"decode failed: {e}")
        from ocr_system_tpu.engine.scheduler import PageScheduler

        scheduler = PageScheduler(self, self.settings)
        outputs = scheduler.process(pages)
        combined_md = combine_markdown([p.markdown for p in outputs])
        combined_html = "\n<hr>\n".join(p.html for p in outputs)
        return DocumentOCRResult(
            success=all(p.success for p in outputs) and bool(outputs),
            pages=outputs,
            combined_markdown=combined_md,
            combined_html=combined_html,
            total_pages=len(outputs),
            processing_time_ms=(time.perf_counter() - t0) * 1000.0,
            error=None if outputs else "no pages decoded",
            stage_times_ms=scheduler.timer.as_ms(),
        )

    def process_pages(self, pages: list[PageImage]) -> list[OCROutput]:
        """Batched path: detection runs on the whole page batch at once, and
        recognition batches every page's crops together (replaces the
        reference's Semaphore(1) serial page loop, ocr_service.py:620-627)."""
        t0 = time.perf_counter()
        dets = self.det_stage(pages)
        return self.rec_stage(pages, dets, t0)

    # split stages so the scheduler can pipeline waves: det of wave N+1
    # dispatches (and its host box extraction runs) while rec of wave N is
    # blocked on the device — the 45 ms/dispatch tunnel latency and host
    # postprocess hide behind device compute instead of adding to it

    def det_stage(self, pages: list[PageImage]):
        dets = self.detector.detect_batch([p.pixels for p in pages])
        # script routing + Devanagari resegmentation run HERE, not in
        # rec_stage: under the scheduler's pipelining the det worker thread
        # pays this host work (page-script ink voting was ~150 ms of the
        # 8-page wave) while the main thread runs rec of the previous wave
        routing = self._route_and_normalize(pages, dets)
        for d, r in zip(dets, routing):
            d.routing = r
        return dets

    # pages letterbox to detection canvases at scale s<=1; recognition crops
    # from those canvases only above this scale (below it the canvas has
    # meaningfully less resolution than the page and CER would pay for the
    # saved transfer)
    REC_CANVAS_MIN_SCALE = 0.98

    # wall-time breakdown of the last rec_stage call (OCR_DET_PROFILE=1)
    last_rec_profile: dict | None = None

    def rec_stage(
        self, pages: list[PageImage], dets, t0: float | None = None
    ) -> list[OCROutput]:
        import os as _os

        prof = {} if _os.environ.get("OCR_DET_PROFILE") == "1" else None
        t0 = time.perf_counter() if t0 is None else t0
        _t = time.perf_counter()
        if all(d.routing is not None for d in dets):
            recognizers = [d.routing for d in dets]  # det stage already routed
        else:
            recognizers = self._route_and_normalize(pages, dets)
        if prof is not None:
            prof["route"] = time.perf_counter() - _t
            _t = time.perf_counter()
        quads_list = [
            np.array([b.quad for b in d.boxes], np.float32).reshape(-1, 4, 2)
            for d in dets
        ]
        if self.settings.rec_tighten_y:
            from ocr_system_tpu.engine import script as script_mod

            quads_list = [
                script_mod.tighten_y(
                    d.page if d.page is not None else p.pixels, q
                )
                for p, d, q in zip(pages, dets, quads_list)
            ]
        recs_list = self._recognize(pages, dets, quads_list, recognizers)
        if prof is not None:
            prof["recognize"] = time.perf_counter() - _t
            _t = time.perf_counter()
        if self.settings.det_glue_split:
            self._split_glued(pages, dets, recs_list, recognizers)
        if prof is not None:
            prof["glue_split"] = time.perf_counter() - _t
            _t = time.perf_counter()
            JaxOCREngine.last_rec_profile = prof
        if len(pages) <= 1:
            return [
                self._finish_page(p, d, t0, recs=r)
                for p, d, r in zip(pages, dets, recs_list)
            ]
        # page finishing is host-bound numpy/cv2/C++-CC work that releases
        # the GIL (ink mask, selection marks, handwriting, reading order) —
        # profiled at ~36 ms/page vs 30 ms for the whole wave's recognition
        # dispatch, so finish pages in parallel rather than serially
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(pages))) as ex:
            out = list(
                ex.map(
                    lambda pdr: self._finish_page(
                        pdr[0], pdr[1], t0, recs=pdr[2]
                    ),
                    zip(pages, dets, recs_list),
                )
            )
        if prof is not None:
            prof["finish"] = time.perf_counter() - _t
        return out

    def _split_glued(self, pages, dets, recs_list, recognizers) -> None:
        """Lexicon-guided re-segmentation of column-merged det boxes (see
        engine/glue_split.py): text says '<value><known label>:', pixels
        confirm a column gap -> split the quad there and re-recognize both
        halves in ONE batched dispatch. The split is kept only when the
        right half still reads as the label (sanity gate: a wrong split
        would decode the label garbled)."""
        from ocr_system_tpu.engine import glue_split
        from ocr_system_tpu.engine.recognizer import _to_gray
        from ocr_system_tpu.extract.postfix import _cer, clean_key
        from ocr_system_tpu.ops.boxes import DetectedBox

        plans: list[tuple[int, list]] = []
        for i, (p, d, recs) in enumerate(zip(pages, dets, recs_list)):
            # Latin primary pages only: the glue family is multi-column
            # Latin forms; deva pages already re-segment by shirorekha
            if recognizers[i] is not self.recognizer or not d.boxes:
                continue
            texts = [r.text for r in recs]
            if not any(":" in t for t in texts):
                continue
            gray = (
                d.gray if d.gray is not None
                else _to_gray(d.page if d.page is not None else p.pixels)
            )
            plan = glue_split.plan_splits(gray, d.boxes, texts)
            if plan:
                plans.append((i, plan))
        if not plans:
            return
        rec_pages, rec_quads = [], []
        for i, plan in plans:
            d = dets[i]
            rec_pages.append(d.page if d.page is not None else pages[i].pixels)
            rec_quads.append(
                np.stack(
                    [q for _, lq, rq, _lab in plan for q in (lq, rq)]
                ).astype(np.float32)
            )
        half_recs = self.recognizer.recognize_pages(rec_pages, rec_quads)
        for (i, plan), halves in zip(plans, half_recs):
            d, recs = dets[i], recs_list[i]
            for k in range(len(plan) - 1, -1, -1):  # reverse: indices stay valid
                bi, lq, rq, label = plan[k]
                lrec, rrec = halves[2 * k], halves[2 * k + 1]
                if not lrec.text.strip() or not rrec.text.strip():
                    continue
                right_key = clean_key(rrec.text).lower()
                if _cer(label.lower(), right_key) > 0.5:
                    continue  # right half no longer reads as the label
                score = d.boxes[bi].score
                d.boxes[bi : bi + 1] = [
                    DetectedBox(quad=lq, score=score),
                    DetectedBox(quad=rq, score=score),
                ]
                recs[bi : bi + 1] = [lrec, rrec]

    def _recognize(self, pages, dets, quads_list, recognizers=None):
        """Dispatch recognition, grouped by recognizer assignment (a wave
        is usually single-script: one dispatch; mixed Latin+Hindi waves pay
        one dispatch per script present). Assignment granularity is
        per-PAGE (a Recognizer entry) or per-BOX (a list of Recognizers
        aligned with that page's boxes — Hindi forms carry ASCII value
        crops that route back to the Latin recognizer)."""
        if recognizers is None:
            recognizers = [self.recognizer] * len(pages)
        # normalize to per-box assignment
        assign: list[list[Recognizer]] = [
            r if isinstance(r, list) else [r] * len(q)
            for r, q in zip(recognizers, quads_list)
        ]
        recs: dict[int, Recognizer] = {
            id(r): r for row in assign for r in row
        }
        if len(recs) <= 1:
            only = next(iter(recs.values())) if recs else self.recognizer
            res = self._recognize_with(only, pages, dets, quads_list)
            if only is self.recognizer:
                self._digit_glyph_rescue(pages, dets, quads_list, res)
            return res
        empty = np.zeros((0, 4, 2), np.float32)
        out: list[list] = [[None] * len(q) for q in quads_list]
        for rid, rec in recs.items():
            sel_list = [
                [j for j, rr in enumerate(row) if id(rr) == rid]
                for row in assign
            ]
            masked = [
                q[sel] if sel else empty
                for q, sel in zip(quads_list, sel_list)
            ]
            sub = self._recognize_with(rec, pages, dets, masked)
            for i, sel in enumerate(sel_list):
                for k, j in enumerate(sel):
                    out[i][j] = sub[i][k]
        self._confidence_rescue(pages, dets, quads_list, assign, recs, out)
        return out

    def _confidence_rescue(
        self, pages, dets, quads_list, assign, recs, out
    ) -> None:
        """Re-decode low-confidence crops on script-MIXED pages with the
        page's other recognizer, keeping the higher-confidence read.

        The shirorekha router sees geometry, not glyph provenance: a
        digits-only row on a Hindi page has no headline so it routes to
        the Latin recognizer — but Hindi pages draw digits in the
        Devanagari font face, whose digit glyphs the Latin model never
        trained on ('827964687' read as '?79%4%87' at conf ~0.4 while
        the Devanagari model reads those glyphs natively). Symmetric and
        self-limiting: only pages that already carry BOTH recognizers
        are eligible, so pure-Latin waves pay nothing."""
        thresh = self.settings.script_rescue_conf
        if thresh <= 0 or len(recs) <= 1:
            return
        empty = np.zeros((0, 4, 2), np.float32)
        for rid, rec in recs.items():
            sel_list = []
            for i, row in enumerate(assign):
                present = {id(r) for r in row}
                sel = [
                    j for j, rr in enumerate(row)
                    if id(rr) != rid and rid in present
                    and out[i][j] is not None
                    and out[i][j].confidence < thresh
                ]
                sel_list.append(sel)
            if not any(sel_list):
                continue
            masked = [
                q[sel] if sel else empty
                for q, sel in zip(quads_list, sel_list)
            ]
            sub = self._recognize_with(rec, pages, dets, masked)
            for i, sel in enumerate(sel_list):
                for k, j in enumerate(sel):
                    alt = sub[i][k]
                    if alt is not None and alt.confidence > out[i][j].confidence:
                        out[i][j] = alt

    def _digit_glyph_rescue(self, pages, dets, quads_list, out) -> None:
        """Re-decode low-confidence crops on PURE-Latin pages with the
        Devanagari recognizer when script routing is active.

        _confidence_rescue only fires on pages that already carry both
        recognizers — but a LATIN form can still carry crops drawn in the
        Devanagari font face: digits/punct are covered by every font, so
        a date or phone VALUE sometimes renders in the Devanagari face,
        whose digit glyphs the Latin model garbles ('2013-02-13' read as
        '?o1?-o2-1]'; measured forms_e2e loss family, seed 5251 doc 6).
        The deva model reads those glyphs natively — and since the deva
        face has no Latin LETTERS at all, this family is digits/punct
        only, so an alt read is accepted only when (a) its confidence is
        higher and (b) it contains no Devanagari codepoints. That gate
        makes cross-script injection impossible on Latin pages."""
        thresh = self.settings.script_rescue_conf
        if thresh <= 0 or self.settings.rec_charset != "auto":
            return
        deva = self._devanagari_recognizer()
        if deva is None or deva is self.recognizer:
            return

        def digit_plausible(text: str) -> bool:
            # the deva model's glyph coverage can only rescue DIGIT/punct
            # runs — its charset has no Latin letters, so a crop whose read
            # is clearly wordy can never take the alt. Letters that are
            # classic digit confusions (o/0, l/1, s/5, b/8, z/2, g/9, q/4,
            # i/1, ?) still count as digit evidence ('2013-02-13' misreads
            # as '?o1?-o2-1]'). Without this gate a low-confidence glyph
            # page re-dispatched 1099/1254 crops for zero possible gain
            # (measured: the rescue pass nearly doubled rec wall).
            if not text.strip():
                return True
            core = [c for c in text if c != " "]
            wordy = sum(
                c.isalpha() and c.lower() not in "oliszbgq" for c in core
            )
            return wordy <= 0.3 * len(core)

        empty = np.zeros((0, 4, 2), np.float32)
        sel_list = [
            [
                j for j, r in enumerate(row)
                if r is not None and r.confidence < thresh
                and digit_plausible(r.text)
            ]
            for row in out
        ]
        if not any(sel_list):
            return
        masked = [
            q[sel] if sel else empty
            for q, sel in zip(quads_list, sel_list)
        ]
        sub = self._recognize_with(deva, pages, dets, masked)
        is_deva = lambda t: any("ऀ" <= c <= "ॿ" for c in t)
        for i, sel in enumerate(sel_list):
            for k, j in enumerate(sel):
                alt = sub[i][k]
                if (alt is not None
                        and alt.confidence > out[i][j].confidence
                        and alt.text.strip()
                        and not is_deva(alt.text)):
                    out[i][j] = alt

    def _recognize_with(self, recognizer, pages, dets, quads_list):
        """Route recognition through the det stage's device-resident canvases
        when they carry full page resolution (one page upload per wave
        instead of two — the tunnel wire is the throughput ceiling, see
        detector.py module docstring); host path otherwise."""
        reusable = all(
            d.canvas_stack is not None
            and d.canvas_scale >= self.REC_CANVAS_MIN_SCALE
            for d in dets
        ) and len({id(d.canvas_stack) for d in dets}) == 1
        if not reusable or not dets:
            rec_pages = [
                d.page if d.page is not None else p.pixels
                for p, d in zip(pages, dets)
            ]
            return recognizer.recognize_pages(rec_pages, quads_list)

        stack = dets[0].canvas_stack
        row_quads: list[np.ndarray] = [
            np.zeros((0, 4, 2), np.float32)
        ] * stack.shape[0]
        for d, q in zip(dets, quads_list):
            row_quads[d.canvas_row] = (q * d.canvas_scale).astype(np.float32)
        row_recs = recognizer.recognize_on_device_stack(stack, row_quads)
        return [row_recs[d.canvas_row] for d in dets]

    def warmup(self, wave: int | None = None) -> dict:
        """Load/compile the serving executables CONCURRENTLY, one thread
        per det bucket. A fresh process repays each cached executable as a
        remote load over the tunnel (~1-4 s each, measured); lazily they
        serialize on the first real request — ~74 s of first-page latency
        in the round-4 bench. Overlapping the loads (wire + remote server
        work, GIL-free) collapses that to ~max(load) per bucket group.
        Returns {bucket: seconds}. Reference analog: the lazy singleton
        warm pattern, ocr_service.py:126-160."""
        import threading

        wave = wave or max(self.settings.det_batch_size, 1)
        out: dict = {}

        def ink_page(sz: int) -> np.ndarray:
            # deterministic WORD-like rows (glyph strokes with letter gaps,
            # clear inter-word gaps): the trained det must emit a page-like
            # box count — rec executables key on the PADDED crop count, so
            # a blank or bar-only page would leave the serving-shape rec
            # executables to lazy-load on the first real request anyway
            rng = np.random.default_rng(12345)
            img = np.full((sz, sz, 3), 245, np.uint8)
            for y in range(40, sz - 40, 36):
                x = 30
                while x < sz - 80:
                    for _ in range(int(rng.integers(3, 8))):  # one word
                        w = int(rng.integers(3, 6))
                        img[y : y + 12, x : x + w] = 30
                        x += w + int(rng.integers(2, 4))
                    x += int(rng.integers(10, 22))  # inter-word gap
            return img

        def warm_bucket(sz: int) -> None:
            t0 = time.perf_counter()
            n = wave if sz == max(self.settings.det_image_buckets) else 1
            pages = [
                PageImage(pixels=ink_page(sz), page_number=i + 1)
                for i in range(n)
            ]
            try:
                self.process_pages(pages)
                out[sz] = round(time.perf_counter() - t0, 2)
            except Exception as e:  # warmup must never take serving down
                out[sz] = f"failed: {e}"

        threads = [
            threading.Thread(target=warm_bucket, args=(sz,), daemon=True)
            for sz in self.settings.det_image_buckets
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return out

    def get_status(self) -> dict:
        """Reference get_status contract (ocr_service.py:759-800)."""
        import jax

        return {
            "engine": self.name,
            "available": True,
            "devices": [str(d) for d in jax.devices()],
            "det_buckets": list(self.settings.det_image_buckets),
            "rec_buckets": list(self.settings.rec_width_buckets),
        }


class FakeOCREngine:
    """Deterministic engine for tests (the seam SURVEY.md §4 calls for).
    Returns a fixed layout so API/service tests need no model compile."""

    name = "fake"

    def __init__(self, settings: Settings | None = None, text: str | None = None):
        self.settings = settings or get_settings()
        self.text = text if text is not None else self.settings.fake_ocr_text

    def process_document(self, data: bytes, filename: str) -> DocumentOCRResult:
        try:
            pages = load_document(data, filename)
        except Exception as e:
            return DocumentOCRResult(success=False, error=str(e))
        outs = []
        for pg in pages:
            words = self.text.split()
            w = pg.width / max(len(words) * 2, 1)
            boxes = []
            for i, word in enumerate(words):
                x0 = (2 * i) * w
                poly = [x0, 10.0, x0 + w, 10.0, x0 + w, 30.0, x0, 30.0]
                boxes.append(
                    {
                        "type": "word",
                        "content": word,
                        "confidence": 0.99,
                        "polygon": poly,
                        "page_number": pg.page_number,
                    }
                )
            boxes.append(
                {
                    "type": "line",
                    "content": self.text,
                    "confidence": 0.99,
                    "polygon": [0.0, 10.0, pg.width * 1.0, 10.0, pg.width * 1.0, 30.0, 0.0, 30.0],
                    "page_number": pg.page_number,
                }
            )
            outs.append(
                OCROutput(
                    success=True,
                    markdown=self.text,
                    html=self.text,
                    json_content={"lines": [self.text]},
                    layout_boxes=boxes,
                    page_number=pg.page_number,
                    page_width=float(pg.width),
                    page_height=float(pg.height),
                    processing_time_ms=1.0,
                    processed_image=pg.pixels,
                )
            )
        return DocumentOCRResult(
            success=True,
            pages=outs,
            combined_markdown=combine_markdown([p.markdown for p in outs]),
            combined_html="<br>".join(p.html for p in outs),
            total_pages=len(outs),
            processing_time_ms=1.0,
        )

    def get_status(self) -> dict:
        return {"engine": self.name, "available": True}


def combine_markdown(pages_md: list[str]) -> str:
    """Reference _combine_markdown (ocr_service.py:737-746): '## Page N'
    separators between pages; single page passes through unchanged."""
    if len(pages_md) <= 1:
        return pages_md[0] if pages_md else ""
    return "\n\n".join(f"## Page {i + 1}\n\n{md}" for i, md in enumerate(pages_md))


_ENGINE_SINGLETON: dict[str, object] = {}
_ENGINE_LOCK = threading.Lock()


def get_engine(settings: Settings | None = None):
    """Engine selection + lazy singleton (reference: thread-safe lazy
    singleton with double-checked locking, ocr_service.py:126-160; selection
    flag config.py:70). The lock matters: two concurrent first requests
    would otherwise each build an engine and pay the ~60 s model compile
    twice."""
    s = settings or get_settings()
    key = s.ocr_engine
    if key in _ENGINE_SINGLETON:
        return _ENGINE_SINGLETON[key]
    with _ENGINE_LOCK:
        if key not in _ENGINE_SINGLETON:
            _ENGINE_SINGLETON[key] = _build_engine(key, s)
    return _ENGINE_SINGLETON[key]


def _build_engine(key: str, s: Settings):
    if key == "jax":
        return JaxOCREngine(s)
    if key == "classical":
        # classical CV detection + neural recognition: the no-weights
        # fallback engine (second engine variant; SURVEY §2.1 #9-11 seam)
        from ocr_system_tpu.engine.classical_detector import ClassicalDetector

        return JaxOCREngine(s, detector=ClassicalDetector(s))
    if key == "hybrid":
        # neural ∪ classical ensemble detection (third engine variant;
        # recall-oriented — see engine/hybrid_detector.py)
        from ocr_system_tpu.engine.hybrid_detector import HybridDetector

        return JaxOCREngine(s, detector=HybridDetector(s))
    if key == "fake":
        return FakeOCREngine(s)
    raise ValueError(f"unknown OCR engine {key!r}")
