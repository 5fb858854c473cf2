"""Selection-mark (checkbox) detection: geometric CC analysis on host.

Azure Document Intelligence emits `selection_mark` layout boxes with a
checked state alongside words/lines (reference:
backend/services/ocr_service.py:314-321 — `{"type": "selection_mark",
"state": "selected"|"unselected", "confidence", "polygon", "page_number"}`),
which feed the checkbox validator (validation_service.py:404-425). The TPU
rebuild's neural det head is trained on text, so checkboxes are found the
way they are actually distinctive: as hollow square connected components.

Pipeline (host-side, numpy + the native CC op — checkboxes are rare, tiny,
and control-flow heavy, exactly the work SURVEY §7 keeps off the device):

  ink mask -> connected components -> near-square, box-sized components
  with high BORDER coverage and low interior fill -> selection marks;
  interior ink fraction decides selected/unselected.

Text glyphs fail the border test (no closed square outline), filled table
cells fail the size/aspect test, and ruling-line intersections fail the
4-side coverage test.
"""

from __future__ import annotations

import numpy as np

# geometry gates, in units of the component bounding box
MIN_SIDE_PX = 8          # smaller than this: speckle / glyph dots
MAX_SIDE_PX = 64         # larger: framed images, table cells
MAX_ASPECT = 1.45        # |w/h| and |h/w| must stay under this
MIN_BORDER_COVER = 0.75  # fraction of each side's pixels that must be ink
MAX_SOLID_FILL = 0.85    # fully solid blobs are bullets, not checkboxes
CHECKED_MIN_FILL = 0.12  # interior ink fraction that means "selected"


def _ink_mask(page: np.ndarray) -> np.ndarray:
    try:
        import cv2
    except ImportError:
        cv2 = None
    if page.ndim == 2:
        gray = page
    elif cv2 is not None:
        gray = cv2.cvtColor(page, cv2.COLOR_RGB2GRAY)  # SIMD, no f64 temps
    else:
        gray = (
            0.299 * page[..., 0] + 0.587 * page[..., 1] + 0.114 * page[..., 2]
        ).astype(np.uint8)
    if cv2 is not None:
        # MEAN window, not GAUSSIAN: 9 ms vs 61 ms per 960² page on the
        # 1-core serving host, bit-identical mask on document pages (the
        # Gaussian's soft window only matters on photographic gradients)
        thresh = cv2.adaptiveThreshold(
            np.ascontiguousarray(gray, np.uint8), 255,
            cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY_INV, 31, 15,
        )
        return (thresh > 0).astype(np.uint8)
    t = gray.mean() - gray.std()
    return (gray < t).astype(np.uint8)


def _components(mask: np.ndarray):
    """-> (labels, n, bboxes[n+1, 4] as x0,y0,x1,y1 inclusive).

    cv2's connectedComponentsWithStats is ~3x the native cc_label on
    full-page masks (SIMD two-pass, bboxes included, GIL released) — the
    native op stays as the fallback and for the small prob-map labelings
    in ops/boxes."""
    try:
        import cv2

        n_all, labels, stats, _ = cv2.connectedComponentsWithStats(
            np.ascontiguousarray(mask, np.uint8), connectivity=8
        )
        n = n_all - 1  # row 0 is background
        bboxes = np.zeros((n + 1, 4), np.int32)
        if n:
            x = stats[1:, cv2.CC_STAT_LEFT]
            y = stats[1:, cv2.CC_STAT_TOP]
            w = stats[1:, cv2.CC_STAT_WIDTH]
            h = stats[1:, cv2.CC_STAT_HEIGHT]
            bboxes[1:, 0] = x
            bboxes[1:, 1] = y
            bboxes[1:, 2] = x + w - 1
            bboxes[1:, 3] = y + h - 1
        return labels.astype(np.int32), n, bboxes
    except ImportError:
        pass
    try:
        from ocr_system_tpu.native import cc_label

        labels, n = cc_label.label(mask)
        if n == 0:
            return labels, 0, np.zeros((1, 4), np.int32)
        _, _, bboxes = cc_label.stats(labels, mask.astype(np.float32), n)
        return labels, n, bboxes
    except Exception:
        from scipy import ndimage

        labels, n = ndimage.label(mask, structure=np.ones((3, 3), int))
        bboxes = np.zeros((n + 1, 4), np.int32)
        for comp in range(1, n + 1):
            ys, xs = np.nonzero(labels == comp)
            bboxes[comp] = [xs.min(), ys.min(), xs.max(), ys.max()]
        return labels, n, bboxes


def page_components(page: np.ndarray):
    """Shared ink mask + connected components for the host post-passes.

    detect_selection_marks, detect_handwriting (and anything else reading
    page ink) use the SAME mask and labeling — computing it once per page
    halves the host post-process cost, which profiling showed dominating
    the rec stage wall (adaptiveThreshold + CC ran 2x per page at ~36 ms
    while the recognition dispatch itself took 30 ms for the whole wave)."""
    mask = _ink_mask(np.ascontiguousarray(page))
    labels, n, bboxes = _components(mask)
    return mask, labels, n, bboxes


def detect_selection_marks(
    page: np.ndarray, page_number: int = 1, cc=None
) -> list[dict]:
    """page: (H, W[, 3]) uint8 -> Azure-shaped selection_mark layout boxes.
    cc: optional precomputed page_components(page) tuple."""
    mask, labels, n, bboxes = cc if cc is not None else page_components(page)
    marks: list[dict] = []
    for comp in range(1, n + 1):
        x0, y0, x1, y1 = (int(v) for v in bboxes[comp])
        w, h = x1 - x0 + 1, y1 - y0 + 1
        if not (MIN_SIDE_PX <= w <= MAX_SIDE_PX
                and MIN_SIDE_PX <= h <= MAX_SIDE_PX):
            continue
        if max(w / h, h / w) > MAX_ASPECT:
            continue
        comp_mask = labels[y0: y1 + 1, x0: x1 + 1] == comp
        fill = float(comp_mask.mean())
        if fill > MAX_SOLID_FILL:
            continue  # solid bullet/blob
        # border coverage: every one of the 4 sides must be mostly ink.
        # 2-px bands tolerate 1-px raster jitter in the outline.
        band = 2 if min(w, h) >= 12 else 1
        top = comp_mask[:band, :].any(axis=0).mean()
        bottom = comp_mask[-band:, :].any(axis=0).mean()
        left = comp_mask[:, :band].any(axis=1).mean()
        right = comp_mask[:, -band:].any(axis=1).mean()
        side_cover = min(top, bottom, left, right)
        if side_cover < MIN_BORDER_COVER:
            continue
        # interior fill decides the state — use the FULL ink mask, not just
        # this component: a check/cross stroke that touches the outline is
        # part of the component, a floating tick is its own component.
        iy0, iy1 = y0 + band + 1, y1 - band
        ix0, ix1 = x0 + band + 1, x1 - band
        if iy1 <= iy0 or ix1 <= ix0:
            continue
        interior = mask[iy0:iy1, ix0:ix1]
        interior_fill = float(interior.mean())
        selected = interior_fill >= CHECKED_MIN_FILL
        # confidence: how cleanly it reads as a box (border closure) plus
        # how decisive the interior evidence is
        decisive = min(abs(interior_fill - CHECKED_MIN_FILL) / 0.1, 1.0)
        conf = round(float(min(0.55 + 0.3 * side_cover + 0.15 * decisive,
                               0.99)), 4)
        marks.append(
            {
                "type": "selection_mark",
                "state": "selected" if selected else "unselected",
                "content": "",
                "confidence": conf,
                "polygon": [
                    float(x0), float(y0), float(x1 + 1), float(y0),
                    float(x1 + 1), float(y1 + 1), float(x0), float(y1 + 1),
                ],
                "page_number": page_number,
            }
        )
    return marks


def marks_to_fields(marks: list[dict], layout_boxes: list[dict]) -> list[dict]:
    """Pair each selection mark with its text label -> checkbox field dicts
    `{"field_key", "field_value" ("yes"/"no"), "field_type": "checkbox",
    "confidence", "page_number"}` — what the reference's Gemini emits when it
    reads '☑ Male' (and validate_checkbox accepts, validation_service
    CHECKBOX_VALUES). Label = nearest same-row word run, preferring text to
    the RIGHT of the mark (the dominant forms convention: '[x] Option')."""
    words = [b for b in layout_boxes
             if b.get("type") == "word" and b.get("content", "").strip()]
    fields: list[dict] = []
    for m in marks:
        mx = m["polygon"][0::2]
        my = m["polygon"][1::2]
        m_x0, m_x1 = min(mx), max(mx)
        m_yc = (min(my) + max(my)) / 2.0
        m_h = max(max(my) - min(my), 1.0)
        same_row = [
            w for w in words
            if w.get("page_number") == m.get("page_number")
            and abs((min(w["polygon"][1::2]) + max(w["polygon"][1::2])) / 2.0
                    - m_yc) < m_h * 1.2
        ]
        if not same_row:
            continue

        def gap(w):
            wx = w["polygon"][0::2]
            left_gap = min(wx) - m_x1       # text to the right of the mark
            right_gap = m_x0 - max(wx)      # text to the left of the mark
            if left_gap >= 0:
                return left_gap             # prefer right-side labels
            if right_gap >= 0:
                return right_gap + m_h * 2  # left-side: pay a small penalty
            return m_h * 10                 # overlapping text: last resort

        nearest = min(same_row, key=gap)
        if gap(nearest) > m_h * 8:
            continue  # nothing plausibly labels this mark
        # extend the label along contiguous words on the same side
        direction = 1 if min(nearest["polygon"][0::2]) >= m_x1 else -1
        run = [nearest]
        candidates = sorted(
            (w for w in same_row if w is not nearest),
            key=lambda w: min(w["polygon"][0::2]),
        )
        if direction < 0:
            candidates = candidates[::-1]
        edge = (max if direction > 0 else min)(run[0]["polygon"][0::2])
        for w in candidates:
            wx0, wx1 = min(w["polygon"][0::2]), max(w["polygon"][0::2])
            if direction > 0 and 0 <= wx0 - edge <= m_h * 1.5:
                run.append(w)
                edge = wx1
            elif direction < 0 and 0 <= edge - wx1 <= m_h * 1.5:
                run.insert(0, w)
                edge = wx0
        label = " ".join(w["content"] for w in run).strip().rstrip(":")
        if not label:
            continue
        fields.append(
            {
                "field_key": label,
                "field_value": "yes" if m["state"] == "selected" else "no",
                "field_type": "checkbox",
                "confidence": m["confidence"],
                "page_number": m.get("page_number", 1),
            }
        )
    return fields


def filter_marks_against_words(
    marks: list[dict], word_boxes: list[dict], max_overlap: float = 0.3
) -> list[dict]:
    """Drop marks that sit mostly inside recognized TEXT (glyphs like 'O',
    'D' or table-cell digits can survive the geometry gates). A mark
    legitimately overlaps the text box of its label, so only high overlap
    with a box that actually decoded text disqualifies it."""
    out = []
    for m in marks:
        mx = m["polygon"][0::2]
        my = m["polygon"][1::2]
        m_area = max((mx[2] - mx[0]) * (my[2] - my[0]), 1e-6)
        keep = True
        for wb in word_boxes:
            if wb.get("type") != "word" or not wb.get("content", "").strip():
                continue
            wx = wb["polygon"][0::2]
            wy = wb["polygon"][1::2]
            ix = min(max(mx), max(wx)) - max(min(mx), min(wx))
            iy = min(max(my), max(wy)) - max(min(my), min(wy))
            if ix > 0 and iy > 0 and (ix * iy) / m_area > max_overlap:
                keep = False
                break
        if keep:
            out.append(m)
    return out
