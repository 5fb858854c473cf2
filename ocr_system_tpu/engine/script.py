"""Per-page script detection + Devanagari word re-segmentation.

Azure serves any script on one endpoint with zero configuration (reference:
backend/services/ocr_service.py:213-246 — the Hindi test image and Latin
invoices hit the same `begin_analyze_document` call). The rebuild's
recognizers are per-charset, so serving parity needs two host-side pieces:

1. `page_script`: classify a detected page as latin/devanagari so the
   engine can route its crops to the right recognizer checkpoint. The
   discriminating feature is the shirorekha — the headline stroke that runs
   along the top of Devanagari words. Latin text has no near-full-width
   horizontal ink run in its upper band; Devanagari words almost always do.

2. `resegment_devanagari`: DBNet trained on Latin-word shrink maps both
   merges Devanagari words (the stride-2 prob map bridges small gaps) and
   splits them mid-conjunct. Round 2 measured the damage at 25.8% e2e CER
   against a 2.3% recognizer CER — the boxes, not the recognizer, were
   broken. The fix is geometric, not learned: cluster det boxes into rows,
   merge same-row chains into line segments, then split each segment at the
   column-ink gaps that survive under the shirorekha (between words the
   headline breaks, so true word gaps stay empty; within a word the
   headline fills every column).

Both run on host numpy over a handful of crops — control-flow-heavy tiny
work, exactly what SURVEY §7 keeps off the device.
"""

from __future__ import annotations

import numpy as np

from ocr_system_tpu.ops.boxes import DetectedBox

# shirorekha detection: a row in the top band with a CONTIGUOUS ink run much
# wider than the glyph height. Contiguity is what separates it from Latin
# cap-tops ("TOTAL" has high row coverage but the run breaks at every
# letter gap). Measured margins (synthetic font vs DejaVu, sizes 14-30):
# Devanagari words score 1.5-2.4 x ink height (short 2-glyph words can
# drop below), Latin tops out at ~1.5 ("mm" bold). 1.55 splits them.
HEADLINE_MIN_RUN_X_HEIGHT = 1.55
HEADLINE_TOP_BAND = 0.55  # search the top 55% of box rows
HEADLINE_MIN_BELOW_SUPPORT = 0.06  # run columns with ink attached below
PAGE_DEVA_FRACTION = 0.45  # boxes with headlines needed to call a page Hindi
# absolute quorum: sparse Latin pages can have only 1-2 wide components
# (letters are separate blobs; the rare wide ones are touching bold serif
# caps whose top serifs bridge into a headline-scale run) — one such false
# positive used to flip a whole page to Devanagari. Measured over 40 mixed
# synthetic forms: Latin pages max 1 hit, Devanagari pages min 8.
PAGE_DEVA_MIN_HITS = 3

# re-segmentation produces LINE-level crops, not words: the recognizer
# scores CER 0.08 on whole truth lines vs 0.38 on word splits (measured,
# round 3) — word crops lose context and pay aspect distortion, so only
# column-scale gaps split a merged chain.
LINE_SPLIT_GAP_RATIO = 1.1   # empty run >= this x ink height splits
WORD_GAP_RATIO = 0.18        # used only for aspect-forced splits
MAX_CROP_ASPECT = 12.0       # keep crops within the widest rec bucket
MERGE_GAP_RATIO = 0.35  # same-row boxes closer than this merge into a line


def _to_gray(page: np.ndarray) -> np.ndarray:
    if page.ndim == 2:
        return page
    try:
        import cv2

        # same Rec.601 luma as the fallback, ~20x faster on page-scale
        # arrays (this runs once per page per wave in the routing vote)
        return cv2.cvtColor(page, cv2.COLOR_RGB2GRAY)
    except ImportError:
        return (
            0.299 * page[..., 0] + 0.587 * page[..., 1] + 0.114 * page[..., 2]
        ).astype(np.uint8)


def _crop_aabb(gray: np.ndarray, quad: np.ndarray) -> np.ndarray:
    h, w = gray.shape
    x0 = int(np.clip(quad[:, 0].min(), 0, w - 1))
    x1 = int(np.clip(quad[:, 0].max() + 1, x0 + 1, w))
    y0 = int(np.clip(quad[:, 1].min(), 0, h - 1))
    y1 = int(np.clip(quad[:, 1].max() + 1, y0 + 1, h))
    return gray[y0:y1, x0:x1]


def _ink(crop: np.ndarray) -> np.ndarray:
    """Local binarization: ink = darker than the crop's bimodal midpoint.
    `lo` is the true min, NOT a low percentile — a wide sparse crop (a
    line with a large column gap) can hold <5% ink pixels, and a
    percentile floor would read it as blank."""
    if crop.size == 0:
        return np.zeros_like(crop)
    lo = float(crop.min())
    hi = float(np.percentile(crop, 90))
    if hi - lo < 25:  # blank-ish crop
        return np.zeros_like(crop, dtype=bool)
    return crop < (lo + hi) / 2.0


def _longest_run(row: np.ndarray, bridge: int = 1) -> int:
    """Longest consecutive True run, tolerating gaps <= `bridge` px (raster
    aliasing can nick a 1-px hole in a thin stroke). Bridged gap pixels
    count toward the run length; leading/trailing gaps never bridge."""
    xs = np.nonzero(row)[0]
    if len(xs) == 0:
        return 0
    # consecutive ink pixels are `diff` apart with diff-1 gap pixels
    # between them; a chain breaks where the gap exceeds `bridge`
    brk = np.nonzero(np.diff(xs) > bridge + 1)[0]
    starts = xs[np.concatenate(([0], brk + 1))]
    ends = xs[np.concatenate((brk, [len(xs) - 1]))]
    # the scalar counter this replaces also folded the residual of the
    # zero-run immediately before each chain into it (its gap counter
    # reset every bridge+1 zeros, so zeros_before % (bridge+1) carried
    # over) — replicated exactly, the routing thresholds above were
    # calibrated against that behavior
    prev_end = np.concatenate(([-1], ends[:-1]))
    lead = (starts - prev_end - 1) % (bridge + 1)
    return int((ends - starts + 1 + lead).max())


def has_headline(crop: np.ndarray) -> bool:
    """True when the crop shows a shirorekha: a contiguous horizontal ink
    run in the upper band much wider than the glyph height, WITH glyph ink
    attached directly below it. `crop` is a gray uint8 sub-image of one
    text box.

    The attachment requirement kills the one measured false-positive
    family: det boxes over ruled TABLE cells — the cell's top rule is a
    full-width run in the top band, but cell padding leaves the rows right
    under it blank (measured below-run support: table rules <= 0.03 vs
    Devanagari words >= 0.10). Without it a Latin form with a ruled table
    routed to the Devanagari recognizer and decoded as garbage (one eval
    page at 0.92 CER)."""
    ink = _ink(crop)
    h, w = ink.shape
    if h < 6 or w < 12:
        return False
    rows_ink = np.nonzero(ink.any(axis=1))[0]
    cols = ink.any(axis=0)
    if len(rows_ink) == 0 or cols.sum() < 8:
        return False
    ink_h = int(rows_ink[-1]) - int(rows_ink[0]) + 1
    xs = np.nonzero(cols)[0]
    x0, x1 = int(xs[0]), int(xs[-1]) + 1
    if x1 - x0 < 10 or ink_h < 6:
        return False
    band_end = int(rows_ink[0]) + max(int(ink_h * HEADLINE_TOP_BAND), 2)
    need = HEADLINE_MIN_RUN_X_HEIGHT * ink_h
    for r in range(int(rows_ink[0]), min(band_end, h)):
        row = ink[r, x0:x1]
        if _longest_run(row) < need:
            continue
        below = ink[r + 1: min(r + 4, h), x0:x1]
        if below.size == 0:
            continue
        support = float((below.any(axis=0) & row).sum()) / max(
            int(row.sum()), 1
        )
        if support >= HEADLINE_MIN_BELOW_SUPPORT:
            return True
    return False


def crop_script(crop: np.ndarray) -> str:
    """Classify ONE box crop from a Devanagari-routed page: "devanagari"
    when any word-scale ink component carries a shirorekha, else "latin".

    Hindi forms are script-mixed at the BOX level — keys are Devanagari but
    values are mostly ASCII (amounts, dates, phones, emails, REF codes,
    'signed'), and the devanagari charset/recognizer mangles ASCII-heavy
    crops ('51,191.67 USD' decoded as '०1,डउ1.वगण०'). Azure reads both
    scripts on one page with no configuration (reference
    backend/services/ocr_service.py:213-246), so serving parity routes each
    crop to the recognizer that can actually read it.

    Measured on 118 resegmented det crops from rendered Hindi forms:
    34/37 Devanagari crops expose a headline component, 0/61 ASCII crops
    do (the 3 misses are small broken-conjunct words; per-component
    top-bar fraction was tried as a second signal and rejected — ASCII
    digits '2'/'5'/'7' carry full-width top bars too)."""
    ink = _ink(crop)
    if not ink.any():
        return "latin"
    from ocr_system_tpu.ops.boxes import _label_components

    labels, n = _label_components(ink)
    if n == 0:
        return "latin"
    ys, xs = np.nonzero(labels > 0)
    ls = labels[ys, xs]
    h, w = ink.shape
    cx0 = np.full(n + 1, w, np.int64)
    cy0 = np.full(n + 1, h, np.int64)
    cx1 = np.zeros(n + 1, np.int64)
    cy1 = np.zeros(n + 1, np.int64)
    cnt = np.zeros(n + 1, np.int64)
    np.minimum.at(cx0, ls, xs)
    np.maximum.at(cx1, ls, xs)
    np.minimum.at(cy0, ls, ys)
    np.maximum.at(cy1, ls, ys)
    np.add.at(cnt, ls, 1)
    for ci in range(1, n + 1):
        if (cnt[ci] >= 12
                and cx1[ci] - cx0[ci] + 1 >= 12
                and cy1[ci] - cy0[ci] + 1 >= 6):
            sub = crop[
                max(int(cy0[ci]) - 1, 0): int(cy1[ci]) + 2,
                max(int(cx0[ci]) - 1, 0): int(cx1[ci]) + 2,
            ]
            if has_headline(sub):
                return "devanagari"
    return "latin"


def page_script(
    page: np.ndarray, quads: np.ndarray, sample: int = 24
) -> str:
    """Classify a page's dominant script. quads: (N, 4, 2) det boxes in
    page coords (used only as a region-of-interest hint).
    -> "latin" | "devanagari".

    Votes over ink CONNECTED COMPONENTS, not det boxes: det boxes arrive
    padded and often line- or multi-row-scale, which inflates the ink
    height until the 1.55x-height headline-run test can never pass (a
    sparse Hindi page sampled this way scored 3/10 hits and routed to the
    Latin recognizer). A component IS a word on a Devanagari page — the
    shirorekha connects the glyphs — so the headline test runs at the
    scale it was calibrated for, regardless of det box quality."""
    if len(quads) == 0:
        return "latin"
    gray = _to_gray(page)
    ph, pw = gray.shape
    roi = np.zeros((ph, pw), bool)
    for q in quads:
        x0 = int(np.clip(q[:, 0].min() - 2, 0, pw))
        x1 = int(np.clip(q[:, 0].max() + 3, x0 + 1, pw))
        y0 = int(np.clip(q[:, 1].min() - 2, 0, ph))
        y1 = int(np.clip(q[:, 1].max() + 3, y0 + 1, ph))
        roi[y0:y1, x0:x1] = True
    vals = gray[roi]
    if vals.size == 0:
        return "latin"
    lo, hi = float(vals.min()), float(np.percentile(vals, 90))
    if hi - lo < 25:
        return "latin"
    ink = (gray < (lo + hi) / 2.0) & roi

    from ocr_system_tpu.ops.boxes import _label_components

    labels, n = _label_components(ink)
    if n == 0:
        return "latin"
    try:
        # fused native pass: per-component count + inclusive bbox
        from ocr_system_tpu.native import cc_label

        cnt, _, bb = cc_label.stats(labels, ink.astype(np.float32), n)
        cx0, cy0, cx1, cy1 = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
    except Exception:
        ys, xs = np.nonzero(labels > 0)
        ls = labels[ys, xs]
        cx0 = np.full(n + 1, pw, np.int64)
        cy0 = np.full(n + 1, ph, np.int64)
        cx1 = np.zeros(n + 1, np.int64)
        cy1 = np.zeros(n + 1, np.int64)
        cnt = np.zeros(n + 1, np.int64)
        np.minimum.at(cx0, ls, xs)
        np.maximum.at(cx1, ls, xs)
        np.minimum.at(cy0, ls, ys)
        np.maximum.at(cy1, ls, ys)
        np.add.at(cnt, ls, 1)
    # vote only over components WIDE enough to express a shirorekha
    # (w >= 1.8h; the run test needs 1.55x the ink height): a short word
    # or glyph fragment structurally cannot pass the test, so counting it
    # as a "no" vote reads as Latin evidence it isn't. Latin print rarely
    # produces wide CONNECTED components at all (letters are separate
    # blobs), so an empty wide set already means Latin.
    w_all = np.asarray(cx1) - np.asarray(cx0) + 1
    h_all = np.asarray(cy1) - np.asarray(cy0) + 1
    wide = (
        (np.asarray(cnt) >= 12)
        & (h_all >= 6)
        & (w_all >= np.maximum(12, 1.8 * h_all))
    )
    wide[0] = False
    comps = np.nonzero(wide)[0]
    if not len(comps):
        return "latin"
    order = comps[np.argsort(-np.asarray(cnt)[comps])][: max(sample, 1)]
    hits = 0
    for ci in order:
        crop = gray[
            max(int(cy0[ci]) - 1, 0): int(cy1[ci]) + 2,
            max(int(cx0[ci]) - 1, 0): int(cx1[ci]) + 2,
        ]
        hits += has_headline(crop)
    need = max(PAGE_DEVA_MIN_HITS, PAGE_DEVA_FRACTION * len(order))
    return "devanagari" if hits >= need else "latin"


def tighten_y(
    page: np.ndarray,
    quads: np.ndarray,
    margin: float = 0.15,
    min_band_mass: float = 0.55,
) -> np.ndarray:
    """Shrink each AXIS-ALIGNED rec quad's y-extent to its dominant ink
    row band + margin x band height. Tighten-only: never expands, never
    moves x.

    Det boxes carry det_box_pad_ratio (0.65h) margins on every side, so
    rec crops render glyphs at ~43% of the 48px crop height instead of
    the ~90% the recognizer trains at. Normal words survive the
    mismatch; dot-LEADER rows do not — measured rec-only leader CER
    0.95% at tight geometry vs 33% at det-pad geometry (half-height
    dots become ~2px specks). Ink-derived tightening is safe where
    box-derived tightening wasn't (the round-3 'ink-tightening snap'
    rejection): the band is the glyph ink itself, so ascenders and
    connected descenders stay inside it.

    Safety guards: rotated quads pass through untouched; a box whose
    dominant band holds < min_band_mass of its total ink passes through
    (a genuinely two-row merged box must NOT collapse to one row)."""
    from ocr_system_tpu.ops.sampling import axis_aligned_mask

    if len(quads) == 0:
        return quads
    gray = _to_gray(page)
    ph = gray.shape[0]
    aa = axis_aligned_mask(quads)
    out = quads.copy()
    for i, q in enumerate(quads):
        if not aa[i]:
            continue
        crop = _crop_aabb(gray, q)
        ink = _ink(crop)
        if not ink.any():
            continue
        row_mass = ink.sum(axis=1).astype(np.float64)
        nz = np.nonzero(row_mass)[0]
        if len(nz) == 0:
            continue
        # contiguous nonzero bands; dominant by mass
        splits = np.nonzero(np.diff(nz) > 1)[0]
        starts = np.concatenate([[0], splits + 1])
        ends = np.concatenate([splits, [len(nz) - 1]])
        bands = [(int(nz[s]), int(nz[e]) + 1) for s, e in zip(starts, ends)]
        masses = [row_mass[b0:b1].sum() for b0, b1 in bands]
        k = int(np.argmax(masses))
        if masses[k] < min_band_mass * row_mass.sum():
            continue
        b0, b1 = bands[k]
        band_h = b1 - b0
        if band_h < 4:
            continue
        y_org = float(np.clip(q[:, 1].min(), 0, ph - 1))
        y_top = max(y_org + b0 - margin * band_h, float(q[:, 1].min()))
        y_bot = min(y_org + b1 + margin * band_h, float(q[:, 1].max()))
        if y_bot - y_top < 4:
            continue
        out[i][[0, 1], 1] = y_top
        out[i][[2, 3], 1] = y_bot
    return out


def split_column_merged(
    page: np.ndarray,
    boxes: list[DetectedBox],
    gap_ratio: float = 1.4,
) -> list[DetectedBox]:
    """Split det boxes that merged ACROSS form columns (Latin pages).

    Two-column forms put 'Margin Class Raka' and 'Pefade of Handler' a
    column pitch apart; DBNet's stride-2 prob map sometimes bridges them
    into one row-level box, the crop squeezes two fields into one line,
    and the extractor pairs everything downstream of it wrong (measured:
    the largest det-side contributor to the pipeline-extraction gap).

    A box splits ONLY at interior empty-column runs >= gap_ratio x ink
    height measured over the dominant ink row band (det boxes are padded
    ~0.65h, so neighbor rows bleed into the AABB and would fill the gap).
    Dot-leader rows ('Route Tala .... 5367 Oak') never split — the leader
    dots keep every column occupied, which is exactly right: the
    recognizer is TRAINED on whole leader rows (round-3 lesson: aspect-
    driven crop splitting measured worse). Boundaries sit at gap centers
    so each piece keeps its margin; y-extents stay untouched."""
    if not boxes:
        return boxes
    gray = _to_gray(page)
    ph, pw = gray.shape
    out: list[DetectedBox] = []
    for b in boxes:
        crop = _crop_aabb(gray, b.quad)
        ink = _ink(crop)
        if not ink.any():
            out.append(b)
            continue
        # dominant ink row band (same rationale as resegment_devanagari)
        row_mass = ink.sum(axis=1)
        bands = []
        start = None
        for ri, m in enumerate(row_mass):
            if m > 0 and start is None:
                start = ri
            elif m == 0 and start is not None:
                bands.append((start, ri))
                start = None
        if start is not None:
            bands.append((start, len(row_mass)))
        b0, b1 = max(bands, key=lambda t: row_mass[t[0]: t[1]].sum())
        band = ink[b0:b1]
        cols = band.any(axis=0)
        xs = np.nonzero(cols)[0]
        if len(xs) == 0:
            out.append(b)
            continue
        ink_h = b1 - b0
        min_gap = max(int(gap_ratio * ink_h), 10)
        cuts: list[int] = []
        prev_x = int(xs[0])
        for x in xs[1:]:
            if int(x) - prev_x - 1 >= min_gap:
                cuts.append((prev_x + 1 + int(x)) // 2)  # gap center
            prev_x = int(x)
        if not cuts:
            out.append(b)
            continue
        # crop-local -> page coords via the same clip _crop_aabb applied
        x_org = float(np.clip(b.quad[:, 0].min(), 0, pw - 1))
        y0q = float(b.quad[:, 1].min())
        y1q = float(b.quad[:, 1].max())
        edges = [float(b.quad[:, 0].min())] + [
            x_org + c for c in cuts
        ] + [float(b.quad[:, 0].max())]
        for e0, e1 in zip(edges[:-1], edges[1:]):
            if e1 - e0 < 6:
                continue
            quad = np.array(
                [[e0, y0q], [e1, y0q], [e1, y1q], [e0, y1q]], np.float32
            )
            out.append(DetectedBox(quad=quad, score=b.score))
    return out


def _rows_from_boxes(boxes: list[DetectedBox]) -> list[list[DetectedBox]]:
    """Cluster boxes into text rows by y-center proximity (0.5x avg height,
    mirroring engine/reading_order.py)."""
    items = sorted(boxes, key=lambda b: float(b.quad[:, 1].min()))
    if not items:
        return []
    heights = [float(b.quad[:, 1].max() - b.quad[:, 1].min()) for b in items]
    tol = 0.5 * max(sum(heights) / len(heights), 1.0)
    rows: list[list[DetectedBox]] = []
    for b in items:
        yc = float(b.quad[:, 1].mean())
        for row in rows:
            ry = sum(float(x.quad[:, 1].mean()) for x in row) / len(row)
            if abs(yc - ry) <= tol:
                row.append(b)
                break
        else:
            rows.append([b])
    return rows


def _fit_aspect(
    segments: list[tuple[int, int]],
    cols: np.ndarray,
    ink_h: int,
    word_gap: int,
    max_aspect: float,
) -> list[tuple[int, int]]:
    """Recursively split segments wider than max_aspect x ink_h at their
    widest internal empty-column run (>= word_gap). Segments with no such
    gap are left as-is (a single unbroken stroke can't be split)."""
    out: list[tuple[int, int]] = []
    for s0, s1 in segments:
        if (s1 - s0) <= max_aspect * ink_h:
            out.append((s0, s1))
            continue
        # find widest empty run strictly inside the segment
        best_gap = best_at = 0
        run = 0
        for x in range(s0, s1):
            if cols[x]:
                if run >= word_gap and run > best_gap:
                    best_gap, best_at = run, x - run
                run = 0
            else:
                run += 1
        if best_gap == 0:
            out.append((s0, s1))
            continue
        out.extend(
            _fit_aspect(
                [(s0, best_at), (best_at + best_gap, s1)],
                cols, ink_h, word_gap, max_aspect,
            )
        )
    return out


def resegment_devanagari(
    page: np.ndarray,
    boxes: list[DetectedBox],
    pad_ratio: float = 0.0,
    pad_ratio_y: float | None = None,
    latin_pad_ratio: float | None = None,
) -> list[DetectedBox]:
    """Merge-then-normalize det boxes on a Devanagari page — into LINE
    segments, not words.

    DBNet trained on Latin word shapes both merges Devanagari words and
    splits them mid-conjunct; the repair is to join same-row boxes into
    line segments and hand the recognizer whole lines (measured: the
    recognizer scores CER 0.08 on truth-line crops vs 0.38 on word
    splits — context beats segmentation).

    1. same-row boxes whose padded gap is < MERGE_GAP_RATIO x height merge
       into one chain (repairs mid-word splits),
    2. a chain splits only at column-scale gaps (>= LINE_SPLIT_GAP_RATIO x
       ink height — separated key/value columns), plus forced splits at
       the widest word gaps while a segment's aspect exceeds the widest
       recognizer bucket (MAX_CROP_ASPECT; distortion costs more than a
       split),
    3. each segment gets tight dominant-band y-extents (det's padded boxes
       bleed into neighbor rows) plus the detector's configured margins.

    Hindi pages are script-mixed at the ROW level too (ASCII amount/date/
    phone lines between Devanagari rows — synth.py renders them because
    real Hindi invoices have them). Resegmentation exists to repair det's
    Devanagari failure modes; applied to an ASCII row it STRIPS the det
    geometry the Latin recognizer is trained on (ink-tight crops at
    pad 0.12 vs the det pad 0.65 regime: '$80,299' decoded ']8o,2?').
    So when `latin_pad_ratio` is given:
      - a row with no headline component (crop_script == latin) keeps its
        original det boxes untouched,
      - inside a resegmented (headline) row, each SEGMENT is classified
        per crop_script and latin segments get `latin_pad_ratio` margins
        (det-regime geometry) instead of the ink-tight Devanagari pads.
    """
    if not boxes:
        return boxes
    gray = _to_gray(page)
    ph, pw = gray.shape
    # dense small-text pages: det can emit one box COVERING several text
    # rows (measured: a sparse Hindi page at 0.89 CER because three whole
    # rows vanished under the dominant-band restriction below). Split such
    # boxes into one sub-box per substantial ink row band FIRST, so row
    # clustering sees single-row boxes and every line survives.
    boxes = _split_multirow_boxes(gray, boxes)
    out: list[DetectedBox] = []
    for row in _rows_from_boxes(boxes):
        row.sort(key=lambda b: float(b.quad[:, 0].min()))
        if latin_pad_ratio is not None:
            rx0 = int(np.clip(min(float(b.quad[:, 0].min()) for b in row), 0, pw - 1))
            rx1 = int(np.clip(max(float(b.quad[:, 0].max()) for b in row) + 1, rx0 + 1, pw))
            ry0 = int(np.clip(min(float(b.quad[:, 1].min()) for b in row), 0, ph - 1))
            ry1 = int(np.clip(max(float(b.quad[:, 1].max()) for b in row) + 1, ry0 + 1, ph))
            if crop_script(gray[ry0:ry1, rx0:rx1]) == "latin":
                out.extend(row)
                continue
        # merge chains
        chains: list[list[DetectedBox]] = [[row[0]]]
        for b in row[1:]:
            prev = chains[-1][-1]
            h = float(prev.quad[:, 1].max() - prev.quad[:, 1].min())
            gap = float(b.quad[:, 0].min()) - float(prev.quad[:, 0].max())
            if gap < MERGE_GAP_RATIO * max(h, 1.0):
                chains[-1].append(b)
            else:
                chains.append([b])
        for chain in chains:
            x0 = int(np.clip(min(float(b.quad[:, 0].min()) for b in chain), 0, pw - 1))
            x1 = int(np.clip(max(float(b.quad[:, 0].max()) for b in chain) + 1, x0 + 1, pw))
            y0 = int(np.clip(min(float(b.quad[:, 1].min()) for b in chain), 0, ph - 1))
            y1 = int(np.clip(max(float(b.quad[:, 1].max()) for b in chain) + 1, y0 + 1, ph))
            score = float(np.mean([b.score for b in chain]))
            ink = _ink(gray[y0:y1, x0:x1])
            if not ink.any():
                out.extend(chain)  # blank: keep original boxes
                continue
            # det boxes arrive PADDED (detector pad_ratio ~0.65h), so the
            # chain's y-range bleeds into neighboring text rows. Restrict
            # to the dominant ink row band (the contiguous run with the
            # most ink) before profiling, or neighbor rows fill the word
            # gaps and the y-extents span two lines. (Multi-ROW det boxes
            # were already split per band by _split_multirow_boxes, so by
            # here the dominant band IS the chain's own line.)
            row_mass = ink.sum(axis=1)
            bands = []
            start = None
            for ri, m in enumerate(row_mass):
                if m > 0 and start is None:
                    start = ri
                elif m == 0 and start is not None:
                    bands.append((start, ri))
                    start = None
            if start is not None:
                bands.append((start, len(row_mass)))
            b0, b1 = max(bands, key=lambda b: row_mass[b[0]: b[1]].sum())
            ink = ink[b0:b1]
            y0 = y0 + b0
            cols = ink.any(axis=0)
            if not cols.any():
                out.extend(chain)
                continue
            rows_ink = np.nonzero(ink.any(axis=1))[0]
            ink_h = int(rows_ink[-1]) - int(rows_ink[0]) + 1
            # split ONLY at column-scale gaps; keep word gaps merged
            min_gap = max(int(LINE_SPLIT_GAP_RATIO * ink_h), 8)
            segments: list[tuple[int, int]] = []
            xs = np.nonzero(cols)[0]
            seg_start = int(xs[0])
            prev_x = int(xs[0])
            for x in xs[1:]:
                if int(x) - prev_x - 1 >= min_gap:
                    segments.append((seg_start, prev_x + 1))
                    seg_start = int(x)
                prev_x = int(x)
            segments.append((seg_start, prev_x + 1))
            # aspect guard: crops wider than the recognizer's widest bucket
            # pay horizontal squeeze; split over-wide segments at their
            # widest internal word gaps until they fit
            word_gap = max(int(WORD_GAP_RATIO * ink_h), 5)
            segments = _fit_aspect(
                segments, cols, ink_h, word_gap, MAX_CROP_ASPECT
            )
            for sx0, sx1 in segments:
                seg_ink = ink[:, sx0:sx1]
                seg_rows = np.nonzero(seg_ink.any(axis=1))[0]
                if len(seg_rows) == 0 or sx1 - sx0 < 3:
                    continue
                sy0 = y0 + int(seg_rows[0])
                sy1 = y0 + int(seg_rows[-1]) + 1
                h_box = float(sy1 - sy0)
                px_ratio, py_ratio = pad_ratio, (
                    pad_ratio if pad_ratio_y is None else pad_ratio_y
                )
                if latin_pad_ratio is not None and crop_script(
                    gray[sy0:sy1, x0 + sx0: x0 + sx1]
                ) == "latin":
                    # ASCII value segment inside a Devanagari row: restore
                    # det-regime margins for the Latin recognizer
                    px_ratio = py_ratio = latin_pad_ratio
                pad_x = max(px_ratio * h_box, 1.0)
                pad_y = max(py_ratio * h_box, 1.0)
                qx0 = float(np.clip(x0 + sx0 - pad_x, 0, pw - 1))
                qx1 = float(np.clip(x0 + sx1 + pad_x, qx0 + 1, pw - 1))
                qy0 = float(np.clip(sy0 - pad_y, 0, ph - 1))
                qy1 = float(np.clip(sy1 + pad_y, qy0 + 1, ph - 1))
                quad = np.array(
                    [[qx0, qy0], [qx1, qy0], [qx1, qy1], [qx0, qy1]],
                    np.float32,
                )
                out.append(DetectedBox(quad=quad, score=score))
    return out


def _split_multirow_boxes(
    gray: np.ndarray, boxes: list[DetectedBox]
) -> list[DetectedBox]:
    """Split det boxes covering SEVERAL text rows into one sub-box per row,
    by clustering the box's ink CONNECTED COMPONENTS into rows.

    An earlier version used the zero-separated row-mass bands of the box's
    projection profile — but DBNet emits rotated quads on out-of-
    distribution pages (sparse small Devanagari), and inside a diagonal
    box's AABB two stair-stepped rows overlap a few pixels in y: no
    zero-mass row exists between them, the bands fuse, and the fused crop
    decodes as garbage (measured: one page at 0.89 CER while its five
    siblings averaged 0.07). Components cannot fuse across disjoint ink —
    the shirorekha joins a word into one component, and each component
    belongs to exactly one text row.

    Detached diacritics (anusvara dots above the headline, vowel signs
    hanging below the base) are short/narrow components; they attach to the
    nearest row instead of becoming their own, and the recognizer pad
    recovers whatever a tight row box still clips."""
    from ocr_system_tpu.ops.boxes import _label_components

    ph, pw = gray.shape
    out: list[DetectedBox] = []
    for b in boxes:
        crop = _crop_aabb(gray, b.quad)
        ink = _ink(crop)
        if not ink.any():
            out.append(b)
            continue
        labels, n = _label_components(ink)
        # per-component bboxes via vectorized scatter
        ys, xs = np.nonzero(labels > 0)
        ls = labels[ys, xs]
        cx0 = np.full(n + 1, crop.shape[1], np.int64)
        cy0 = np.full(n + 1, crop.shape[0], np.int64)
        cx1 = np.zeros(n + 1, np.int64)
        cy1 = np.zeros(n + 1, np.int64)
        cnt = np.zeros(n + 1, np.int64)
        np.minimum.at(cx0, ls, xs)
        np.maximum.at(cx1, ls, xs)
        np.minimum.at(cy0, ls, ys)
        np.maximum.at(cy1, ls, ys)
        np.add.at(cnt, ls, 1)
        comp = [
            ci for ci in range(1, n + 1)
            if cnt[ci] >= 3 and cy1[ci] - cy0[ci] + 1 >= 2
        ]
        if not comp:
            out.append(b)
            continue
        heights = np.array([cy1[ci] - cy0[ci] + 1 for ci in comp])
        widths_c = np.array([cx1[ci] - cx0[ci] + 1 for ci in comp])
        masses = np.array([cnt[ci] for ci in comp], np.float64)
        # ink-mass-weighted median height: words carry most of the ink, so
        # this reads as "word height" even when detached marks outnumber
        # the words (a plain median would collapse toward mark height)
        order = np.argsort(heights)
        csum = np.cumsum(masses[order])
        med_h = float(
            heights[order][int(np.searchsorted(csum, csum[-1] / 2.0))]
        )
        # marks are short (anusvara, candrabindu) OR narrow-and-low (a
        # detached vowel sign under a single consonant)
        is_mark = (heights < 0.45 * med_h) | (
            (heights < 0.7 * med_h) & (widths_c <= 0.9 * med_h)
        )
        main = [ci for ci, m in zip(comp, is_mark) if not m]
        marks = [ci for ci, m in zip(comp, is_mark) if m]
        if not main:
            main, marks = comp, []
        # row clustering by y-center (running mean, 0.55 x median height)
        tol = 0.55 * max(med_h, 1.0)
        rows: list[list[int]] = []
        row_yc: list[float] = []
        for ci in sorted(main, key=lambda c: float(cy0[c])):
            yc = float(cy0[ci] + cy1[ci]) / 2.0
            for ri, ry in enumerate(row_yc):
                if abs(yc - ry) <= tol:
                    rows[ri].append(ci)
                    row_yc[ri] = ry + (yc - ry) / len(rows[ri])
                    break
            else:
                rows.append([ci])
                row_yc.append(yc)
        for ci in marks:
            yc = float(cy0[ci] + cy1[ci]) / 2.0
            ri = min(range(len(row_yc)), key=lambda r: abs(yc - row_yc[r]))
            if abs(yc - row_yc[ri]) <= 1.1 * med_h:
                rows[ri].append(ci)
        if len(rows) <= 1:
            out.append(b)
            continue
        x_org = int(np.clip(b.quad[:, 0].min(), 0, pw - 1))
        y_org = int(np.clip(b.quad[:, 1].min(), 0, ph - 1))
        for row in rows:
            rx0 = x_org + int(min(cx0[ci] for ci in row))
            rx1 = x_org + int(max(cx1[ci] for ci in row)) + 1
            ry0 = y_org + int(min(cy0[ci] for ci in row))
            ry1 = y_org + int(max(cy1[ci] for ci in row)) + 1
            if rx1 - rx0 < 3 or ry1 - ry0 < 3:
                continue
            quad = np.array(
                [[rx0, ry0], [rx1, ry0], [rx1, ry1], [rx0, ry1]],
                np.float32,
            )
            out.append(DetectedBox(quad=quad, score=b.score))
    return out
