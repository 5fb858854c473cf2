"""Detection stage: batched DBNet inference with shape bucketing.

The XLA-idiom answer to "variable page sizes" (SURVEY.md §7.3): pages are
letterboxed into a small set of static square buckets
(Settings.det_image_buckets) on host (cv2 SIMD — cheap, and it keeps the
device graph free of per-page shapes); each (bucket, batch) pair compiles
exactly once.

Dispatch discipline (the perf rule this module is built around): ONE fused
device call per batch — uint8 GRAYSCALE canvases up; skew angles + a
stride-2 probability map down. Everything between (normalize, skew estimate,
enhancement, DBNet) stays in HBM. Deskew *rotation* is host-side cv2 and
triggers a second pass only for pages that actually need it (reference
gating: skip <0.5 deg, reject >45 deg, image_preprocessing.py:433-439) —
in-graph rotation would make every page pay the gather cost under vmap.

Wire format: the TPU sits behind a ~15 MB/s tunnel (CLAUDE.md), so
host->device bytes ARE the throughput ceiling. Canvases go up as single-
channel uint8 (3x less than RGB; text has no chroma the models use) and are
broadcast to the models' 3-channel input in-graph. The placed device batch
is kept on each DetResult (canvas_stack/canvas_row/canvas_scale) so the
recognition stage can crop from it directly instead of re-uploading the
same pixels — see JaxOCREngine.rec_stage.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ocr_system_tpu.core.config import Settings, get_settings
from ocr_system_tpu.core.dtypes import DTypePolicy
from ocr_system_tpu.models.dbnet import DBNet
from ocr_system_tpu.ops import image_ops
from ocr_system_tpu.ops.boxes import (
    DetectedBox,
    boxes_from_prob_map,
    boxes_from_stats,
)

PROB_STRIDE = 2  # prob map downsample before host transfer
MIN_DESKEW_DEG = 0.5
MAX_DESKEW_DEG = 45.0


@dataclass
class DetResult:
    boxes: list[DetectedBox]  # quads in FINAL page pixel coords
    skew_angle: float
    page: np.ndarray | None = None  # deskewed page (crops/overlay source)
    prob_map: np.ndarray | None = None  # stride-PROB_STRIDE map (model coords)
    # device-canvas handoff to the rec stage (skips the second page upload):
    canvas_stack: object | None = None  # jax (B, S, S) uint8 gray, on device
    canvas_row: int = -1  # this page's row in canvas_stack
    canvas_scale: float = 1.0  # page coords * scale -> canvas coords
    # recognizer routing precomputed by the engine's det stage (one
    # Recognizer, a per-box list, or None = not routed yet) so the
    # scheduler's det worker thread pays script voting/resegmentation,
    # overlapping rec of the previous wave
    routing: object | None = None
    # luma view of `page`, computed ONCE in detect_batch: the host post
    # passes (ink walk, script vote, glue split, selection-mark/handwriting
    # CC) each re-derived it (~3-4 ms x 3-4 per page on the 1-core host)
    gray: np.ndarray | None = None
    # page ink mask + connected components (selection_marks.page_components)
    # computed in the DET WORKER thread: it is cv2/GIL-free CPU work
    # (~11 ms/page) that previously ran serially inside the rec stage's
    # _finish_page — in the det worker it fills the core during rec's
    # device waits on the 1-core serving host
    cc: object | None = None


class Detector:
    """Owns DBNet params + the per-bucket compiled fused forward."""

    def __init__(self, settings: Settings | None = None, params=None, seed: int = 0):
        self.settings = settings or get_settings()
        policy = DTypePolicy.from_names(
            self.settings.compute_dtype, self.settings.param_dtype
        )
        self.model = DBNet(policy=policy)
        if params is None:
            from ocr_system_tpu.core.checkpoint import init_or_load

            params = init_or_load(
                self.model,
                jax.random.PRNGKey(seed),
                self.settings.det_checkpoint,
                jnp.zeros((1, 64, 64, 3), jnp.float32),
                train=False,
            )
        self.variables = params
        self._forward_cache: dict[tuple[int, int], object] = {}
        self._forward_lock = threading.Lock()

    def _forward(self, bucket: int, batch: int):
        # locked check-then-set: concurrent det workers must share ONE jit
        # wrapper per (bucket, batch) key or each triggers its own 20-60 s
        # remote compile of an identical executable
        key = (bucket, batch)
        with self._forward_lock:
            return self._forward_locked(key)

    def _forward_locked(self, key: tuple[int, int]):
        if key not in self._forward_cache:
            s = self.settings

            # planar Pallas enhancement on TPU backends; jnp elsewhere
            use_pallas = (
                s.use_pallas_kernels
                and s.enable_contrast_enhancement
                and not s.enable_adaptive_binarization
                and jax.default_backend() not in ("cpu", "gpu")
            )

            wire_bits = s.det_wire_bits

            # NOTE: variables travel as jit ARGUMENTS, not closure constants.
            # Closed-over weights get baked into the executable (a 4 MB DBNet
            # checkpoint made each det executable ~10 MB); over the remote
            # tunnel every bench/serving process repays that as executable
            # LOAD time. As args the executable is code-only and the weights
            # transfer once at engine build.
            @jax.jit
            def fwd(images, variables):
                # images: (B, S, S) uint8 GRAY canvases — or (B, S, S/2)
                # with two 16-level pixels per byte when det_wire_bits=4,
                # or (B, S, S/4) with four 4-level pixels per byte when
                # det_wire_bits=2 (quarter the tunnel bytes; pair with the
                # wire-sim training augmentation). The models' 3-channel
                # input is broadcast here, in HBM.
                b_, s_ = images.shape[0], images.shape[1]
                if wire_bits == 4:
                    hi = (images >> 4).astype(jnp.uint8)
                    lo = (images & 15).astype(jnp.uint8)
                    gray_u8 = (
                        jnp.stack([hi, lo], axis=-1).reshape(b_, s_, s_) * 17
                    )
                    f = gray_u8.astype(jnp.float32) / 255.0
                elif wire_bits == 2:
                    parts = [
                        ((images >> sh) & 3).astype(jnp.uint8)
                        for sh in (6, 4, 2, 0)
                    ]
                    gray_u8 = (
                        jnp.stack(parts, axis=-1).reshape(b_, s_, s_) * 85
                    )
                    f = gray_u8.astype(jnp.float32) / 255.0
                else:
                    gray_u8 = images
                    f = images.astype(jnp.float32) / 255.0

                if s.enable_deskew:
                    angles = jax.vmap(image_ops.estimate_skew_angle)(f)
                else:
                    angles = jnp.zeros((f.shape[0],), jnp.float32)

                if use_pallas:
                    from ocr_system_tpu.kernels.preprocess_pallas import (
                        fused_enhance,
                    )

                    normed = fused_enhance(
                        jnp.repeat(f[..., None], 3, axis=-1)
                    )
                else:

                    def pre(img):
                        if s.enable_contrast_enhancement:
                            img = image_ops.enhance_contrast(img, 1.2)
                            img = image_ops.enhance_sharpness(img, 1.1)
                        if s.enable_adaptive_binarization:
                            img = image_ops.adaptive_binarize(img)
                        return image_ops.normalize_for_model(img)

                    normed = jax.vmap(pre)(f)
                prob = self.model.apply(variables, normed, train=False)["prob"]
                # stride-2 avg pool: 4x smaller host transfer, no box loss
                # (prob is an upsampling of stride-4 features anyway)
                prob_ds = jax.lax.reduce_window(
                    prob,
                    0.0,
                    jax.lax.add,
                    (1, PROB_STRIDE, PROB_STRIDE),
                    (1, PROB_STRIDE, PROB_STRIDE),
                    "VALID",
                ) / (PROB_STRIDE * PROB_STRIDE)
                # uint8 on the wire: 4x fewer bytes AND the tunnel compresses
                # the mostly-flat map well (f32 fetch measured 370 ms/wave,
                # u8 ~180 ms); bin/box thresholds keep full fidelity at 1/255.
                # det_prob_wire_bits=4 packs two 16-level pixels per byte
                # (halves the fetch again; scores quantize to 1/16)
                if s.det_prob_wire_bits == 0:
                    # thinnest wire of all: per-component statistics are
                    # computed ON DEVICE (ops/device_boxes: label
                    # propagation + scatter reductions) and only a
                    # (B, K, 7) stats tensor crosses the tunnel (~16 KB vs
                    # ~460 KB for the 4-bit map — the map fetch is the
                    # largest wire item, PERF.md). The 4-bit packed map is
                    # ALSO returned but stays device-resident: jax fetches
                    # lazily, so the host pays for a page's map only on the
                    # rare rotated-component fallback.
                    from ocr_system_tpu.ops.device_boxes import (
                        component_stats_single,
                    )

                    k_top = min(s.det_stats_k, s.max_boxes_per_page)
                    stats, n_comps = jax.vmap(
                        lambda p: component_stats_single(
                            p, s.det_bin_thresh, k_top
                        )
                    )(prob_ds)
                    p4 = (prob_ds * 15.0 + 0.5).astype(jnp.uint8)
                    prob_u8 = (
                        p4[:, :, 0::2] << 4 | p4[:, :, 1::2]
                    ).astype(jnp.uint8)
                    return stats, n_comps, prob_u8, angles, gray_u8
                if s.det_prob_wire_bits == 1:
                    # thinnest wire: geometry as a BITPACKED binarized mask
                    # at full map resolution (the bin threshold is a static
                    # setting, so binarizing on device loses nothing the
                    # host path had) + a stride-4 avg-pooled 4-bit score
                    # map for the component mean-score gate — 3.2x fewer
                    # fetch bytes than the 4-bit map
                    bits = (prob_ds > s.det_bin_thresh).astype(jnp.uint8)
                    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
                    b_, hh, ww = bits.shape
                    prob_u8 = (
                        bits.reshape(b_, hh, ww // 8, 8)
                        << shifts[None, None, None, :]
                    ).sum(axis=-1).astype(jnp.uint8)
                    score_ds = jax.lax.reduce_window(
                        prob_ds, 0.0, jax.lax.add, (1, 4, 4), (1, 4, 4),
                        "VALID",
                    ) / 16.0
                    s4 = (score_ds * 15.0 + 0.5).astype(jnp.uint8)
                    score_u8 = (
                        s4[:, :, 0::2] << 4 | s4[:, :, 1::2]
                    ).astype(jnp.uint8)
                    return prob_u8, score_u8, angles, gray_u8
                if s.det_prob_wire_bits == 4:
                    p4 = (prob_ds * 15.0 + 0.5).astype(jnp.uint8)
                    prob_u8 = (
                        p4[:, :, 0::2] << 4 | p4[:, :, 1::2]
                    ).astype(jnp.uint8)
                else:
                    prob_u8 = (prob_ds * 255.0 + 0.5).astype(jnp.uint8)
                # gray_u8 stays ON DEVICE as the rec stage's crop source
                # (canvas reuse) — it never crosses the wire
                return prob_u8, angles, gray_u8

            self._forward_cache[key] = fwd
        return self._forward_cache[key]

    # wall-time breakdown of the last detect_batch call, keyed by stage —
    # populated only when OCR_DET_PROFILE=1 (perf diagnosis: det_wall runs
    # ~10x det_device over the tunnel; this says where)
    last_profile: dict[str, float] | None = None

    def detect_batch(self, pages: list[np.ndarray]) -> list[DetResult]:
        """pages: list of (H, W, 3) uint8 arrays (original sizes)."""
        import os
        import time as _time

        prof: dict[str, float] | None = (
            {} if os.environ.get("OCR_DET_PROFILE") == "1" else None
        )

        def _tick(key: str, t0: float) -> float:
            t1 = _time.perf_counter()
            if prof is not None:
                prof[key] = prof.get(key, 0.0) + (t1 - t0)
            return t1

        s = self.settings
        pages = list(pages)
        by_bucket: dict[int, list[int]] = {}
        canvases: dict[int, np.ndarray] = {}
        scales: dict[int, float] = {}
        t = _time.perf_counter()
        for i, page in enumerate(pages):
            bucket = _det_bucket(page.shape, s.det_image_buckets)
            canvases[i], scales[i] = _letterbox_host(page, bucket)
            by_bucket.setdefault(bucket, []).append(i)
        t = _tick("letterbox", t)

        results: dict[int, DetResult] = {}
        for bucket, idxs in by_bucket.items():
            t = _time.perf_counter()
            batch = np.stack([canvases[i] for i in idxs])
            batch, n_real = self._pad_for_dp(batch)
            fwd = self._forward(bucket, batch.shape[0])
            packed = self._pack_wire(batch)
            t = _tick("pack", t)
            placed = self._place(packed)
            if prof is not None and hasattr(placed, "block_until_ready"):
                placed.block_until_ready()  # profiling only: isolate upload
            t = _tick("upload", t)
            out = fwd(placed, self.variables)
            score = stats = n_comps = None
            if len(out) == 5:  # det_prob_wire_bits=0: device box stats
                stats, n_comps, prob, angles, canvas_dev = out
                stats, n_comps = stats[:n_real], n_comps[:n_real]
            elif len(out) == 4:  # det_prob_wire_bits=1: + pooled score map
                prob, score, angles, canvas_dev = out
                score = score[:n_real]
            else:
                prob, angles, canvas_dev = out
            prob, angles = prob[:n_real], angles[:n_real]
            angles = np.asarray(angles)
            t = _tick("fwd+fetch_angles", t)

            # host-side deskew + single re-pass for pages that need it
            skewed = [
                j for j, i in enumerate(idxs)
                if MIN_DESKEW_DEG <= abs(float(angles[j])) <= MAX_DESKEW_DEG
            ]
            applied = np.zeros(len(idxs), np.float32)
            if skewed:
                for j in skewed:
                    i = idxs[j]
                    pages[i] = _rotate_host(pages[i], float(angles[j]))
                    canvases[i], scales[i] = _letterbox_host(pages[i], bucket)
                    applied[j] = float(angles[j])
                batch = np.stack([canvases[i] for i in idxs])
                batch, n_real = self._pad_for_dp(batch)
                placed = self._place(self._pack_wire(batch))
                out = fwd(placed, self.variables)
                if len(out) == 5:
                    stats, n_comps, prob, _, canvas_dev = out
                    stats, n_comps = stats[:n_real], n_comps[:n_real]
                elif len(out) == 4:
                    prob, score, _, canvas_dev = out
                    score = score[:n_real]
                else:
                    prob, _, canvas_dev = out
                prob = prob[:n_real]
            t = _tick("deskew_repass", t)

            if stats is not None:
                # stats mode: fetch ONLY the tiny stats tensors; `prob`
                # stays a device array for the per-page lazy fallback
                stats_np = np.asarray(stats)
                n_comps_np = np.asarray(n_comps)
                t = _tick("fetch_stats", t)
                t_boxes = 0.0
                t_ink = 0.0
                for j, i in enumerate(idxs):
                    t = _time.perf_counter()
                    scale = scales[i]
                    h, w = pages[i].shape[:2]
                    boxes = boxes_from_stats(
                        stats_np[j],
                        int(n_comps_np[j]),
                        box_thresh=s.det_box_thresh,
                        unclip_ratio=s.det_unclip_ratio,
                        scale_xy=(PROB_STRIDE / scale, PROB_STRIDE / scale),
                        clip_wh=(w, h),
                        max_boxes=s.max_boxes_per_page,
                    )
                    if boxes is None:
                        # rotated component / K overflow: exact host path
                        # over this ONE page's (lazily fetched) 4-bit map
                        p = np.asarray(prob[j])
                        hi = (p >> 4).astype(np.float32)
                        lo = (p & 15).astype(np.float32)
                        page_prob = np.stack([hi, lo], axis=-1).reshape(
                            p.shape[0], -1
                        ) / 15.0
                        boxes = boxes_from_prob_map(
                            page_prob,
                            bin_thresh=s.det_bin_thresh,
                            box_thresh=s.det_box_thresh,
                            unclip_ratio=s.det_unclip_ratio,
                            scale_xy=(
                                PROB_STRIDE / scale, PROB_STRIDE / scale,
                            ),
                            clip_wh=(w, h),
                            max_boxes=s.max_boxes_per_page,
                        )
                    t_boxes += _time.perf_counter() - t
                    t = _time.perf_counter()
                    self._ink_and_emit(
                        results, boxes, pages, i, j, scale, None,
                        canvas_dev, float(applied[j]),
                    )
                    t_ink += _time.perf_counter() - t
                if prof is not None:
                    prof["boxes"] = prof.get("boxes", 0.0) + t_boxes
                    prof["ink+pad"] = prof.get("ink+pad", 0.0) + t_ink
                continue

            prob = np.asarray(prob)
            score_maps = None
            if s.det_prob_wire_bits == 1:
                # unpack: bits -> (B, H, W) binary geometry mask; score ->
                # stride-4 float map for the component mean-score gate
                bits = np.unpackbits(prob, axis=2)
                sc = np.asarray(score)
                hi = (sc >> 4).astype(np.float32)
                lo = (sc & 15).astype(np.float32)
                score_maps = np.stack([hi, lo], axis=-1).reshape(
                    sc.shape[0], sc.shape[1], -1
                ) / 15.0
                prob = bits  # binary geometry (full map resolution)
            elif s.det_prob_wire_bits == 4:
                hi = (prob >> 4).astype(np.float32)
                lo = (prob & 15).astype(np.float32)
                prob = np.stack([hi, lo], axis=-1).reshape(
                    prob.shape[0], prob.shape[1], -1
                ) / 15.0
            else:
                prob = prob.astype(np.float32) / 255.0
            t = _tick("fetch_prob", t)
            t_boxes = 0.0
            t_ink = 0.0
            for j, i in enumerate(idxs):
                t = _time.perf_counter()
                scale = scales[i]
                h, w = pages[i].shape[:2]
                if score_maps is not None:
                    boxes = boxes_from_prob_map(
                        binary=prob[j].astype(np.uint8),
                        score_map=score_maps[j],
                        score_stride=4,
                        bin_thresh=s.det_bin_thresh,
                        box_thresh=s.det_box_thresh,
                        unclip_ratio=s.det_unclip_ratio,
                        scale_xy=(PROB_STRIDE / scale, PROB_STRIDE / scale),
                        clip_wh=(w, h),
                        max_boxes=s.max_boxes_per_page,
                    )
                else:
                    boxes = boxes_from_prob_map(
                        prob[j],
                        bin_thresh=s.det_bin_thresh,
                        box_thresh=s.det_box_thresh,
                        unclip_ratio=s.det_unclip_ratio,
                        scale_xy=(PROB_STRIDE / scale, PROB_STRIDE / scale),
                        clip_wh=(w, h),
                        max_boxes=s.max_boxes_per_page,
                    )
                t_boxes += _time.perf_counter() - t
                t = _time.perf_counter()
                self._ink_and_emit(
                    results, boxes, pages, i, j, scale, prob[j],
                    canvas_dev, float(applied[j]),
                )
                t_ink += _time.perf_counter() - t
            if prof is not None:
                prof["boxes"] = prof.get("boxes", 0.0) + t_boxes
                prof["ink+pad"] = prof.get("ink+pad", 0.0) + t_ink
        if prof is not None:
            Detector.last_profile = prof
        return [results[i] for i in range(len(pages))]

    def _ink_and_emit(
        self, results, boxes, pages, i, j, scale, prob_map, canvas_dev,
        applied_angle,
    ) -> None:
        """Shared per-page tail of detect_batch: ink snap/expand, batch quad
        pad, DetResult emit. Used by both the prob-map and device-stats
        paths."""
        s = self.settings
        h, w = pages[i].shape[:2]
        from ocr_system_tpu.engine.recognizer import _to_gray

        # computed ONCE per page; every downstream host pass
        # (ink walk here, script vote, glue split, CC passes)
        # consumes this via DetResult.gray
        gray_page = _to_gray(pages[i])
        # ink-snap + proportional margin: DB's stride-2 prob map
        # quantizes tiny-text box edges; snap extents to the actual
        # ink, then pad a small margin for the recognizer
        if s.det_ink_snap or s.det_ink_expand:
            from ocr_system_tpu.ops.sampling import quads_are_axis_aligned

            aa = [b for b in boxes if quads_are_axis_aligned(b.quad[None])]
            done = False
            if not s.det_ink_snap and aa:
                # expand-only serving path: one GIL-free native
                # call per page (~19 ms of Python -> ~1 ms, and it
                # no longer blocks the det/rec thread overlap)
                try:
                    from ocr_system_tpu.native.ink_walk import (
                        ink_expand_batch,
                    )

                    stack = np.stack([b.quad for b in aa])
                    ink_expand_batch(gray_page, stack)
                    for b, nq in zip(aa, stack):
                        b.quad[...] = nq
                    done = True
                except Exception:  # noqa: BLE001 - numpy fallback
                    pass
            if not done:
                for b in aa:
                    _ink_snap(
                        gray_page, b.quad, expand_only=not s.det_ink_snap,
                    )
        if boxes:
            # one vectorized pad for the whole page (the per-box
            # _pad_quad loop cost ~40 µs x 157 boxes x 8 pages of
            # small-array numpy overhead per wave)
            stack = np.stack([b.quad for b in boxes])
            _pad_quads_batch(
                stack, s.det_box_pad_ratio, w, h,
                ratio_y=s.det_box_pad_ratio_y,
            )
            for b, q in zip(boxes, stack):
                b.quad[...] = q
        cc = None
        if s.enable_selection_marks or s.enable_handwriting_detection:
            try:
                from ocr_system_tpu.engine.selection_marks import (
                    page_components,
                )

                cc = page_components(gray_page)
            except Exception:  # noqa: BLE001 - finish recomputes lazily
                cc = None
        results[i] = DetResult(
            cc=cc,
            boxes=boxes,
            skew_angle=applied_angle,
            page=pages[i],
            prob_map=prob_map,
            canvas_stack=canvas_dev,
            canvas_row=j,
            canvas_scale=scale,
            gray=gray_page,
        )

    def _pack_wire(self, batch: np.ndarray) -> np.ndarray:
        """Optionally pack two 16-level pixels per byte (det_wire_bits=4)
        or four 4-level pixels per byte (det_wire_bits=2) along W;
        unpacked in-graph by _forward's fwd."""
        if self.settings.det_wire_bits == 4:
            g4 = batch >> 4
            return (g4[:, :, 0::2] << 4 | g4[:, :, 1::2]).astype(np.uint8)
        if self.settings.det_wire_bits == 2:
            # round to the nearest of 4 levels (floor costs ~0.5 level of
            # error on antialiased glyph edges — measurable at 12px fonts)
            g2 = (batch.astype(np.uint16) * 3 + 127) // 255
            return (
                g2[:, :, 0::4] << 6 | g2[:, :, 1::4] << 4
                | g2[:, :, 2::4] << 2 | g2[:, :, 3::4]
            ).astype(np.uint8)
        return batch


    # ---- dp sharding helpers ----

    def _mesh(self):
        if not hasattr(self, "_mesh_cache"):
            try:
                from ocr_system_tpu.core.mesh import get_mesh

                mesh = get_mesh()
                self._mesh_cache = mesh if mesh.shape.get("dp", 1) > 1 else None
            except Exception:
                self._mesh_cache = None
        return self._mesh_cache

    def _pad_for_dp(self, batch: np.ndarray) -> tuple[np.ndarray, int]:
        """Pad the page batch to a multiple of the dp axis so it shards
        evenly; padded pages are white canvases sliced off after."""
        mesh = self._mesh()
        n = batch.shape[0]
        if mesh is None:
            return batch, n
        dp = mesh.shape["dp"]
        pad = (-n) % dp
        if pad:
            batch = np.concatenate(
                [batch, np.full((pad, *batch.shape[1:]), 255, batch.dtype)]
            )
        return batch, n

    def _place(self, batch: np.ndarray):
        """Shard the page batch over dp (XLA splits the whole fused forward
        across the mesh — SURVEY §2.4 'data-parallel page sharding')."""
        mesh = self._mesh()
        if mesh is None:
            return jnp.asarray(batch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            batch, NamedSharding(mesh, P("dp", *([None] * (batch.ndim - 1))))
        )


def _ink_snap(
    gray: np.ndarray, quad: np.ndarray, max_walk_ratio: float = 1.2,
    expand_only: bool = False,
) -> None:
    """Snap an axis-aligned quad's extents to the ink it covers, in place.

    The DB probability map travels at stride 2, so tiny-text boxes lose
    1-2 px per edge to quantization — enough to clip ascenders/descenders
    and the first/last glyph, which costs recognition dearly (measured:
    classical ink-mask boxes at the same recall scored page CER 0.088 vs
    0.28 for raw DB boxes on small-font forms). Walk each edge outward
    while it still meets ink (bounded by max_walk_ratio x box height), then
    pull each edge inward to the tight ink bound.
    """
    h, w = gray.shape
    x0 = int(np.clip(quad[:, 0].min(), 0, w - 1))
    x1 = int(np.clip(quad[:, 0].max(), x0 + 1, w))
    y0 = int(np.clip(quad[:, 1].min(), 0, h - 1))
    y1 = int(np.clip(quad[:, 1].max(), y0 + 1, h))
    box_h = y1 - y0
    walk = max(int(box_h * max_walk_ratio), 2)
    # local background/ink threshold from the window
    wy0, wy1 = max(y0 - walk, 0), min(y1 + walk, h)
    wx0, wx1 = max(x0 - walk, 0), min(x1 + walk, w)
    win = gray[wy0:wy1, wx0:wx1]
    if win.size == 0:
        return
    # histogram 90th percentile on a 2x2-subsampled window: uint8 range
    # makes bincount+cumsum exact enough for a background estimate at ~10x
    # less cost than np.percentile (profiled: percentile was half of
    # _ink_snap, which itself was ~30 ms/page at 157 boxes)
    sub = win[::2, ::2] if win.shape[0] > 8 and win.shape[1] > 8 else win
    hist = np.bincount(sub.reshape(-1), minlength=256)
    csum = np.cumsum(hist)
    bg = float(np.searchsorted(csum, 0.9 * csum[-1]))
    ink_t = max(bg - 50.0, (float(win.min()) + bg) / 2.0)
    dark_cols = (win < ink_t).sum(axis=0)
    dark_rows_full = win < ink_t

    if expand_only:
        # horizontal walk reads only the box's own row band: the full
        # window includes rules/neighbor rows above and below, and a
        # horizontal table rule would otherwise make every column "dark"
        # and drag the edge to the window limit
        dark_cols = dark_rows_full[y0 - wy0 : y1 - wy0].sum(axis=0)

    def col_dark(x):  # page x -> ink pixels in that column of the window
        return dark_cols[x - wx0] > 0

    # horizontal: walk outward over connected ink (recovers clipped first/
    # last glyphs), stopping at the first blank column (inter-word gap)
    nx0 = x0
    while nx0 - 1 >= wx0 and col_dark(nx0 - 1):
        nx0 -= 1
    nx1 = x1
    while nx1 < wx1 - 1 and col_dark(min(nx1, wx1 - 1)):
        nx1 += 1
    # vertical: tight ink rows within the (expanded) x-span
    sub = dark_rows_full[:, nx0 - wx0 : max(nx1 - wx0, nx0 - wx0 + 1)]
    rows = np.nonzero(sub.any(axis=1))[0]
    if len(rows) == 0:
        return
    if expand_only:
        # union with the original extents: tightening measured worse (a
        # snapped edge that guesses wrong clips a glyph — unrecoverable),
        # but EXPANSION is safe and fixes the under-sized DB response on
        # large bold text (a 22px title detected as a 13px band decodes to
        # garbage; round-3 forms diagnosis). Walk the CONTIGUOUS ink band
        # out from the box's own rows, where "ink" means glyph-like rows:
        # a row that is ~all dark is a table rule, and a row whose only
        # dark pixels are a vertical rule (1-2 px) is blank — both stop the
        # walk, so bordered form cells never swallow their rules/neighbors.
        nx0, nx1 = min(nx0, x0), max(nx1, x1)
        span = max(sub.shape[1], 1)
        cnt = sub.sum(axis=1)
        row_ink = (cnt >= max(3, int(0.03 * span))) & (cnt <= 0.9 * span)
        ny0, ny1 = y0, y1
        lim0, lim1 = max(y0 - walk, wy0), min(y1 + walk, wy1)
        while ny0 - 1 >= lim0 and row_ink[ny0 - 1 - wy0]:
            ny0 -= 1
        while ny1 < lim1 and row_ink[min(ny1 - wy0, len(row_ink) - 1)]:
            ny1 += 1
    else:
        ny0, ny1 = wy0 + int(rows[0]), wy0 + int(rows[-1]) + 1
    # reject pathological growth (swallowed a ruled line / neighbor block);
    # expand_only's walks are already bounded per edge by `walk`
    if not expand_only and (
        (ny1 - ny0) > 3.0 * box_h or (nx1 - nx0) > (x1 - x0) + 4 * box_h
    ):
        return
    quad[:, 0] = [nx0, nx1, nx1, nx0]
    quad[:, 1] = [ny0, ny0, ny1, ny1]


def _pad_quad(
    quad: np.ndarray,
    ratio: float,
    page_w: float,
    page_h: float,
    ratio_y: float | None = None,
) -> None:
    """In-place proportional expansion of a (4,2) quad, clipped to the page.
    ratio applies horizontally; ratio_y (default: same) vertically — the
    stride-2 prob map clips first/last glyphs horizontally more than it
    clips ascenders, so the axes tune separately."""
    h_box = float(quad[:, 1].max() - quad[:, 1].min())
    pad_x = max(ratio * h_box, 1.0)
    pad_y = max((ratio if ratio_y is None else ratio_y) * h_box, 1.0)
    center = quad.mean(axis=0, keepdims=True)
    direction = np.sign(quad - center)
    quad[:, 0] += direction[:, 0] * pad_x
    quad[:, 1] += direction[:, 1] * pad_y
    quad[:, 0] = np.clip(quad[:, 0], 0, page_w - 1)
    quad[:, 1] = np.clip(quad[:, 1], 0, page_h - 1)


def _pad_quads_batch(
    quads: np.ndarray,
    ratio: float,
    page_w: float,
    page_h: float,
    ratio_y: float | None = None,
) -> None:
    """Vectorized _pad_quad over a (N, 4, 2) stack, in place."""
    if len(quads) == 0:
        return
    h_box = quads[:, :, 1].max(axis=1) - quads[:, :, 1].min(axis=1)
    pad_x = np.maximum(ratio * h_box, 1.0)[:, None]
    pad_y = np.maximum(
        (ratio if ratio_y is None else ratio_y) * h_box, 1.0
    )[:, None]
    center = quads.mean(axis=1, keepdims=True)
    direction = np.sign(quads - center)
    quads[:, :, 0] += direction[:, :, 0] * pad_x
    quads[:, :, 1] += direction[:, :, 1] * pad_y
    np.clip(quads[:, :, 0], 0, page_w - 1, out=quads[:, :, 0])
    np.clip(quads[:, :, 1], 0, page_h - 1, out=quads[:, :, 1])


def _det_bucket(shape, buckets: tuple[int, ...]) -> int:
    longest = max(shape[0], shape[1])
    for b in sorted(buckets):
        if longest <= b:
            return b
    return max(buckets)


def _letterbox_host(page: np.ndarray, bucket: int) -> tuple[np.ndarray, float]:
    """Host-side aspect-preserving resize+pad to a GRAY (bucket, bucket)
    uint8 canvas — single channel on the wire (see module docstring)."""
    h, w = page.shape[:2]
    scale = min(bucket / h, bucket / w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    try:
        import cv2

        resized = cv2.resize(page, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if resized.ndim == 3:
            resized = cv2.cvtColor(resized, cv2.COLOR_RGB2GRAY)
    except ImportError:  # PIL fallback
        from PIL import Image

        resized = np.asarray(
            Image.fromarray(page).convert("L").resize((nw, nh), Image.BILINEAR)
        )
    canvas = np.full((bucket, bucket), 255, np.uint8)
    canvas[:nh, :nw] = resized
    return canvas, scale


def _rotate_host(page: np.ndarray, angle_deg: float) -> np.ndarray:
    """Deskew rotation about the center, white border fill (reference
    cv2.getRotationMatrix2D + warpAffine, image_preprocessing.py:444-452)."""
    h, w = page.shape[:2]
    try:
        import cv2

        m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle_deg, 1.0)
        return cv2.warpAffine(
            page, m, (w, h), flags=cv2.INTER_CUBIC,
            borderMode=cv2.BORDER_CONSTANT, borderValue=(255, 255, 255),
        )
    except ImportError:
        from PIL import Image

        return np.asarray(
            Image.fromarray(page).rotate(
                angle_deg, resample=Image.BICUBIC, fillcolor=(255, 255, 255)
            )
        )
