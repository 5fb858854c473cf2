"""Recognition stage: on-device crop+rectify, width-bucketed batched SVTR,
in-graph CTC greedy decode.

Dynamic-shape strategy (SURVEY.md §7.3): each detected quad is rectified into
a fixed (48, W_bucket) crop directly ON DEVICE via ops/sampling.crop_quads —
the page tensor never leaves HBM for cropping, unlike the reference's
per-box host crops. Crops are grouped by width bucket and count-padded so
every (bucket, batch) pair compiles once.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ocr_system_tpu.core.config import Settings, get_settings
from ocr_system_tpu.core.dtypes import DTypePolicy
from ocr_system_tpu.models.charsets import Charset, get_charset
from ocr_system_tpu.models.recognizer import SVTRRecognizer
from ocr_system_tpu.ops import ctc
from ocr_system_tpu.ops.sampling import (
    axis_aligned_mask,
    crop_boxes_separable,
    crop_quads,
    quads_to_aabbs,
)


@dataclass
class RecResult:
    text: str
    confidence: float


class Recognizer:
    def __init__(
        self,
        settings: Settings | None = None,
        params=None,
        charset: Charset | None = None,
        seed: int = 0,
    ):
        self.settings = settings or get_settings()
        # "auto" is an ENGINE routing mode (pipeline builds one recognizer
        # per script); a bare Recognizer under auto is the latin primary
        name = self.settings.rec_charset
        self.charset = charset or get_charset(
            "latin" if name == "auto" else name
        )
        policy = DTypePolicy.from_names(
            self.settings.compute_dtype, self.settings.param_dtype
        )
        self.model = SVTRRecognizer(vocab_size=self.charset.size, policy=policy)
        if params is None:
            from ocr_system_tpu.core.checkpoint import init_or_load

            h = self.settings.rec_image_height
            params = init_or_load(
                self.model,
                jax.random.PRNGKey(seed),
                self.settings.rec_checkpoint,
                jnp.zeros((1, h, min(self.settings.rec_width_buckets), 3)),
                None,
                train=False,
            )
        self.variables = params
        self._fn_cache: dict[tuple, object] = {}
        # height bound for the Pallas AABB crop kernel's row slab; taller
        # boxes route to the general quad path (None = no bound, gather path)
        if (self.settings.use_pallas_kernels
                and jax.default_backend() not in ("cpu", "gpu")):
            from ocr_system_tpu.kernels.crop_pallas import MAX_BOX_H

            self._aabb_max_h: float | None = float(MAX_BOX_H)
        else:
            self._aabb_max_h = None
        # when set (a list), every compiled rec dispatch appends
        # (compiled_fn, device_args) so a profiler can re-run the wave's
        # exact dispatches warm and measure rec DEVICE time (the wall time
        # of rec_stage is dominated by host post + tunnel latency)
        self._profile_stash: list | None = None

    # ---- compiled stages ----
    #
    # Pages cross the wire (or arrive from the det stage) as single-channel
    # uint8 — 3x fewer tunnel bytes than RGB; crops are broadcast to the
    # model's 3-channel input in-graph AFTER cropping, so the broadcast never
    # costs HBM bandwidth on the full page.

    def _multi_crop_rec_fn(self, page_hw: tuple[int, int], n_pages: int,
                           crops_per_page: int, width: int):
        """Compiled (P, H, W) uint8 gray pages + (P, N, 4, 2) quads ->
        decoded ids/conf for all P*N crops in ONE dispatch. Quads are padded
        per page so the crop gather vmaps over static page-major structure (a
        dynamic page index per crop would force a mega-gather over the whole
        stack)."""
        key = ("mcroprec", page_hw, n_pages, crops_per_page, width)
        if key not in self._fn_cache:
            h = self.settings.rec_image_height

            # variables as jit args, not closure constants: baked-in weights
            # made each rec executable ~25 MB, repaid as remote executable
            # load on every process start (see detector._forward note)
            @jax.jit
            def run(pages, quads, widths, variables):
                pages = pages.astype(jnp.float32) / 255.0
                crops = jax.vmap(
                    lambda page, qs: crop_quads(page, qs, (h, width))
                )(pages, quads)  # (P, N, h, width)
                crops = crops.reshape(-1, h, width)[..., None]
                crops = _mask_pad(crops, widths.reshape(-1))
                crops = jnp.broadcast_to(crops, (*crops.shape[:-1], 3))
                logits, lengths = self.model.apply(
                    variables, crops, widths.reshape(-1), train=False
                )
                return ctc.ctc_greedy_decode(logits, lengths)

            self._fn_cache[key] = run
        return self._fn_cache[key]

    def _multi_aabb_rec_fn(self, page_hw: tuple[int, int], n_pages: int,
                           crops_per_page: int, width: int):
        """Axis-aligned fast path. On TPU the crop stage is the
        interpolation-MATMUL Pallas kernel (kernels/crop_pallas.py) — the
        separable gather was the rec wave's wall (57 ms device vs 44 ms
        for SVTR+decode on the 8x160-crop bench wave; the kernel does the
        same crops in ~1 ms). jnp separable gather elsewhere."""
        key = ("maabbrec", page_hw, n_pages, crops_per_page, width)
        if key not in self._fn_cache:
            h = self.settings.rec_image_height
            use_pallas = (
                self.settings.use_pallas_kernels
                and jax.default_backend() not in ("cpu", "gpu")
            )

            @jax.jit
            def run(pages, aabbs, widths, variables):
                if use_pallas:
                    from ocr_system_tpu.kernels.crop_pallas import (
                        crop_boxes_matmul,
                    )

                    # kernel folds /255 + _mask_pad into the crop matmuls
                    crops = crop_boxes_matmul(
                        pages, aabbs, widths, (h, width)
                    )[..., None]
                else:
                    pg = pages.astype(jnp.float32) / 255.0
                    crops = jax.vmap(
                        lambda page, bs: crop_boxes_separable(
                            page, bs, (h, width)
                        )
                    )(pg, aabbs)
                    crops = crops.reshape(-1, h, width)[..., None]
                    crops = _mask_pad(crops, widths.reshape(-1))
                crops = jnp.broadcast_to(crops, (*crops.shape[:-1], 3))
                logits, lengths = self.model.apply(
                    variables, crops, widths.reshape(-1), train=False
                )
                return ctc.ctc_greedy_decode(logits, lengths)

            self._fn_cache[key] = run
        return self._fn_cache[key]

    # ---- public API ----

    def recognize_page(
        self, page: np.ndarray, quads: np.ndarray
    ) -> list[RecResult]:
        """page: (H, W, 3) uint8; quads: (N, 4, 2) float32 in page coords.
        Returns one RecResult per quad (order preserved)."""
        return self.recognize_pages([page], [quads])[0]

    def recognize_pages(
        self, pages: list[np.ndarray], quads_list: list[np.ndarray]
    ) -> list[list[RecResult]]:
        """Batched multi-page recognition: pages sharing a shape are stacked
        (as gray uint8 — see class comment) and ALL their crops decode in
        width-bucketed fused dispatches — device round trips scale with
        #buckets, not #pages x #buckets."""
        results: list[list[RecResult | None]] = [
            [None] * len(q) for q in quads_list
        ]

        # group page indices by page shape
        by_shape: dict[tuple[int, int], list[int]] = {}
        for p_i, page in enumerate(pages):
            if len(quads_list[p_i]) > 0:
                by_shape.setdefault(page.shape[:2], []).append(p_i)

        for shape, page_idxs in by_shape.items():
            # pad the page dim to pow2-ish steps: a dynamic page count would
            # otherwise make every distinct (shape, n_pages) a fresh 20-60 s
            # remote compile (the same invariant _pad_count enforces for
            # crop counts)
            n_pages = _pad_count(
                len(page_idxs), max(self.settings.det_batch_size, 1)
            )
            stack = np.zeros((n_pages, *shape), np.uint8)
            for k, p_i in enumerate(page_idxs):
                stack[k] = _to_gray(pages[p_i])
            row_targets = page_idxs + [-1] * (n_pages - len(page_idxs))
            row_quads = [quads_list[p_i] for p_i in page_idxs] + [
                np.zeros((0, 4, 2), np.float32)
            ] * (n_pages - len(page_idxs))
            stack_dev = jnp.asarray(stack)
            self._rec_on_stack(
                stack_dev, shape, row_targets, row_quads, results
            )
        return [
            [r if r is not None else RecResult("", 0.0) for r in row]
            for row in results
        ]

    def recognize_on_device_stack(
        self, stack_dev, quads_list: list[np.ndarray]
    ) -> list[list[RecResult]]:
        """Crops decode straight from a device-resident gray uint8 page stack
        (P, S, S) — the det stage's letterboxed canvases — so the page pixels
        cross the tunnel exactly once per wave. quads_list: one (N, 4, 2)
        array per stack row, in STACK (canvas) coords."""
        results: list[list[RecResult | None]] = [
            [None] * len(q) for q in quads_list
        ]
        page_idxs = [i for i, q in enumerate(quads_list) if len(q) > 0]
        if page_idxs:
            n_rows = stack_dev.shape[0]
            try:
                multi_dev = len(stack_dev.sharding.device_set) > 1
            except AttributeError:
                multi_dev = False
            if multi_dev or len(page_idxs) > n_rows // 2:
                # Keep the full (static, per-wave) stack when most rows
                # carry boxes — compaction would make n_pages a dynamic
                # compile dimension (a fresh 20-60 s remote compile per
                # distinct count; ADVICE r2) — and ALWAYS when the stack is
                # dp-sharded (multi-chip serving / CPU test mesh):
                # jnp.take-compacting a dp-sharded array onto fewer rows
                # than the mesh produces conflicting committed placements
                # in the rec dispatch.
                row_targets = [
                    i if len(q) > 0 else -1 for i, q in enumerate(quads_list)
                ]
                row_quads = list(quads_list)
            else:
                # sparse wave (dp padding, blank pages): compact, but pad the
                # gathered page count to pow2 steps so compile keys stay few
                n_pad = _pad_count(len(page_idxs), n_rows)
                sel = page_idxs + [page_idxs[0]] * (n_pad - len(page_idxs))
                stack_dev = jnp.take(stack_dev, jnp.asarray(sel), axis=0)
                row_targets = page_idxs + [-1] * (n_pad - len(page_idxs))
                row_quads = [quads_list[i] for i in page_idxs] + [
                    np.zeros((0, 4, 2), np.float32)
                ] * (n_pad - len(page_idxs))
            self._rec_on_stack(
                stack_dev,
                tuple(stack_dev.shape[1:3]),
                row_targets,
                row_quads,
                results,
            )
        return [
            [r if r is not None else RecResult("", 0.0) for r in row]
            for row in results
        ]

    def _stack_placer(self, stack_dev):
        """Arg placement aligned with the stack's sharding: when the det
        canvas stack is dp-sharded over a mesh (multi-chip serving / CPU
        test mesh), the rec dispatch's small args must carry a matching
        NamedSharding (row dim on the same axis) and the weights a
        replicated one — a committed single-device array mixed with the
        dp-sharded stack is a placement error. Single-device stacks keep
        the plain jnp.asarray path."""
        sh = getattr(stack_dev, "sharding", None)
        try:
            multi = sh is not None and len(sh.device_set) > 1
            mesh = sh.mesh
            row_spec = sh.spec[0]
        except (AttributeError, IndexError, TypeError):
            multi = False
        if not multi:
            return jnp.asarray, self.variables
        from jax.sharding import NamedSharding, PartitionSpec as P

        def place(a):
            return jax.device_put(
                a, NamedSharding(mesh, P(row_spec, *([None] * (a.ndim - 1))))
            )

        key = (id(mesh), row_spec)
        if getattr(self, "_replicated_vars_key", None) != key:
            self._replicated_vars = jax.device_put(
                self.variables, NamedSharding(mesh, P())
            )
            self._replicated_vars_key = key
        return place, self._replicated_vars

    def _rec_on_stack(
        self,
        stack_dev,
        shape: tuple[int, int],
        row_targets: list[int],
        row_quads: list[np.ndarray],
        results: list[list[RecResult | None]],
    ) -> None:
        """Shared core: width-bucket each stack row's quads and run the fused
        crop+rec+decode dispatches. row_targets[k] is the results index row k
        writes to (-1 = padding row, ignored); row_quads[k] its quads in
        stack coords. len(row_targets) == len(row_quads) == stack rows."""
        s = self.settings
        h_rec = s.rec_image_height
        buckets = sorted(s.rec_width_buckets)
        n_pages = stack_dev.shape[0]
        place, variables = self._stack_placer(stack_dev)

        # bucket every (row, quad) by target width, split by per-quad
        # axis-alignment: a single rotated quad must not drag the whole
        # bucket group onto the general gather path (the separable AABB
        # crop is ~10x faster on TPU — measured mcroprec 1.37 s vs
        # maabbrec for the same 8-page word wave)
        per_bucket: dict[
            tuple[int, bool], list[list[tuple[int, np.ndarray, float]]]
        ] = {}
        for k, quads in enumerate(row_quads):
            if row_targets[k] < 0 or len(quads) == 0:
                continue
            widths_px = np.linalg.norm(quads[:, 1] - quads[:, 0], axis=1)
            heights_px = np.linalg.norm(quads[:, 3] - quads[:, 0], axis=1)
            aspect = widths_px / np.maximum(heights_px, 1e-3)
            target_w = np.clip(aspect * h_rec, 16, buckets[-1])
            aa = axis_aligned_mask(quads)
            if self._aabb_max_h is not None:
                # boxes taller than the Pallas crop kernel's row slab
                # (kernels/crop_pallas.MAX_BOX_H) take the general quad
                # path — full-page banners only
                aa &= heights_px <= self._aabb_max_h
            for q_i in range(len(quads)):
                b = _first_ge(buckets, target_w[q_i])
                group = per_bucket.setdefault(
                    (b, bool(aa[q_i])), [[] for _ in row_quads]
                )
                group[k].append((q_i, quads[q_i], target_w[q_i]))

        # two-phase dispatch: queue EVERY bucket group's device work first,
        # fetch afterwards. jax dispatch is async — but np.asarray(ids) right
        # after each run() blocked that group's round-trip before the next
        # group could even enter the queue, so 3-5 bucket groups paid 3-5
        # serial tunnel latencies (~60 ms each) per wave. Dispatch-all/
        # fetch-all overlaps compute + transfers across groups.
        pending: list[tuple[int, object, object]] = []
        group_list = list(per_bucket.items())
        for (bucket, axis_aligned), groups in group_list:
                # aspect-preserving crops: extend each quad rightward so the
                # (48, bucket) sample grid renders the text at its natural
                # scale in the first w_valid columns (training pads, never
                # stretches — inference must match; the padding region is
                # zero-masked in the jitted fn)
                # pad per-page crop counts to a shared static N (pow2 steps
                # bound the compile cache like _pad_count does for batches)
                # floor scales INVERSELY with bucket width: wide buckets
                # exist for the occasional over-wide row (1-2 real crops
                # per page), and a padding crop costs SVTR compute
                # proportional to the bucket — a flat floor of 16 made the
                # 640/1280 groups ~30% of wave device time for ~1% of the
                # real crops
                floor = getattr(s, "rec_pad_floor", 1)
                floor = max(1, floor * min(s.rec_width_buckets) // bucket)
                n_per_page = max(
                    _pad_count(max(len(g) for g in groups), s.rec_batch_size),
                    floor,
                )
                q = np.zeros((n_pages, n_per_page, 4, 2), np.float32)
                w_valid = np.full((n_pages, n_per_page), 1, np.int32)
                for k, group in enumerate(groups):
                    for j, (q_i, quad, tw) in enumerate(group):
                        wv = int(np.clip(tw, 16, bucket))
                        q[k, j] = _extend_quad(quad, bucket / wv)
                        w_valid[k, j] = wv
                flat_quads = q.reshape(-1, 4, 2)
                if axis_aligned:
                    aabbs = quads_to_aabbs(flat_quads).reshape(
                        n_pages, n_per_page, 4
                    )
                    run = self._multi_aabb_rec_fn(
                        shape, n_pages, n_per_page, bucket
                    )
                    args = (stack_dev, place(aabbs),
                            place(w_valid), variables)
                else:
                    run = self._multi_crop_rec_fn(
                        shape, n_pages, n_per_page, bucket
                    )
                    args = (stack_dev, place(q),
                            place(w_valid), variables)
                ids, conf, _ = run(*args)
                if self._profile_stash is not None:
                    self._profile_stash.append((run, args))
                pending.append((n_per_page, ids, conf))

        for ((bucket, axis_aligned), groups), (n_per_page, ids, conf) in zip(
            group_list, pending
        ):
                texts = ctc.ids_to_text(ids, self.charset)
                confs = np.asarray(conf)
                for k, group in enumerate(groups):
                    for j, (q_i, _, _) in enumerate(group):
                        flat_i = k * n_per_page + j
                        results[row_targets[k]][q_i] = RecResult(
                            text=texts[flat_i], confidence=float(confs[flat_i])
                        )


def _to_gray(page: np.ndarray) -> np.ndarray:
    """(H, W[, 3]) uint8 -> (H, W) uint8 luma (wire-thin page format)."""
    if page.ndim == 2:
        return page
    try:
        import cv2

        return cv2.cvtColor(page, cv2.COLOR_RGB2GRAY)
    except ImportError:
        return (
            0.299 * page[..., 0] + 0.587 * page[..., 1] + 0.114 * page[..., 2]
        ).astype(np.uint8)


def _extend_quad(quad: np.ndarray, factor: float) -> np.ndarray:
    """Extend a quad along its reading direction by `factor` (tl/bl fixed)."""
    out = quad.copy()
    out[1] = quad[0] + (quad[1] - quad[0]) * factor  # tr
    out[2] = quad[3] + (quad[2] - quad[3]) * factor  # br
    return out


def _mask_pad(crops, widths):
    """Zero out columns beyond each crop's valid width (training pads with
    black; see training/synth.render_line)."""
    w = crops.shape[2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    return jnp.where(cols < widths[:, None, None, None], crops, 0.0)


def _first_ge(buckets: list[int], w: float) -> int:
    for b in buckets:
        if w <= b:
            return b
    return buckets[-1]


def _pad_count(n: int, batch: int) -> int:
    """Pad to power-of-two-ish steps up to batch, then multiples of batch —
    bounds compile cache size to O(log batch) entries per bucket."""
    if n >= batch:
        return ((n + batch - 1) // batch) * batch
    p = 1
    while p < n:
        p *= 2
    return min(p, batch)
