"""Recognition stage: on-device crop+rectify, width-bucketed batched SVTR,
in-graph CTC greedy decode.

Dynamic-shape strategy (SURVEY.md §7.3): each detected quad is rectified into
a fixed (48, W_bucket) crop directly ON DEVICE via ops/sampling.crop_quads —
the page tensor never leaves HBM for cropping, unlike the reference's
per-box host crops. Crops are grouped by width bucket and count-padded so
every (bucket, batch) pair compiles once.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ocr_system_tpu.core.config import Settings, get_settings
from ocr_system_tpu.core.dtypes import DTypePolicy
from ocr_system_tpu.models.charsets import Charset, get_charset
from ocr_system_tpu.models.recognizer import SVTRRecognizer
from ocr_system_tpu.ops import ctc
from ocr_system_tpu.ops.sampling import crop_quads


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
        self.charset = charset or get_charset("latin")
        policy = DTypePolicy.from_names(
            self.settings.compute_dtype, self.settings.param_dtype
        )
        self.model = SVTRRecognizer(vocab_size=self.charset.size, policy=policy)
        if params is None:
            rng = jax.random.PRNGKey(seed)
            h = self.settings.rec_image_height
            dummy = jnp.zeros((1, h, min(self.settings.rec_width_buckets), 3))
            params = self.model.init(rng, dummy, None, train=False)
        self.variables = params
        self._fn_cache: dict[tuple, object] = {}

    # ---- compiled stages ----

    def _crop_fn(self, page_hw: tuple[int, int], n: int, width: int):
        """Compiled: page (H, W, 3) + quads (n, 4, 2) + widths -> crops."""
        key = ("crop", page_hw, n, width)
        if key not in self._fn_cache:
            h = self.settings.rec_image_height

            @jax.jit
            def crop(page, quads):
                crops = crop_quads(page, quads, (h, width))
                return crops

            self._fn_cache[key] = crop
        return self._fn_cache[key]

    def _rec_fn(self, n: int, width: int):
        key = ("rec", n, width)
        if key not in self._fn_cache:

            @jax.jit
            def rec(crops, widths):
                logits, lengths = self.model.apply(
                    self.variables, crops, widths, train=False
                )
                ids, conf, cnt = ctc.ctc_greedy_decode(logits, lengths)
                return ids, conf, cnt

            self._fn_cache[key] = rec
        return self._fn_cache[key]

    # ---- public API ----

    def recognize_page(
        self, page: np.ndarray, quads: np.ndarray
    ) -> list[RecResult]:
        """page: (H, W, 3) uint8; quads: (N, 4, 2) float32 in page coords.
        Returns one RecResult per quad (order preserved)."""
        if len(quads) == 0:
            return []
        s = self.settings
        h_rec = s.rec_image_height
        page_f = jnp.asarray(page, jnp.float32) / 255.0

        # assign each quad a width bucket from its aspect ratio at h=48
        widths_px = np.linalg.norm(quads[:, 1] - quads[:, 0], axis=1)
        heights_px = np.linalg.norm(quads[:, 3] - quads[:, 0], axis=1)
        aspect = widths_px / np.maximum(heights_px, 1e-3)
        target_w = np.clip(aspect * h_rec, 16, max(s.rec_width_buckets))
        buckets = sorted(s.rec_width_buckets)
        bucket_of = np.array([_first_ge(buckets, w) for w in target_w])

        results: dict[int, RecResult] = {}
        for bucket in sorted(set(bucket_of.tolist())):
            idxs = np.nonzero(bucket_of == bucket)[0]
            n_pad = _pad_count(len(idxs), s.rec_batch_size)
            q = np.zeros((n_pad, 4, 2), np.float32)
            q[: len(idxs)] = quads[idxs]
            w_valid = np.full((n_pad,), 1, np.int32)
            w_valid[: len(idxs)] = np.clip(
                target_w[idxs].astype(np.int32), 16, bucket
            )
            crop = self._crop_fn(page.shape[:2], n_pad, bucket)
            crops = crop(page_f, jnp.asarray(q))
            rec = self._rec_fn(n_pad, bucket)
            ids, conf, _ = rec(crops, jnp.asarray(w_valid))
            texts = ctc.ids_to_text(ids[: len(idxs)], self.charset)
            confs = np.asarray(conf)[: len(idxs)]
            for k, i in enumerate(idxs):
                results[int(i)] = RecResult(text=texts[k], confidence=float(confs[k]))
        return [results[i] for i in range(len(quads))]


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
