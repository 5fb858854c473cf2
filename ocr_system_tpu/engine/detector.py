"""Detection stage: batched DBNet inference with shape bucketing.

The XLA-idiom answer to "variable page sizes" (SURVEY.md §7.3): pages are
letterboxed into a small set of static square buckets
(Settings.det_image_buckets); each (bucket, batch) pair compiles exactly once
and is cached. The jitted function is donated its input and marked with dp
sharding so a page batch spreads across the mesh.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ocr_system_tpu.core.config import Settings, get_settings
from ocr_system_tpu.core.dtypes import DTypePolicy
from ocr_system_tpu.models.dbnet import DBNet
from ocr_system_tpu.ops import image_ops
from ocr_system_tpu.ops.boxes import DetectedBox, boxes_from_prob_map


@dataclass
class DetResult:
    boxes: list[DetectedBox]  # quads in ORIGINAL page pixel coords
    skew_angle: float
    prob_map: np.ndarray | None = None


class Detector:
    """Owns DBNet params + the per-bucket compiled forward."""

    def __init__(self, settings: Settings | None = None, params=None, seed: int = 0):
        self.settings = settings or get_settings()
        policy = DTypePolicy.from_names(
            self.settings.compute_dtype, self.settings.param_dtype
        )
        self.model = DBNet(policy=policy)
        if params is None:
            rng = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            params = self.model.init(rng, dummy, train=False)
        self.variables = params
        self._forward_cache: dict[tuple[int, int], object] = {}

    def _forward(self, bucket: int, batch: int):
        key = (bucket, batch)
        if key not in self._forward_cache:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fwd(images):
                # images: (B, S, S, 3) float32 [0,1]
                def one(img):
                    enhanced, angle = image_ops.preprocess_page(
                        img,
                        enable_deskew=self.settings.enable_deskew,
                        enable_contrast=self.settings.enable_contrast_enhancement,
                        enable_binarize=self.settings.enable_adaptive_binarization,
                    )
                    return image_ops.normalize_for_model(enhanced), angle

                normed, angles = jax.vmap(one)(images)
                out = self.model.apply(self.variables, normed, train=False)
                return out["prob"], angles

            self._forward_cache[key] = fwd
        return self._forward_cache[key]

    def detect_batch(self, pages: list[np.ndarray]) -> list[DetResult]:
        """pages: list of (H, W, 3) uint8 arrays (original sizes).
        Groups by bucket, runs batched inference, extracts boxes on host."""
        s = self.settings
        by_bucket: dict[int, list[int]] = {}
        prepped: dict[int, tuple[np.ndarray, float]] = {}
        for i, page in enumerate(pages):
            bucket = _det_bucket(page.shape, s.det_image_buckets)
            img = jnp.asarray(page, jnp.float32) / 255.0
            canvas, scale = image_ops.letterbox(img, (bucket, bucket), fill=1.0)
            prepped[i] = (np.asarray(canvas), scale)
            by_bucket.setdefault(bucket, []).append(i)

        results: dict[int, DetResult] = {}
        for bucket, idxs in by_bucket.items():
            batch = np.stack([prepped[i][0] for i in idxs])
            fwd = self._forward(bucket, len(idxs))
            prob, angles = fwd(jnp.asarray(batch))
            prob = np.asarray(prob, np.float32)
            angles = np.asarray(angles)
            for j, i in enumerate(idxs):
                scale = prepped[i][1]
                h, w = pages[i].shape[:2]
                boxes = boxes_from_prob_map(
                    prob[j],
                    scale_xy=(1.0 / scale, 1.0 / scale),
                    clip_wh=(w, h),
                    max_boxes=s.max_boxes_per_page,
                )
                results[i] = DetResult(
                    boxes=boxes, skew_angle=float(angles[j]), prob_map=prob[j]
                )
        return [results[i] for i in range(len(pages))]


def _det_bucket(shape, buckets: tuple[int, ...]) -> int:
    longest = max(shape[0], shape[1])
    for b in sorted(buckets):
        if longest <= b:
            return b
    return max(buckets)
