"""The page preprocessing pipeline as fused jnp ops.

Reference behavior covered (backend/utils/image_preprocessing.py):
  - aspect-preserving resize to <= max dimension        (:81-110)
  - deskew: estimate angle, skip <0.5 deg, reject >45   (:372-460)
  - contrast 1.2x / sharpness 1.1x enhancement          (:132-185)
  - adaptive (Gaussian, block 11, C=2) binarization     (:462-494)
  - full preprocess chain                               (:559-628)

The reference runs these one-at-a-time through PIL/OpenCV on host CPU. Here
each step is a jnp transform on (H, W) float32 grayscale (or (H, W, 3) RGB)
tensors with STATIC shapes, so the whole chain jits into a handful of fused
XLA ops and runs on-device; deskew's Hough transform is replaced by a
projection-profile angle search (SURVEY.md §7.3) which is a single batched
rotate+reduce — far better suited to the VPU than line voting.

EXIF orientation and codec work (JPEG/PNG/PDF) stay host-side in
engine/preprocess.py — that's a codec boundary, not a compute op.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ocr_system_tpu.ops.sampling import rotate

# ImageNet-ish normalization used by the det/rec models (PP-OCR convention).
NORM_MEAN = (0.485, 0.456, 0.406)
NORM_STD = (0.229, 0.224, 0.225)


def to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) RGB [0,1] -> (H, W) luma."""
    if img.ndim == 2:
        return img
    w = jnp.array([0.299, 0.587, 0.114], dtype=img.dtype)
    return img @ w


def resize_bilinear(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Static-shape bilinear resize via jax.image (lowered to XLA gather/
    convolution, MXU/VPU friendly)."""
    if img.ndim == 2:
        return jax.image.resize(img, out_hw, method="bilinear")
    return jax.image.resize(img, (*out_hw, img.shape[-1]), method="bilinear")


def letterbox(
    img: jnp.ndarray, target_hw: tuple[int, int], fill: float = 0.0
) -> tuple[jnp.ndarray, float]:
    """Aspect-preserving resize into a fixed (target_h, target_w) canvas,
    top-left anchored, padded with `fill`. Returns (canvas, scale).

    This is how the reference's "resize to <=2000 px" cap
    (image_preprocessing.py:81-110) becomes TPU-shaped: every page lands in
    one of a few static buckets, so XLA compiles each bucket once.
    NOTE: shapes here are Python ints (host-side decision), so this function
    is called outside jit per bucket; the body is jittable per bucket.
    """
    th, tw = target_hw
    h, w = img.shape[0], img.shape[1]
    scale = min(th / h, tw / w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    resized = resize_bilinear(img, (nh, nw))
    pad_h, pad_w = th - nh, tw - nw
    pads = [(0, pad_h), (0, pad_w)] + ([(0, 0)] if img.ndim == 3 else [])
    return jnp.pad(resized, pads, constant_values=fill), scale


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur on (H, W) via two 1-D convolutions.
    Edge-replicated borders (matches cv2's BORDER_REPLICATE and the Pallas
    kernel in kernels/preprocess_pallas.py)."""
    if radius is None:
        radius = max(int(3.0 * sigma + 0.5), 1)
    k = gaussian_kernel1d(sigma, radius).astype(img.dtype)
    padded = jnp.pad(img, ((radius, radius), (radius, radius)), mode="edge")
    x = padded[None, None]  # NCHW
    kh = k[None, None, :, None]
    kw = k[None, None, None, :]
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return x[0, 0]


def enhance_contrast(img: jnp.ndarray, factor: float = 1.2) -> jnp.ndarray:
    """PIL ImageEnhance.Contrast semantics: blend with the mean-gray image
    (reference: image_preprocessing.py:132-158, factor 1.2)."""
    mean = jnp.mean(to_grayscale(img))
    return jnp.clip(mean + (img - mean) * factor, 0.0, 1.0)


def enhance_sharpness(img: jnp.ndarray, factor: float = 1.1) -> jnp.ndarray:
    """PIL ImageEnhance.Sharpness approximation: unsharp-mask blend
    (reference: image_preprocessing.py:160-185, factor 1.1). RGB blurs as a
    single separable depthwise conv (one kernel for all channels)."""
    if img.ndim == 2:
        blurred = gaussian_blur(img, 1.0, 2)
        return jnp.clip(blurred + (img - blurred) * factor, 0.0, 1.0)
    c = img.shape[-1]
    radius = 2
    k = gaussian_kernel1d(1.0, radius).astype(img.dtype)
    padded = jnp.pad(
        img, ((radius, radius), (radius, radius), (0, 0)), mode="edge"
    )
    x = padded[None]  # NHWC
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, c))  # HWIO depthwise
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
    )
    blurred = x[0]
    return jnp.clip(blurred + (img - blurred) * factor, 0.0, 1.0)


def median_denoise3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter (reference MedianFilter(3), image_preprocessing.py:187)
    as a sort of the 9 shifted copies — fully vectorized on the VPU."""
    g = img if img.ndim == 2 else to_grayscale(img)
    p = jnp.pad(g, 1, mode="edge")
    shifts = [p[dy : dy + g.shape[0], dx : dx + g.shape[1]] for dy in range(3) for dx in range(3)]
    stack = jnp.stack(shifts, axis=0)
    return jnp.sort(stack, axis=0)[4]


def adaptive_binarize(
    img: jnp.ndarray, block_size: int = 11, c: float = 2.0 / 255.0
) -> jnp.ndarray:
    """Gaussian adaptive threshold, matching cv2.adaptiveThreshold(
    ADAPTIVE_THRESH_GAUSSIAN_C, blockSize=11, C=2) used at
    image_preprocessing.py:478-486: pixel > local_gaussian_mean - C -> 1."""
    g = img if img.ndim == 2 else to_grayscale(img)
    radius = block_size // 2
    sigma = 0.3 * ((block_size - 1) * 0.5 - 1) + 0.8  # cv2's sigma-for-ksize rule
    local_mean = gaussian_blur(g, sigma, radius)
    return (g > local_mean - c).astype(g.dtype)


# ---- deskew ----


@functools.partial(jax.jit, static_argnames=("num_angles", "max_angle", "downsample_to"))
def estimate_skew_angle(
    img: jnp.ndarray,
    num_angles: int = 31,
    max_angle: float = 15.0,
    downsample_to: int = 256,
) -> jnp.ndarray:
    """Estimate the text skew angle (degrees) via an FFT shear-projection
    search — zero gathers, pure VPU/MXU work.

    Math: for small angles, rotating by theta moves column x's content to
    rows y - x*tan(theta) (the horizontal shear component doesn't change row
    membership). So the rotated image's row-profile equals the profile after
    a per-column vertical circular shift s_x = x*tan(theta). By the DFT shift
    theorem a shift is a per-frequency phase, and by Parseval the profile's
    variance is computable in frequency space without inverting:

        F[k, x]   = FFT over rows of the ink map
        G_a[k]    = sum_x F[k, x] * exp(-2*pi*i * k * x * tan(theta_a) / N)
        score(a)  = sum_{k != 0} |G_a[k]|^2   (proportional to profile variance)

    This replaces both the reference's Canny->HoughLinesP->median estimator
    (image_preprocessing.py:398-432) and this module's earlier 31-way
    rotate-and-score search, whose bilinear gathers dominated the whole
    detection pipeline on TPU.
    """
    g = img if img.ndim == 2 else to_grayscale(img)
    small = resize_bilinear(g, (downsample_to, downsample_to))
    ink = (small < jnp.mean(small)).astype(jnp.float32)  # dark pixels = text
    n = downsample_to

    f = jnp.fft.fft(ink, axis=0)  # (k, x)
    angles = jnp.linspace(-max_angle, max_angle, num_angles)
    tans = jnp.tan(jnp.deg2rad(angles))  # (A,)
    k = jnp.fft.fftfreq(n) * n  # (N,) signed frequencies
    x = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0  # centered columns
    # phase[a, k, x] = exp(-2i pi k * x * tan_a / n)
    phi = (-2.0 * jnp.pi / n) * (
        tans[:, None, None] * k[None, :, None] * x[None, None, :]
    )
    phase = jax.lax.complex(jnp.cos(phi), jnp.sin(phi))
    g_ak = jnp.sum(f[None, :, :] * phase, axis=-1)  # (A, N)
    power = jnp.abs(g_ak) ** 2
    # score only the LINE-frequency band (|k| >= 8): aligned text rows put
    # their profile energy at the line pitch and its harmonics, while a
    # sparse stair-stepped layout sheared into one dense band concentrates
    # energy at |k| <= 3 — with the full spectrum that false alignment
    # outscored the true 0-degree layout (measured: a clean Hindi page
    # rotated -12 degrees into 0.89-CER garbage)
    kmask = (jnp.abs(k) >= 8.0).astype(power.dtype)
    score = jnp.sum(power * kmask[None, :], axis=-1)
    # evidence gate, scaled with the angle: mis-applying a LARGE rotation to
    # a clean page is catastrophic, while skipping a small true correction
    # is benign — so the farther the candidate angle, the more decisively it
    # must beat the 0-degree score (measured ratios: stair page 1.10 at 12
    # degrees vs genuinely skewed pages 1.9 at 6 / 3.8 at 12).
    best = jnp.argmax(score)
    score0 = score[num_angles // 2]  # linspace center == 0 degrees
    required = 1.0 + 0.05 * jnp.abs(angles[best])
    confident = score[best] > required * score0
    # negate: return the CORRECTING rotation (pass directly to rotate()),
    # matching the reference deskew convention (image_preprocessing.py:444)
    return jnp.where(confident, -angles[best], 0.0)


def deskew(
    img: jnp.ndarray,
    min_angle: float = 0.5,
    max_angle: float = 45.0,
    fill_value: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deskew with the reference's gating semantics
    (image_preprocessing.py:433-439): |angle| < 0.5 deg -> no-op; |angle| >
    45 deg -> reject (likely mis-detection); otherwise rotate by -angle.
    Returns (image, applied_angle). jit-safe: the no-op branches still rotate
    by 0.0 so shapes/control flow stay static.
    """
    angle = estimate_skew_angle(img)
    apply = (jnp.abs(angle) >= min_angle) & (jnp.abs(angle) <= max_angle)
    applied = jnp.where(apply, angle, 0.0)
    # lax.cond so straight pages (the common case) skip the full-resolution
    # rotation gather entirely — it's the costliest op in preprocessing.
    out = jax.lax.cond(
        apply,
        lambda im: rotate(im, applied, fill_value=fill_value),
        lambda im: im,
        img,
    )
    return out, applied


def normalize_for_model(
    img: jnp.ndarray,
    mean: Sequence[float] = NORM_MEAN,
    std: Sequence[float] = NORM_STD,
) -> jnp.ndarray:
    """(H, W[,3]) [0,1] -> model input (H, W, 3) normalized."""
    if img.ndim == 2:
        img = jnp.stack([img] * 3, axis=-1)
    m = jnp.asarray(mean, img.dtype)
    s = jnp.asarray(std, img.dtype)
    return (img - m) / s


def preprocess_page(
    img: jnp.ndarray,
    enable_deskew: bool = True,
    enable_contrast: bool = True,
    enable_binarize: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full on-device enhancement chain on a fixed-shape page tensor
    (reference preprocess_for_azure, image_preprocessing.py:559-628, minus
    host-side codec steps). Returns (enhanced [0,1] image, skew_angle).

    The flags are Python bools (from Settings) so each config traces its own
    graph — no data-dependent branching inside jit.
    """
    angle = jnp.float32(0.0)
    if enable_deskew:
        img, angle = deskew(img)
    if enable_contrast:
        img = enhance_contrast(img, 1.2)
        img = enhance_sharpness(img, 1.1)
    if enable_binarize:
        img = adaptive_binarize(img)
    return img, angle
