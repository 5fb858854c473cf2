"""Pallas TPU kernel: fused page-enhancement chain.

Fuses the detector's per-page enhancement (contrast blend -> unsharp mask ->
model normalization; reference behaviors image_preprocessing.py:132-185) into
ONE VMEM-resident pass per image plane.

Why a kernel when XLA already fuses elementwise chains: the natural NHWC
layout puts C=3 in the lane dimension, wasting 125 of 128 lanes on every
VPU op. This kernel runs PLANAR — grid over (batch x channel) planes, each
(H, W) plane loaded once into VMEM, all five stages (contrast, 5-tap
separable blur, unsharp blend, clip, normalize) applied in registers, one
store. The per-image gray mean (a cross-plane scalar) is precomputed by XLA
and scalar-prefetched via SMEM.

Falls back transparently to the jnp implementation off-TPU
(fused_enhance_reference) — used in tests via interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ocr_system_tpu.ops.image_ops import NORM_MEAN, NORM_STD

# 5-tap gaussian (sigma=1, radius=2), matches ops/image_ops.gaussian_kernel1d
_G5 = None


def _g5():
    global _G5
    if _G5 is None:
        import numpy as np

        x = np.arange(-2, 3, dtype=np.float32)
        k = np.exp(-0.5 * x**2)
        _G5 = tuple((k / k.sum()).tolist())
    return _G5


def _blur5_rows(x):
    """Vertical 5-tap blur with edge replication. x: (H, W)."""
    w0, w1, w2, w3, w4 = _g5()
    up2 = jnp.concatenate([x[:1], x[:1], x[:-2]], axis=0)
    up1 = jnp.concatenate([x[:1], x[:-1]], axis=0)
    dn1 = jnp.concatenate([x[1:], x[-1:]], axis=0)
    dn2 = jnp.concatenate([x[2:], x[-1:], x[-1:]], axis=0)
    return w0 * up2 + w1 * up1 + w2 * x + w3 * dn1 + w4 * dn2


def _blur5_cols(x):
    w0, w1, w2, w3, w4 = _g5()
    l2 = jnp.concatenate([x[:, :1], x[:, :1], x[:, :-2]], axis=1)
    l1 = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    r1 = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    r2 = jnp.concatenate([x[:, 2:], x[:, -1:], x[:, -1:]], axis=1)
    return w0 * l2 + w1 * l1 + w2 * x + w3 * r1 + w4 * r2


def _enhance_plane(x, gray_mean, nm, ns, contrast, sharpness):
    """The fused math on one (H, W) plane."""
    c = jnp.clip(gray_mean + (x - gray_mean) * contrast, 0.0, 1.0)
    blur = _blur5_cols(_blur5_rows(c))
    s = jnp.clip(blur + (c - blur) * sharpness, 0.0, 1.0)
    return (s - nm) / ns


_TILE = 160  # row-tile height; divides the det buckets (640/960/1280)
# blur only needs a 2-row halo, but Mosaic requires sublane offsets to be
# provably multiples of 8 — an 8-row halo keeps `local` in {0, 8, 16}
_HALO = 8


def _kernel(
    mean_ref, nm_ref, ns_ref, x_hbm, out_ref, scratch, result, sem,
    *, contrast, sharpness, h, tile,
):
    """One (tile, W) output block of one plane.

    The input stays in HBM; each step DMAs its tile PLUS a 2-row halo into
    VMEM scratch (BlockSpec blocks can't overlap, halos need manual copies —
    the double-buffer pattern from the Pallas guide, simplified to one
    buffer since the blur chain hides far less latency than the DMA saves).
    Edge replication falls out of index clamping at the true image borders.
    """
    p = pl.program_id(0)
    i = pl.program_id(1)
    span = min(tile + 2 * _HALO, h)
    start = pl.multiple_of(jnp.clip(i * tile - _HALO, 0, h - span), 8)
    local = i * tile - start  # tile's first row inside the scratch window

    dma = pltpu.make_async_copy(
        x_hbm.at[p, 0, pl.ds(start, span), :], scratch, sem
    )
    dma.start()
    dma.wait()

    x = scratch[:]
    c = jnp.clip(
        mean_ref[p, 0] + (x - mean_ref[p, 0]) * contrast, 0.0, 1.0
    )
    blur = _blur5_cols(_blur5_rows(c))
    s = jnp.clip(blur + (c - blur) * sharpness, 0.0, 1.0)
    # dynamic_slice of a value doesn't lower on TPU; stage through a ref
    result[:] = (s - nm_ref[p, 0]) / ns_ref[p, 0]
    local = pl.multiple_of(local, 8)
    out_ref[0, 0] = result[pl.ds(local, tile), :]


@functools.partial(
    jax.jit, static_argnames=("contrast", "sharpness", "interpret")
)
def fused_enhance(
    images: jnp.ndarray,
    contrast: float = 1.2,
    sharpness: float = 1.1,
    interpret: bool = False,
) -> jnp.ndarray:
    """images: (B, H, W, 3) float32 [0,1] -> normalized (B, H, W, 3).

    Equivalent to enhance_contrast + enhance_sharpness + normalize_for_model
    from ops/image_ops.py, as one planar Pallas pass.
    """
    b, h, w_in, c = images.shape
    # luma means per image (XLA; trivially fused reduction) — computed on
    # the REAL pixels, before any alignment padding
    luma = (
        0.299 * images[..., 0] + 0.587 * images[..., 1] + 0.114 * images[..., 2]
    )
    gray_means = jnp.mean(luma, axis=(1, 2))  # (B,)
    # lane alignment: HBM slices must be 128-aligned along the minor dim
    w = ((w_in + 127) // 128) * 128
    if w != w_in:
        images = jnp.pad(
            images, ((0, 0), (0, 0), (0, w - w_in), (0, 0)), mode="edge"
        )
    tile = _TILE if h % _TILE == 0 and h > _TILE + 2 * _HALO else h
    planar = jnp.transpose(images, (0, 3, 1, 2))  # (B, C, H, W)

    means_pc = jnp.repeat(gray_means, c).reshape(b * c, 1)  # per plane
    nm = jnp.tile(jnp.asarray(NORM_MEAN, jnp.float32), b).reshape(b * c, 1)
    ns = jnp.tile(jnp.asarray(NORM_STD, jnp.float32), b).reshape(b * c, 1)
    planes = planar.reshape(b * c, 1, h, w)

    span = min(tile + 2 * _HALO, h)
    out = pl.pallas_call(
        functools.partial(
            _kernel, contrast=contrast, sharpness=sharpness, h=h, tile=tile
        ),
        grid=(b * c, h // tile),
        in_specs=[
            # full scalar tables in SMEM, indexed by program id in-kernel
            pl.BlockSpec((b * c, 1), lambda p, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b * c, 1), lambda p, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b * c, 1), lambda p, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM, DMA'd
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile, w), lambda p, i: (p, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * c, 1, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((span, w), jnp.float32),
            pltpu.VMEM((span, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(means_pc, nm, ns, planes)

    out = jnp.transpose(out.reshape(b, c, h, w), (0, 2, 3, 1))
    return out[:, :, :w_in, :]


def fused_enhance_reference(images: jnp.ndarray) -> jnp.ndarray:
    """jnp reference implementation (for tests + non-TPU fallback)."""
    from ocr_system_tpu.ops import image_ops

    def one(img):
        img = image_ops.enhance_contrast(img, 1.2)
        img = image_ops.enhance_sharpness(img, 1.1)
        return image_ops.normalize_for_model(img)

    return jax.vmap(one)(images)
