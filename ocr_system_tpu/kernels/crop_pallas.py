"""Pallas TPU kernel: batched axis-aligned crop+resize as interpolation
MATMULS — the recognizer's crop stage without a single gather.

Why: the rec wave was crop-bound, not model-bound. Measured on an 8-page
960² stack with 160 word crops/page (bucket 320, the bench wave shape):
full fused dispatch 100 ms, of which the separable-gather crop stage alone
is 78 ms and SVTR+decode is 44 ms — `jnp.take` with per-crop dynamic row
indices lowers to TPU gathers, the slowest memory pattern on the chip
(ops/sampling.crop_boxes_separable, itself already ~10x faster than the
general quad gather).

The trick: bilinear resampling IS a pair of small dense matmuls. For an
axis-aligned box, crop = W_y @ band @ W_x where
  - band is a (BAND, S) row-slab of the page around the box (one DMA),
  - W_y (H, BAND) holds hat-function weights  max(0, 1 - |y_src(r) - s|)
    built from iota in VMEM (never touches HBM),
  - W_x (S, W) likewise for columns, with columns >= w_valid zeroed
    (folds the _mask_pad step into the crop).
Hat weights reproduce bilinear interpolation exactly: each source row's
weight is the linear-interp coefficient, two adjacent rows nonzero per
output row. Border clamp matches the gather path's index clamping by
clamping source COORDS into the image before building the hats.

Both matmuls run on the MXU: ~22 MFLOP per crop vs the gather's scattered
reads. Kernel time for the same wave: ~3 ms (26x the gather path).

Boxes taller than BAND - 2*_ALIGN rows can't fit the slab; callers route
those to the general path (engine/recognizer.py keeps them on the rotated
-quad group). At the 960 canvas that bound is ~112 px — covers every det
box short of full-page banners.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row slab height per crop; DMA'd at an 8-aligned start (Mosaic sublane
# constraint). Boxes up to MAX_BOX_H rows tall fit with alignment slack.
BAND = 128
_ALIGN = 8
MAX_BOX_H = BAND - 2 * _ALIGN  # 112


def _kernel(
    y0_ref, y1_ref, x0_ref, x1_ref, wv_ref,  # scalar-prefetch (SMEM)
    pages_hbm,  # (P, S_pad) pages, HBM
    out_ref,  # (1, H, W) VMEM block
    band_u8, sem,  # scratch
    *, n_per_page, h_out, w_out, s_rows, s_rows_true, s_cols, s_cols_true,
    band_h,
):
    i = pl.program_id(0)
    p = i // n_per_page
    y0 = y0_ref[i]
    y1 = y1_ref[i]
    x0 = x0_ref[i]
    x1 = x1_ref[i]
    wv = wv_ref[i]

    start = jnp.clip(
        (y0 - float(_ALIGN)).astype(jnp.int32), 0, max(s_rows - band_h, 0)
    )
    start = pl.multiple_of((start // _ALIGN) * _ALIGN, _ALIGN)
    dma = pltpu.make_async_copy(
        pages_hbm.at[p, pl.ds(start, band_h), :], band_u8, sem
    )
    dma.start()
    dma.wait()

    # W_y: (H, band_h) hat weights; clamp source coords into the slab's
    # valid page rows to reproduce the gather path's border replication
    # iota must be integer-typed on TPU; cast after
    r = jax.lax.broadcasted_iota(jnp.int32, (h_out, band_h), 0).astype(jnp.float32)
    s = jax.lax.broadcasted_iota(jnp.int32, (h_out, band_h), 1).astype(jnp.float32)
    ys = y0 + (y1 - y0) * r / float(h_out - 1)
    ys = jnp.clip(ys, 0.0, float(s_rows_true - 1)) - start.astype(jnp.float32)
    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(ys - s))

    # Mosaic has no direct uint8->f32 cast; hop through int32
    band = band_u8[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    # HIGHEST: full-f32 MXU passes — the default bf16 rounding costs ~1.5
    # pixel LSBs of error and the kernel is grid-overhead-bound anyway
    rows = jnp.dot(
        w_y, band, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # W_x: (S_pad, W) hat weights; columns beyond w_valid zeroed (the
    # recognizer trains on zero-padded crops — ops/recognizer._mask_pad)
    sc = jax.lax.broadcasted_iota(jnp.int32, (s_cols, w_out), 0).astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.int32, (s_cols, w_out), 1).astype(jnp.float32)
    xs = x0 + (x1 - x0) * j / float(w_out - 1)
    xs = jnp.clip(xs, 0.0, float(s_cols_true - 1))
    w_x = jnp.maximum(0.0, 1.0 - jnp.abs(xs - sc))
    w_x = jnp.where(j < wv.astype(jnp.float32), w_x, 0.0)

    out_ref[0] = jnp.dot(
        rows, w_x, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit, static_argnames=("out_shape", "interpret")
)
def crop_boxes_matmul(
    pages: jnp.ndarray,
    aabbs: jnp.ndarray,
    w_valid: jnp.ndarray,
    out_shape: tuple[int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    """pages (P, R, C) uint8 gray; aabbs (P, N, 4) [x0,y0,x1,y1] float32 in
    page coords; w_valid (P, N) int32 -> (P*N, h, w) float32 crops in [0,1],
    columns >= w_valid zeroed. Semantics match
    vmap(crop_boxes_separable) / 255 + _mask_pad for boxes no taller than
    MAX_BOX_H (pages shorter than the slab fit entirely — no height bound)."""
    p_pages, s_rows, s_in = pages.shape
    n = aabbs.shape[1]
    h_out, w_out = out_shape
    # lane alignment: HBM row slices must be 128-aligned along the minor dim
    s_pad = ((s_in + 127) // 128) * 128
    # pages shorter than the slab: the slab is the (8-aligned) whole page
    band_h = min(BAND, ((s_rows + _ALIGN - 1) // _ALIGN) * _ALIGN)
    r_pad = max(s_rows, band_h)
    if s_pad != s_in or r_pad != s_rows:
        pages = jnp.pad(
            pages, ((0, 0), (0, r_pad - s_rows), (0, s_pad - s_in))
        )

    flat = aabbs.reshape(-1, 4)
    x0 = flat[:, 0]
    y0 = flat[:, 1]
    x1 = flat[:, 2]
    y1 = flat[:, 3]
    wv = w_valid.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(p_pages * n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, h_out, w_out),
            lambda i, *refs: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((band_h, s_pad), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel,
            n_per_page=n, h_out=h_out, w_out=w_out,
            s_rows=r_pad, s_rows_true=s_rows, s_cols=s_pad,
            s_cols_true=s_in, band_h=band_h,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (p_pages * n, h_out, w_out), jnp.float32
        ),
        interpret=interpret,
    )(y0, y1, x0, x1, wv, pages)
